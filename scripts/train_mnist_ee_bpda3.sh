#!/bin/bash
# Flagship MNIST run (reference: experiments_mnist.py + ee_at_bpda3_square.yml)
python train.py \
    --config edge_enhancement_tpu/configs/mnist/ee_at_bpda3_square.yml \
    --data "${1:-synthetic}"
