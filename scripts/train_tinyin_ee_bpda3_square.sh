#!/bin/bash
# Flagship Tiny-ImageNet run (reference: experiments_tinyimagenet.py)
python train.py \
    --config edge_enhancement_tpu/configs/tiny_imagenet/ee_at_bpda3_square.yml \
    --data "${1:-synthetic}"
