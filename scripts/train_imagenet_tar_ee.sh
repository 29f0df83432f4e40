#!/bin/bash
# Targeted EE adversarial training on ImageNet. Multi-host: set
# JAX_COORDINATOR_ADDRESS and launch one process per host (replaces the
# reference's `python -m torch.distributed.launch --nproc_per_node=N ...`).
python train.py \
    --config edge_enhancement_tpu/configs/imagenet/targeted_ee_training.yml \
    --data "${1:?usage: $0 <imagenet_root>}"
