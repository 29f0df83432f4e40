#!/bin/bash
# Fast (FGSM) AT, 3-phase progressive resize (reference run_fast_2px_ee.sh):
# each phase resumes from the previous phase's checkpoint, then the
# evaluate config runs the PGD-50 battery (configs_fast_2px_evaluate_ee.yml).
DATA="${1:?usage: $0 <imagenet_root>}"
OUT=output/fast_2px_ee
CFG=edge_enhancement_tpu/configs/fast_imagenet
python train.py --config $CFG/fast_2px_phase1_ee.yml --data "$DATA" --output $OUT/phase1
python train.py --config $CFG/fast_2px_phase2_ee.yml --data "$DATA" --output $OUT/phase2 \
    --resume "$(ls -d $OUT/phase1/imagenet/*/ckpt | head -1)"
python train.py --config $CFG/fast_2px_phase3_ee.yml --data "$DATA" --output $OUT/phase3 \
    --resume "$(ls -d $OUT/phase2/imagenet/*/ckpt | head -1)"
python train.py --config $CFG/fast_2px_evaluate_ee.yml --data "$DATA" --restarts 10 \
    --resume "$(ls -d $OUT/phase3/imagenet/*/ckpt | head -1)"
