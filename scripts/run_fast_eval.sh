#!/bin/bash
# PGD-50 evaluation of a finished fast-AT run (reference run_eval{,_ee}.sh)
# usage: run_fast_eval.sh <2|4> <""|_ee> <imagenet_root> <ckpt_dir> [restarts]
# (the reference run_eval_ee.sh evaluates with --restarts 10)
PX="${1:?px}"; EE="${2}"; DATA="${3:?data}"; CKPT="${4:?ckpt}"
python train.py --config edge_enhancement_tpu/configs/fast_imagenet/fast_${PX}px_evaluate${EE}.yml \
    --data "$DATA" --resume "$CKPT" --restarts "${5:-1}"
