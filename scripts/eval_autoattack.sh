#!/bin/bash
# AutoAttack-lite + PGD battery evaluation of a checkpoint
# usage: eval_autoattack.sh <config.yml> <ckpt_dir> [data_root]
python eval.py --config "${1:?config}" --resume "${2:?ckpt}" \
    --data "${3:-synthetic}" --suite pgd,fgsm,cw,aa
