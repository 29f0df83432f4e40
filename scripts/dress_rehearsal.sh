#!/usr/bin/env bash
# Full-scale dress rehearsal of the flagship recipe at production shape:
# configs/tiny_imagenet/ee_at_bpda3_square.yml VERBATIM (bs100, 200 classes,
# 50 epochs, piecewise-50/75 LR decays) on the 100k-image non-saturating
# synthetic TinyIN (--data synthetic-hard), with steps_per_dispatch
# chaining, a DELIBERATE mid-run kill + --resume (exercising best-ckpt /
# schedule / shuffle-stream restore at scale), then the full eval battery.
# Reference match: Tiny_ImageNet/experiments_tinyimagenet.py epoch loop at
# utils/data_loader.py:61-94 scale.
#
#   KILL_AFTER=900 scripts/dress_rehearsal.sh output/rehearsal
#
# Artifacts: reference-format log under $OUT/tiny_imagenet/<run>/log/ and
# the eval report printed by eval.py (captured to $OUT/eval_report.txt).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-output/rehearsal}
CFG=edge_enhancement_tpu/configs/tiny_imagenet/ee_at_bpda3_square.yml
RUN_DIR="$OUT/tiny_imagenet/EE_BPDA3_AT_square/resnet18_EE_square-bs100-lr0.1-seed1"
SPD=${SPD:-40}

echo "== phase 1: train until the deliberate kill (${KILL_AFTER:-900}s) =="
timeout "${KILL_AFTER:-900}" python -u train.py --config "$CFG" \
    --data synthetic-hard --steps-per-dispatch "$SPD" --output "$OUT" \
    || echo "== killed as planned (exit $?) =="

echo "== phase 2: resume to completion =="
python -u train.py --config "$CFG" --data synthetic-hard \
    --steps-per-dispatch "$SPD" --output "$OUT" --resume "$RUN_DIR/ckpt"

echo "== phase 3: eval battery (pgd,cw,fgsm,aa) =="
python -u eval.py --config "$CFG" --data synthetic-hard \
    --resume "$RUN_DIR/ckpt" --suite pgd,cw,fgsm,aa --aa-batches 4 \
    | tee "$OUT/eval_report.txt"
