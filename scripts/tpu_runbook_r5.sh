#!/usr/bin/env bash
# Round-5 TPU work queue, in priority order, for when the axon tunnel is
# back (it has been down since ~02:00 on 2026-08-18; tpu_probe.sh watches).
# Each phase is independent and logs under output/r5_tpu/.
#
#   scripts/tpu_runbook_r5.sh [phase...]   # default: twin gemm bench
#
# NOTE: remote TPU compiles serialize (~3-5 min per distinct program) —
# phases run sequentially on purpose. The dress rehearsal (~2h device) is
# NOT in the default list; run `scripts/tpu_runbook_r5.sh rehearsal`
# explicitly when the budget allows.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=output/r5_tpu
mkdir -p "$OUT"

run_twin() {
  # ours-side hard-twin seeds on the chip (~4 min/seed once compiled);
  # reference seeds are recovered from output/twin_hard/ref_s*/log
  python -u tools/digital_twin_tiny.py --task hard --epochs 10 \
    --num-steps 10 --seeds 1 2 3 --ours-platform default \
    --out output/twin_hard 2>&1 | tee "$OUT/twin_ours_tpu.log"
}

run_gemm() {
  python -u tools/bench_gemm_conv.py 2>&1 | tee "$OUT/bench_gemm_conv.log"
}

run_bench() {
  python -u bench.py 2>&1 | tee "$OUT/bench.log"
}

run_rehearsal() {
  KILL_AFTER="${KILL_AFTER:-900}" scripts/dress_rehearsal.sh \
    output/rehearsal 2>&1 | tee "$OUT/rehearsal.log"
}

for phase in "${@:-twin gemm bench}"; do
  for p in $phase; do
    echo "===== phase: $p ($(date -u +%H:%M:%S)) ====="
    "run_$p" || echo "===== phase $p FAILED (rc=$?) ====="
  done
done
