#!/bin/bash
# Round-5 battery, part B: the loss_layout='target' A/B (alone and combined
# with bf16 mask logits) at N=20 / N=40, queued behind scripts/measure_r5.sh
# and the ds2 parity train. One process per mfu_report (axon executable-mix
# panic, PERF.md r4).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p benchmarks/r5

for PID in /tmp/measure.pid /tmp/ds2.pid; do
  if [ -f "$PID" ]; then
    while kill -0 "$(cat $PID)" 2>/dev/null; do sleep 20; done
  fi
done

run() { echo "=== $(date +%H:%M:%S) $* ==="; timeout 2400 "$@" || echo "FAILED: $*"; }

run python tools/mfu_report.py --mode train --train-instances 20 \
    --set model.loss_layout=target --out benchmarks/r5/mfu_n20_tlayout.json
run python tools/mfu_report.py --mode train --train-instances 40 \
    --set model.loss_layout=target --out benchmarks/r5/mfu_n40_tlayout.json
run python tools/mfu_report.py --mode train --train-instances 20 \
    --set model.loss_layout=target model.mask_logits_dtype=bfloat16 \
    --out benchmarks/r5/mfu_n20_tlayout_bf16.json
run python tools/mfu_report.py --mode train --train-instances 40 \
    --set model.loss_layout=target model.mask_logits_dtype=bfloat16 \
    --out benchmarks/r5/mfu_n40_tlayout_bf16.json

echo "measure_r5b DONE"
