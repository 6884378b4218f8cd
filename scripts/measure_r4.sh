#!/bin/bash
# Round-4 chip-measurement battery. Waits for a running cascade (pid file)
# to release the TPU, then regenerates the round-4 perf artifacts IN-REPO
# (benchmarks/r4/ — the work_dirs/r4 artifacts referenced by PERF.md were
# lost to a work_dirs cleanup; these are the committed replacements).
#
# Measures the r4 layer-batched assigner (now the default train path) and
# the opt-in model.match_downsample=2 pooled matching costs, at the N=20
# and N=40 operating points, plus the reference-scale relation/streaming
# stress. Each mfu_report invocation is its own process (axon panics on
# mixed executables in-process — PERF.md r4).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p benchmarks/r4

if [ -f /tmp/cascade.pid ]; then
  while kill -0 "$(cat /tmp/cascade.pid)" 2>/dev/null; do sleep 20; done
fi

run() { echo "=== $* ==="; timeout 1800 "$@" || echo "FAILED: $*"; }

run python tools/mfu_report.py --mode both --calibrate --train-instances 40 \
    --out benchmarks/r4/mfu_n40.json
run python tools/mfu_report.py --mode train --train-instances 40 \
    --set model.match_downsample=2 --out benchmarks/r4/mfu_n40_ds2.json
run python tools/mfu_report.py --mode train --train-instances 20 \
    --out benchmarks/r4/mfu_n20.json
run python tools/mfu_report.py --mode train --train-instances 20 \
    --set model.match_downsample=2 --out benchmarks/r4/mfu_n20_ds2.json
run python tools/stress_reference_scale.py --sections relation,streaming \
    --out benchmarks/r4/stress.json
echo "measure_r4 DONE"
