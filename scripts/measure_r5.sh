#!/bin/bash
# Round-5 chip-measurement battery (VERDICT r4 next-round #2/#4/#5/#8).
# Waits for a running cascade (pid file) to release the TPU, then:
#   1. closes the r4 gap: mfu_n20_ds2 (the cell measure_r4.sh never landed)
#   2. A/Bs the r5 train-tail probe: model.mask_logits_dtype=bfloat16 at
#      N=20 and N=40 vs the committed f32 baselines (benchmarks/r4/)
#   3. re-measures the input pipeline WITH a committed artifact
#      (benchmarks/r5/input_pipeline.json — the r4 numbers lost theirs)
#   4. stage3 + protocol reference-scale stress (host-side; CPU)
#   5. stage-2 400-frame stress re-run (the r4 8.15 f/s row lost its
#      artifact)
#   6. int8 weights-only serving A/B via bench.py (OPENPVSG_BENCH_INT8)
# Each mfu_report invocation is its own process (axon panics on mixed
# executables in-process — PERF.md r4).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p benchmarks/r5

if [ -f /tmp/cascade.pid ]; then
  while kill -0 "$(cat /tmp/cascade.pid)" 2>/dev/null; do sleep 20; done
fi

# header + failure notes go to stderr: two run() targets redirect stdout
# into benchmarks/*.json, which must stay parseable single-line JSON
run() { echo "=== $(date +%H:%M:%S) $* ===" >&2; timeout 2400 "$@" || echo "FAILED: $*" >&2; }

# -- 1+2: MFU battery
run python tools/mfu_report.py --mode train --train-instances 20 \
    --set model.match_downsample=2 --out benchmarks/r5/mfu_n20_ds2.json
run python tools/mfu_report.py --mode train --train-instances 20 \
    --set model.mask_logits_dtype=bfloat16 \
    --out benchmarks/r5/mfu_n20_bf16.json
run python tools/mfu_report.py --mode train --train-instances 40 \
    --set model.mask_logits_dtype=bfloat16 \
    --out benchmarks/r5/mfu_n40_bf16.json
# fresh f32 baselines in the same session (tunnel day-to-day drift control)
run python tools/mfu_report.py --mode train --train-instances 20 \
    --out benchmarks/r5/mfu_n20_f32.json
run python tools/mfu_report.py --mode train --train-instances 40 \
    --out benchmarks/r5/mfu_n40_f32.json

# -- 6: int8 weights-only serving A/B (two processes, one executable each)
run env OPENPVSG_BENCH_TRAIN=0 python bench.py \
    > benchmarks/r5/bench_infer_f16w.json
run env OPENPVSG_BENCH_TRAIN=0 OPENPVSG_BENCH_INT8=1 python bench.py \
    > benchmarks/r5/bench_infer_int8w.json

# -- 3: input pipeline (needs a 384x480-scale rich set + packed cache)
IPD=work_dirs/bench_ipipe_r5
if [ ! -f "$IPD/data/pvsg.json" ]; then
  OPENPVSG_PLATFORM=cpu python tools/make_synthetic_data.py \
    --out "$IPD/data" --style rich --frames 16 --train-videos 8 \
    --val-videos 1 --size 360 480 --seed 0
fi
if [ ! -d "$IPD/packed" ]; then
  OPENPVSG_PLATFORM=cpu python tools/pack_train_cache.py \
    --config mask2former_vps --data-dir "$IPD/data" \
    --anno-file "$IPD/data/pvsg.json" --work-dir "$IPD" \
    --out "$IPD/packed" --set data.train_scale=360,480 data.crop_size=360,480
fi
for SEC in device png packed; do
  run python tools/bench_input_pipeline.py --config mask2former_vps \
    --data-dir "$IPD/data" --anno-file "$IPD/data/pvsg.json" \
    --work-dir "$IPD" --packed-cache "$IPD/packed" --steps 30 \
    --only $SEC --set data.train_scale=360,480 data.crop_size=360,480 \
    --out benchmarks/r5/input_pipeline_$SEC.json
done

# -- 5: stage-2 400-frame stress (regenerate the long video if needed)
LD=work_dirs/stress_long
if [ ! -f "$LD/pvsg.json" ]; then
  OPENPVSG_PLATFORM=cpu python tools/make_synthetic_data.py --out "$LD" \
    --style rich --frames 400 --train-videos 0 --val-videos 1 \
    --size 96 128 --seed 0
fi
run python tools/stress_reference_scale.py --sections stage2 \
    --data-dir "$LD" --anno-file "$LD/pvsg.json" \
    --out benchmarks/r5/stress_stage2.json

# -- 4: stage3 + protocol at reference scale (host-side, chip idle)
run env OPENPVSG_PLATFORM=cpu python tools/stress_reference_scale.py \
    --sections stage3,protocol --out benchmarks/r5/stress_s3_protocol.json

echo "measure_r5 DONE"
