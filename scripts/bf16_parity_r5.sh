#!/bin/bash
# Quality-parity run for model.mask_logits_dtype=bfloat16 (round-5 train-tail
# win: 79.8->75.1 ms N=20, 89.2->86.0 ms N=40, benchmarks/r5/mfu_*). Trains
# the rich-cascade r26 stage-1 config bit-for-bit except the logits dtype, on
# IDENTICAL data + seed, then evals PQ/VPQ on CPU — same protocol as
# scripts/ds2_parity_r4.sh. Baseline: the same-session r26 arm in
# benchmarks/r5/cascade_grid.json (PQ 0.5136 / VPQ 0.3169).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=work_dirs/rich_r4
D=$ROOT/data
W=$ROOT/bf16
EPOCHS=60
OVR="model.num_queries=16 model.num_things_classes=5 \
model.num_stuff_classes=3 model.pixel_decoder.encoder_layers=1 \
model.decoder.num_layers=3 data.train_scale=96,128 data.crop_size=96,128 \
train.samples_per_gpu=32 train.lr=2e-4 model.backbone.depth=26 \
model.mask_logits_dtype=bfloat16"
NAME=mask2former_vps
CKPT=$W/$NAME/epoch_$EPOCHS

mkdir -p "$W"
if [ ! -f "$W/done_train" ]; then
  # the packed cache is dtype-independent — reuse the r26 one
  python tools/train.py --config mask2former_vps --data-dir "$D" \
    --anno-file "$D/pvsg.json" --work-dir "$W" \
    --packed-cache "$ROOT/r26/packed" --epochs $EPOCHS --max-instances 10 \
    --auto-resume --set $OVR >> "$W/train.log" 2>&1
  touch "$W/done_train"
fi
# two eval arms on the SAME checkpoint: as-trained (bf16 mask logits at
# eval too, what a user of the knob gets) and eval-forced-f32 — the knob
# lands in the dumped config.json, so without the override the A/B would
# conflate train-time and eval-time rounding (r5 review finding)
for EV in PQ VPQ; do
  OPENPVSG_PLATFORM=cpu python tools/test.py --config "$W/$NAME/config.json" \
    --data-dir "$D" --anno-file "$D/pvsg.json" --work-dir "$W" \
    --checkpoint "$CKPT" --split val --eval $EV \
    > "$W/eval_$(echo $EV | tr A-Z a-z).log" 2>&1
  OPENPVSG_PLATFORM=cpu python tools/test.py --config "$W/$NAME/config.json" \
    --data-dir "$D" --anno-file "$D/pvsg.json" --work-dir "$W" \
    --checkpoint "$CKPT" --split val --eval $EV \
    --set model.mask_logits_dtype=float32 \
    > "$W/eval_$(echo $EV | tr A-Z a-z)_f32eval.log" 2>&1
done
tail -n 1 "$W/eval_pq.log" "$W/eval_pq_f32eval.log"
tail -n 1 "$W/eval_vpq.log" "$W/eval_vpq_f32eval.log"
echo "bf16_parity_r5 DONE"
