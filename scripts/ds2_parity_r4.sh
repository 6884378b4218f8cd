#!/bin/bash
# Quality-parity run for model.match_downsample=2 (round-4 pooled matching
# costs): train the rich-cascade r26 stage-1 config bit-for-bit except the
# matching knob, on IDENTICAL data + seed, then eval PQ/VPQ on CPU. The
# speed side of the A/B is measured separately by scripts/measure_r4.sh at
# the 384x480 operating point; this run answers "does pooled matching
# change what the model learns" at the rich-cascade operating point
# (baseline: work_dirs/rich_r4/r26 PQ 0.5374 / VPQ 0.3214).
set -euo pipefail
cd "$(dirname "$0")/.."

# wait for the measurement battery to release the chip
if [ -f /tmp/measure.pid ]; then
  while kill -0 "$(cat /tmp/measure.pid)" 2>/dev/null; do sleep 20; done
fi

ROOT=work_dirs/rich_r4
D=$ROOT/data
W=$ROOT/ds2
EPOCHS=60
OVR="model.num_queries=16 model.num_things_classes=5 \
model.num_stuff_classes=3 model.pixel_decoder.encoder_layers=1 \
model.decoder.num_layers=3 data.train_scale=96,128 data.crop_size=96,128 \
train.samples_per_gpu=32 train.lr=2e-4 model.backbone.depth=26 \
model.match_downsample=2"
NAME=mask2former_vps
CKPT=$W/$NAME/epoch_$EPOCHS

mkdir -p "$W"
if [ ! -f "$W/done_train" ]; then
  # the packed cache is matching-knob independent — reuse the r26 one
  python tools/train.py --config mask2former_vps --data-dir "$D" \
    --anno-file "$D/pvsg.json" --work-dir "$W" \
    --packed-cache "$ROOT/r26/packed" --epochs $EPOCHS --max-instances 10 \
    --auto-resume --set $OVR >> "$W/train.log" 2>&1
  touch "$W/done_train"
fi
for EV in PQ VPQ; do
  OPENPVSG_PLATFORM=cpu python tools/test.py --config "$W/$NAME/config.json" \
    --data-dir "$D" --anno-file "$D/pvsg.json" --work-dir "$W" \
    --checkpoint "$CKPT" --split val --eval $EV \
    > "$W/eval_$(echo $EV | tr A-Z a-z).log" 2>&1
done
tail -n 1 "$W/eval_pq.log"
tail -n 1 "$W/eval_vpq.log"
echo "ds2_parity_r4 DONE"
