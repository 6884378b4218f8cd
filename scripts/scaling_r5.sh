#!/bin/bash
# Round-5 data-scaling study on the best cascade cell (Swin-T segmenter +
# relation_conv_interact head): does more training data lift the segmenter
# and, through it, the full mask-grounded protocol? Directly tests the
# repo's own "segmenter quality binds the full protocol" finding (DEMO.md
# r3/r5) along the data axis, with EVERYTHING else held fixed (model,
# epochs, LR, stage-4 hypers, seed).
#
# Design: ONE 96+8-video rich synthetic set is generated (seed 0); the
# 24- and 48-video arms are train-split SUBSETS of the same annotation
# (synthetic.py draws videos from one sequential RNG, so the first K train
# videos are identical across generation sizes — subsetting keeps the val
# set FIXED across arms, which --train-videos alone would not).
#
# Usage: bash scripts/scaling_r5.sh [ROOT=work_dirs/scale_r5]
# IDEMPOTENT: done_* markers + --auto-resume, like rich_cascade_r4.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-work_dirs/scale_r5}
D=$ROOT/data
SEED=0
EPOCHS=${EPOCHS:-60}
REL_EPOCHS=${REL_EPOCHS:-40}
SCALES=${SCALES:-"24 48 96"}

# the rich-cascade operating point (scripts/rich_cascade_r4.sh), Swin arm
OVR="model.num_queries=16 model.num_things_classes=5 \
model.num_stuff_classes=3 model.pixel_decoder.encoder_layers=1 \
model.decoder.num_layers=3 data.train_scale=96,128 data.crop_size=96,128 \
train.samples_per_gpu=32 train.lr=2e-4"
REL_OVR="relation.num_relations=8 relation.pair_interaction=True \
relation.encoder_layers=3 relation.encoder_ffn=1024 \
relation.temporal_layers=2 relation.temporal_heads=8 \
relation.temporal_ffn=1024"
CFG=mask2former_swin_vps
NAME=mask2former_swin_vps

if [ ! -f "$D/pvsg.json" ]; then
  echo "=== generate 96+8 rich videos ==="
  python tools/make_synthetic_data.py --out "$D" --style rich --frames 32 \
    --train-videos 96 --val-videos 8 --size 96 128 --seed $SEED
fi

for S in $SCALES; do
  A=$D/pvsg_s$S.json
  if [ ! -f "$A" ]; then
    python - "$D/pvsg.json" "$A" "$S" <<'EOF'
import json, sys
src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
anno = json.load(open(src))
anno["split"]["vidor"]["train"] = anno["split"]["vidor"]["train"][:k]
json.dump(anno, open(dst, "w"))
print(f"{dst}: train={k} val={len(anno['split']['vidor']['val'])}")
EOF
  fi
done

for S in $SCALES; do
  A=$D/pvsg_s$S.json
  W=$ROOT/s$S
  mkdir -p "$W"
  CKPT=$W/$NAME/epoch_$EPOCHS
  CFGJSON=$W/$NAME/config.json

  if [ ! -f "$W/done_pack" ]; then
    echo "=== [s$S] pack cache ==="
    OPENPVSG_PLATFORM=cpu python tools/pack_train_cache.py --config $CFG \
      --data-dir "$D" --anno-file "$A" --work-dir "$W" \
      --out "$W/packed" --set $OVR
    touch "$W/done_pack"
  fi

  if [ ! -f "$W/done_train" ]; then
    echo "=== [s$S] stage 1: train $EPOCHS epochs ==="
    rm -rf "$W/$NAME"/epoch_*.orbax-checkpoint-tmp
    python tools/train.py --config $CFG --data-dir "$D" \
      --anno-file "$A" --work-dir "$W" --packed-cache "$W/packed" \
      --epochs "$EPOCHS" --max-instances 10 --auto-resume --set $OVR \
      >> "$W/train.log" 2>&1
    touch "$W/done_train"
  fi

  if [ ! -f "$W/done_eval1" ]; then
    echo "=== [s$S] stage 1 eval: PQ + VPQ (CPU) ==="
    OPENPVSG_PLATFORM=cpu python tools/test.py --config "$CFGJSON" \
      --data-dir "$D" --anno-file "$A" --work-dir "$W" \
      --checkpoint "$CKPT" --split val --eval PQ > "$W/eval_pq.log" 2>&1
    OPENPVSG_PLATFORM=cpu python tools/test.py --config "$CFGJSON" \
      --data-dir "$D" --anno-file "$A" --work-dir "$W" \
      --checkpoint "$CKPT" --split val --eval VPQ > "$W/eval_vpq.log" 2>&1
    touch "$W/done_eval1"
  fi
  tail -n 3 "$W/eval_pq.log" "$W/eval_vpq.log" || true

  if [ ! -f "$W/done_tubes" ]; then
    echo "=== [s$S] stage 2: tube extraction (train + val) ==="
    for SPLIT in train val; do
      python tools/prepare_query_tube_vps.py --config "$CFGJSON" \
        --data-dir "$D" --anno-file "$A" --work-dir "$W" \
        --checkpoint "$CKPT" --split $SPLIT > "$W/qf_$SPLIT.log" 2>&1
    done
    touch "$W/done_tubes"
  fi

  if [ ! -f "$W/done_relset" ]; then
    echo "=== [s$S] stage 3: relation set (train + val) ==="
    for SPLIT in train val; do
      OPENPVSG_PLATFORM=cpu python tools/prepare_rel_set.py --data-dir "$D" \
        --anno-file "$A" --work-dir "$W" --split $SPLIT \
        > "$W/relset_$SPLIT.log" 2>&1
    done
    touch "$W/done_relset"
  fi

  if [ ! -f "$W/done_rel" ]; then
    echo "=== [s$S] stages 4+5: conv_interact relation head ==="
    python tools/rel_train.py --model-name conv --ps-type vps \
      --epochs "$REL_EPOCHS" --data-dir "$D" --anno-file "$A" \
      --work-dir "$W" --set $REL_OVR > "$W/rel_train.log" 2>&1
    RC=$W/relation/rel_vps_conv_lr0.0001/epoch_$REL_EPOCHS
    OPENPVSG_PLATFORM=cpu python tools/rel_test.py --checkpoint "$RC" \
      --model-name conv --split val --data-dir "$D" \
      --anno-file "$A" --work-dir "$W" --set $REL_OVR \
      > "$W/rel_test.log" 2>&1
    OPENPVSG_PLATFORM=cpu python tools/rel_test_full.py --checkpoint "$RC" \
      --model-name conv --split val --data-dir "$D" \
      --anno-file "$A" --work-dir "$W" --set $REL_OVR \
      --mark "s$S" > "$W/rel_test_full.log" 2>&1
    touch "$W/done_rel"
  fi
  echo "--- [s$S] proxy ---"; tail -n 12 "$W/rel_test.log" || true
  echo "--- [s$S] protocol ---"; tail -n 12 "$W/rel_test_full.log" || true
done
echo "scaling_r5 DONE"
