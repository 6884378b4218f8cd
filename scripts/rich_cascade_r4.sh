#!/bin/bash
# Round-4 rich-data cascade: R26 baseline vs Swin-T segmenter on IDENTICAL
# synthetic data (VERDICT r3 next-round #5 — attack the segmenter bound,
# re-check whether relation_conv_interact's win survives better tubes).
#
# Usage: bash scripts/rich_cascade_r4.sh [ROOT]
# Stage 1/2/4 run on the default platform (TPU under axon); PQ/VPQ and
# protocol evals run on CPU (OPENPVSG_PLATFORM=cpu) to keep the chip free.
#
# IDEMPOTENT: every stage writes a done_<stage> marker and is skipped on
# re-run; stage-1 training auto-resumes from the latest epoch checkpoint
# (the driver environment can kill long sessions — just re-run the script).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-work_dirs/rich_r4}
D=$ROOT/data
SEED=0
EPOCHS=${EPOCHS:-60}
REL_EPOCHS=${REL_EPOCHS:-40}

# shared model/data overrides (the r3 rich-cascade operating point)
OVR_COMMON="model.num_queries=16 model.num_things_classes=5 \
model.num_stuff_classes=3 model.pixel_decoder.encoder_layers=1 \
model.decoder.num_layers=3 data.train_scale=96,128 data.crop_size=96,128 \
train.samples_per_gpu=32 train.lr=2e-4"
REL_OVR="relation.num_relations=8"

if [ ! -f "$D/pvsg.json" ]; then
  python tools/make_synthetic_data.py --out "$D" --style rich --frames 32 \
    --train-videos 24 --val-videos 8 --size 96 128 --seed $SEED
fi

for BK in r26 swin; do
  if [ "$BK" = r26 ]; then
    CFG=mask2former_vps
    OVR="$OVR_COMMON model.backbone.depth=26"
    NAME=mask2former_vps
  else
    CFG=mask2former_swin_vps
    OVR="$OVR_COMMON"
    NAME=mask2former_swin_vps
  fi
  W=$ROOT/$BK
  mkdir -p "$W"
  CKPT=$W/$NAME/epoch_$EPOCHS
  CFGJSON=$W/$NAME/config.json

  if [ ! -f "$W/done_pack" ]; then
    echo "=== [$BK] pack cache ==="
    OPENPVSG_PLATFORM=cpu python tools/pack_train_cache.py --config $CFG \
      --data-dir "$D" --anno-file "$D/pvsg.json" --work-dir "$W" \
      --out "$W/packed" --set $OVR
    touch "$W/done_pack"
  fi

  if [ ! -f "$W/done_train" ]; then
    echo "=== [$BK] stage 1: train $EPOCHS epochs ==="
    rm -rf "$W/$NAME"/epoch_*.orbax-checkpoint-tmp
    python tools/train.py --config $CFG --data-dir "$D" \
      --anno-file "$D/pvsg.json" --work-dir "$W" --packed-cache "$W/packed" \
      --epochs "$EPOCHS" --max-instances 10 --auto-resume --set $OVR \
      >> "$W/train.log" 2>&1
    touch "$W/done_train"
  fi

  if [ ! -f "$W/done_eval1" ]; then
    echo "=== [$BK] stage 1 eval: PQ + VPQ (CPU) ==="
    OPENPVSG_PLATFORM=cpu python tools/test.py --config "$CFGJSON" \
      --data-dir "$D" --anno-file "$D/pvsg.json" --work-dir "$W" \
      --checkpoint "$CKPT" --split val --eval PQ > "$W/eval_pq.log" 2>&1
    OPENPVSG_PLATFORM=cpu python tools/test.py --config "$CFGJSON" \
      --data-dir "$D" --anno-file "$D/pvsg.json" --work-dir "$W" \
      --checkpoint "$CKPT" --split val --eval VPQ > "$W/eval_vpq.log" 2>&1
    touch "$W/done_eval1"
  fi
  tail -n 3 "$W/eval_pq.log" "$W/eval_vpq.log" || true

  if [ ! -f "$W/done_tubes" ]; then
    echo "=== [$BK] stage 2: tube extraction (train + val) ==="
    for SPLIT in train val; do
      python tools/prepare_query_tube_vps.py --config "$CFGJSON" \
        --data-dir "$D" --anno-file "$D/pvsg.json" --work-dir "$W" \
        --checkpoint "$CKPT" --split $SPLIT > "$W/qf_$SPLIT.log" 2>&1
    done
    touch "$W/done_tubes"
  fi

  if [ ! -f "$W/done_relset" ]; then
    echo "=== [$BK] stage 3: relation set (train + val) ==="
    for SPLIT in train val; do
      OPENPVSG_PLATFORM=cpu python tools/prepare_rel_set.py --data-dir "$D" \
        --anno-file "$D/pvsg.json" --work-dir "$W" --split $SPLIT \
        > "$W/relset_$SPLIT.log" 2>&1
    done
    touch "$W/done_relset"
  fi

  echo "=== [$BK] stages 4+5: relation heads ==="
  for HEAD in transformer conv_interact; do
    if [ "$HEAD" = transformer ]; then
      MN=transformer
      HOVR="$REL_OVR"
    else
      MN=conv
      HOVR="$REL_OVR relation.pair_interaction=True \
relation.encoder_layers=3 relation.encoder_ffn=1024 \
relation.temporal_layers=2 relation.temporal_heads=8 \
relation.temporal_ffn=1024"
    fi
    if [ ! -f "$W/done_rel_$HEAD" ]; then
      python tools/rel_train.py --model-name $MN --ps-type vps \
        --epochs "$REL_EPOCHS" --data-dir "$D" --anno-file "$D/pvsg.json" \
        --work-dir "$W" --set $HOVR > "$W/rel_train_$HEAD.log" 2>&1
      RC=$W/relation/rel_vps_${MN}_lr0.0001/epoch_$REL_EPOCHS
      OPENPVSG_PLATFORM=cpu python tools/rel_test.py --checkpoint "$RC" \
        --model-name $MN --split val --data-dir "$D" \
        --anno-file "$D/pvsg.json" --work-dir "$W" --set $HOVR \
        > "$W/rel_test_$HEAD.log" 2>&1
      OPENPVSG_PLATFORM=cpu python tools/rel_test_full.py --checkpoint "$RC" \
        --model-name $MN --split val --data-dir "$D" \
        --anno-file "$D/pvsg.json" --work-dir "$W" --set $HOVR \
        --mark "${BK}_${HEAD}" > "$W/rel_test_full_$HEAD.log" 2>&1
      touch "$W/done_rel_$HEAD"
    fi
    echo "--- [$BK/$HEAD] proxy ---"; tail -n 12 "$W/rel_test_$HEAD.log" || true
    echo "--- [$BK/$HEAD] protocol ---"; tail -n 12 "$W/rel_test_full_$HEAD.log" || true
  done
done
echo "rich_cascade_r4 DONE"
