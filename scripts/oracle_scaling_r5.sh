#!/bin/bash
# Round-5 oracle-tube data-scaling study: the segmenter-INDEPENDENT twin of
# scripts/scaling_r5.sh. The main study scales the whole cascade (does more
# data lift the segmenter and, through it, the protocol?); this one feeds
# PERFECT GT tubes (data/synthetic.py:write_oracle_stage2) to the relation
# heads at 24/48/96 train videos, asking the question the r3 capacity study
# left open: is the transformer head's capacity INVERSION at 24 videos
# (tiny beats large — DEMO.md capacity study) data-starvation that more
# videos cure, or an architecture cap? And does conv+interact keep scaling?
#
# Reuses the main study's single 96+8-video generation (seed 0) and its
# pvsg_s{24,48,96}.json subset annotations, so the val set and the first K
# train videos are IDENTICAL across arms and across both studies.
#
# Grid per scale: {conv, transformer} x {tiny, large, interact_large},
# 40 epochs, --eval-train for the memorization-vs-generalization split
# (high train R@K + low val = data-starved; low train = architecture cap).
#
# Usage: bash scripts/oracle_scaling_r5.sh   (after scaling_r5.sh's data
# generation; done markers make it idempotent)
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-work_dirs/oracle_scale_r5}
D=${DATA:-work_dirs/scale_r5/data}
SEED=0
EPOCHS=${EPOCHS:-40}
SCALES=${SCALES:-"24 48 96"}
VARIANTS=${VARIANTS:-conv,transformer}
CAPS=${CAPS:-tiny,large,interact_large}

[ -f "$D/pvsg.json" ] || { echo "missing $D/pvsg.json — run scaling_r5.sh data gen first"; exit 1; }

for S in $SCALES; do
  A=$D/pvsg_s$S.json
  W=$ROOT/s$S
  mkdir -p "$W"

  if [ ! -f "$W/done_oracle" ]; then
    echo "=== [s$S] oracle stage-2 tubes (train + val) ==="
    OPENPVSG_PLATFORM=cpu python - "$D" "$A" "$W" "$SEED" <<'EOF'
import sys
sys.path.insert(0, ".")
from openpvsg_tpu.data.synthetic import write_oracle_stage2
d, a, w, seed = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
for split in ("train", "val"):
    dirs = write_oracle_stage2(d, a, w, split, seed=seed)
    print(f"oracle stage-2 [{split}]: {len(dirs)} videos")
EOF
    touch "$W/done_oracle"
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

  if [ ! -f "$W/done_grid" ]; then
    echo "=== [s$S] capacity grid: $VARIANTS x $CAPS, $EPOCHS epochs ==="
    python tools/rel_capacity_study.py --data-dir "$D" --anno-file "$A" \
      --work-dir "$W" --epochs "$EPOCHS" --seed "$SEED" \
      --variants "$VARIANTS" --capacities "$CAPS" --eval-train --resume \
      --out "$W/capacity_s$S.json" >> "$W/grid.log" 2>&1
    touch "$W/done_grid"
  fi
  echo "--- [s$S] grid ---"; tail -n 20 "$W/grid.log"
done
echo "oracle_scaling_r5 DONE"
