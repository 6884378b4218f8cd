#!/usr/bin/env bash
# Train the VPS segmenter on 2-frame clips (reference: scripts/train/train_vps.sh).
set -e
cd "$(dirname "$0")/../.."
python tools/train.py --config mask2former_vps "$@"
