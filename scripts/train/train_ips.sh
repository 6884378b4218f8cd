#!/usr/bin/env bash
# Train the IPS segmenter (reference: scripts/train/train_ips.sh — srun over
# 4 GPUs; here: all local TPU chips via the device mesh, no launcher needed).
set -e
cd "$(dirname "$0")/../.."
python tools/train.py --config mask2former_ips "$@"
