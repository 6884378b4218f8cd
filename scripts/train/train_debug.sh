#!/usr/bin/env bash
# Debug training on CPU with pdb-on-error (reference: scripts/train/train_debug.sh).
set -e
cd "$(dirname "$0")/../.."
OPENPVSG_PLATFORM=cpu python -m pdb -c continue tools/train.py --config mask2former_ips "$@"
