#!/usr/bin/env bash
# Train a relation head (reference: scripts/train/train_relation.sh).
# usage: train_relation.sh [vanilla|filter|conv|transformer] [ips|vps]
set -e
cd "$(dirname "$0")/../.."
python tools/rel_train.py --model-name "${1:-transformer}" --ps-type "${2:-ips}" "${@:3}"
