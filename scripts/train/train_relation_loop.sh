#!/usr/bin/env bash
# Train every relation-head variant in sequence (reference: train_relation_loop.sh).
set -e
cd "$(dirname "$0")/../.."
for m in vanilla filter conv transformer; do
  python tools/rel_train.py --model-name "$m" "$@"
done
