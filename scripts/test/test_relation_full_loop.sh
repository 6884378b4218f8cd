#!/usr/bin/env bash
# Final protocol over every variant checkpoint (reference: test_relation_full_loop.sh).
set -e
cd "$(dirname "$0")/../.."
for m in vanilla filter conv transformer; do
  python tools/rel_test_full.py --model-name "$m" "$@"
done
