#!/usr/bin/env bash
# Final mask-grounded protocol (reference: scripts/test/test_relation_full.sh).
set -e
cd "$(dirname "$0")/../.."
python tools/rel_test_full.py "$@"
