#!/usr/bin/env bash
# Feature-level relation eval (reference: scripts/test/test_relation.sh).
set -e
cd "$(dirname "$0")/../.."
python tools/rel_test.py "$@"
