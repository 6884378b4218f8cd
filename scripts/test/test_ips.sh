#!/usr/bin/env bash
# PQ evaluation of the IPS segmenter (reference: scripts/test/test_ips.sh).
set -e
cd "$(dirname "$0")/../.."
python tools/test.py --config mask2former_ips --eval PQ "$@"
