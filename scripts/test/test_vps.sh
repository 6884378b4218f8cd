#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python tools/test.py --config mask2former_vps --eval PQ "$@"
