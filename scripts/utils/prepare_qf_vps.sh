#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python tools/prepare_query_tube_vps.py --config mask2former_vps "$@"
