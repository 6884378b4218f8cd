#!/usr/bin/env bash
# Stage-2 IPS tube extraction (reference: scripts/utils/prepare_qf_ips.sh).
set -e
cd "$(dirname "$0")/../.."
python tools/prepare_query_tube_ips.py --config mask2former_ips "$@"
