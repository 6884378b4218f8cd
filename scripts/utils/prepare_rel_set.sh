#!/usr/bin/env bash
# Stage-3 relation-set construction (reference: scripts/utils/prepare_rel_set.sh).
set -e
cd "$(dirname "$0")/../.."
python tools/prepare_rel_set.py --jobs "${JOBS:-10}" "$@"
