#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python tools/show_pred_results.py "$@"
