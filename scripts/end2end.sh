#!/usr/bin/env bash
# Single-command full pipeline (no reference equivalent — their
# end2end_inference.py was empty).
set -e
cd "$(dirname "$0")/.."
python tools/end2end_inference.py "$@"
