#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
OPENPVSG_PLATFORM=cpu python -m pdb -c continue tools/rel_train.py --model-name "${1:-transformer}" "${@:2}"
