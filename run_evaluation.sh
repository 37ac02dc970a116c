#!/usr/bin/env bash
# Evaluation driver (reference scripts_evaluation.sh): batched inference on
# the validation split + the full KITTI AP sweep, for a trained config.
set -euo pipefail

CONFIG=${1:-groomed_nms}
DATA_ROOT=${DATA_ROOT:-data}
OUTPUT=${OUTPUT:-output}

python scripts/test.py --config "$CONFIG" \
    --data-root "$DATA_ROOT" --output "$OUTPUT"
