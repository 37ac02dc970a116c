#!/usr/bin/env bash
# Two-stage training recipe (reference scripts_training.sh):
#   stage 1: 80k-iter warmup without NMS-in-loss
#   stage 2: 50k-iter GrooMeD-NMS run warm-started from the warmup weights
#            (anchors + bbox statistics copied via copy_stats)
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-data}
OUTPUT=${OUTPUT:-output}

python scripts/train.py --config kitti_3d_warmup \
    --data-root "$DATA_ROOT" --output "$OUTPUT"

python scripts/train.py --config groomed_nms \
    --data-root "$DATA_ROOT" --output "$OUTPUT"

python scripts/test.py --config groomed_nms \
    --data-root "$DATA_ROOT" --output "$OUTPUT"
