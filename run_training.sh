#!/usr/bin/env bash
# Two-stage training recipe (reference scripts_training.sh):
#   stage 1: 80k-iter warmup without NMS-in-loss
#   stage 2: 50k-iter GrooMeD-NMS run warm-started from the warmup weights
#            (anchors + bbox statistics copied via copy_stats)
# Stages run under scripts/run_convergence.sh, a restart loop that watches
# trainer RSS and relaunches on the remote-TPU client's host-memory growth
# (train.py auto-resumes from the run dir's latest checkpoint), so multi-hour
# runs survive on a bounded-memory host.
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-data}
OUTPUT=${OUTPUT:-output}
LOG_DIR=${LOG_DIR:-$OUTPUT}
mkdir -p "$LOG_DIR"

bash scripts/run_convergence.sh "$LOG_DIR/kitti_3d_warmup.log" \
    "$OUTPUT/kitti_3d_warmup" -- --config kitti_3d_warmup \
    --data-root "$DATA_ROOT" --output "$OUTPUT"

bash scripts/run_convergence.sh "$LOG_DIR/groomed_nms.log" \
    "$OUTPUT/groomed_nms" -- --config groomed_nms \
    --data-root "$DATA_ROOT" --output "$OUTPUT"

python scripts/test.py --config groomed_nms \
    --data-root "$DATA_ROOT" --output "$OUTPUT"
