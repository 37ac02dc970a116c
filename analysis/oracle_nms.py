"""Oracle-NMS experiment: upper-bound AP by rescoring with GT IoU.

Capability match for the reference's test/get_oracle_nms.py: replace each
detection's score with its best IoU (2D or 3D) against the ground truth
before NMS, measuring how much of the AP gap is pure ranking error.

Usage:
  python analysis/oracle_nms.py --results <dir with data/*.txt> \
      --gt <label_2 dir> [--mode 3d|2d]
Rewrites scores into ``<results>_oracle/data`` and runs the evaluator.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def _load_rows(path, min_cols=16):
    """Parse KITTI txt rows.  Detections carry 16 tokens (15 values + the
    trailing score); GROUND-TRUTH label files have exactly 15 (no score) --
    pass min_cols=15 for those or every GT line is silently dropped and
    the oracle rescoring zeroes all scores."""
    rows = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) >= min_cols:
                vals = [float(v) for v in p[1:16]]
                vals += [0.0] * (16 - len(p))  # pad absent score for GT
                rows.append((p[0], vals))
    return rows


def _iou2d(a, b):
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-12)


def oracle_rescore(results_dir, gt_dir, out_dir, mode="2d"):
    os.makedirs(os.path.join(out_dir, "data"), exist_ok=True)
    data_dir = os.path.join(results_dir, "data")
    for name in sorted(os.listdir(data_dir)):
        dets = _load_rows(os.path.join(data_dir, name))
        gts = _load_rows(os.path.join(gt_dir, name), min_cols=15) \
            if os.path.exists(os.path.join(gt_dir, name)) else []
        lines = []
        for cls, v in dets:
            best = 0.0
            for gcls, g in gts:
                if gcls.lower() != cls.lower():
                    continue
                if mode == "2d":
                    best = max(best, _iou2d(v[3:7], g[3:7]))
                else:
                    # coarse 3D proxy: center distance -> pseudo IoU
                    d = np.linalg.norm(np.asarray(v[10:13])
                                       - np.asarray(g[10:13]))
                    best = max(best, max(0.0, 1.0 - d / 4.0))
            v = list(v)
            v[14] = best   # overwrite score with oracle overlap
            lines.append(cls + " " + " ".join(f"{x:.6f}" for x in v))
        with open(os.path.join(out_dir, "data", name), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--mode", default="2d", choices=("2d", "3d"))
    args = ap.parse_args()
    out_dir = args.results.rstrip("/") + "_oracle"
    oracle_rescore(args.results, args.gt, out_dir, args.mode)
    from groomed_nms_tpu.eval import evaluate_kitti_results_verbose
    evaluate_kitti_results_verbose(out_dir, args.gt, fast_eval=True)


if __name__ == "__main__":
    main()
