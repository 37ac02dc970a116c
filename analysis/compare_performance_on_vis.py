"""Binned box-confidence vs IoU3D curves for one or more models.

Capability match for the reference's plot/compare_performance_on_vis.py:
for each results folder, match every prediction to its best-IoU3D ground
truth (visible objects only: occlusion <= 2), bin by IoU3D, and plot the
mean confidence per bin -- the calibration curve the acceptance-prob branch
is meant to straighten.

Usage:
  python analysis/compare_performance_on_vis.py \
      --results out/warmup/results/results_50000 out/groomed/... \
      --labels Warmup GrooMeD --gt data/kitti_split1/validation/label_2 \
      [--score 0.0] [--depth 100] [--bins 25] [--out scores_vs_iou3d.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from detection_stats import _rows


def collect_matches(results_data_dir, gt_dir, cls="Car", score_thresh=0.0,
                    depth_thresh=100.0):
    """(scores, best IoU3D, gt occlusion) per detection above threshold."""
    from groomed_nms_tpu.ops.iou3d_exact import iou3d_exact

    scores, ious = [], []
    for name in sorted(os.listdir(results_data_dir)):
        dets = _rows(os.path.join(results_data_dir, name), min_cols=16)
        gts = _rows(os.path.join(gt_dir, name))
        # match against VISIBLE ground truth only (occlusion state <= 2,
        # filtered BEFORE matching): a detection overlapping a heavily-
        # occluded GT is scored against its best visible GT (possibly 0),
        # never silently dropped
        gt_boxes = [(v[10], v[11] - v[7] / 2, v[12], v[8], v[7], v[9],
                     v[13])
                    for c, v in gts
                    if c.lower() == cls.lower() and v[1] <= 2]
        for c, v in dets:
            if c.lower() != cls.lower() or v[14] <= score_thresh or \
                    v[12] > depth_thresh:
                continue
            det_box = (v[10], v[11] - v[7] / 2, v[12], v[8], v[7], v[9],
                       v[13])
            best_iou = 0.0
            for g in gt_boxes:
                best_iou = max(best_iou, iou3d_exact(det_box, g))
            scores.append(v[14])
            ious.append(best_iou)
    return np.asarray(scores), np.asarray(ious)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", nargs="+", required=True,
                    help="results dirs (containing data/) or data dirs")
    ap.add_argument("--labels", nargs="+", default=None)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--cls", default="Car")
    ap.add_argument("--score", type=float, default=0.0)
    ap.add_argument("--depth", type=float, default=100.0)
    ap.add_argument("--bins", type=int, default=25)
    ap.add_argument("--out", default="scores_vs_iou3d.png")
    args = ap.parse_args()

    labels = args.labels or [os.path.basename(r.rstrip("/"))
                             for r in args.results]
    if len(labels) != len(args.results):
        raise SystemExit("--labels must pair with --results")

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    bins = np.arange(args.bins + 1) / float(args.bins)
    centers = 0.5 * (bins[:-1] + bins[1:])
    fig, ax = plt.subplots(figsize=(6, 4), dpi=150)
    for rd, label in zip(args.results, labels):
        data_dir = os.path.join(rd, "data") if \
            os.path.isdir(os.path.join(rd, "data")) else rd
        scores, ious = collect_matches(
            data_dir, args.gt, args.cls, args.score, args.depth)
        which = np.digitize(ious, bins) - 1
        means = [scores[which == b].mean() if (which == b).any() else np.nan
                 for b in range(args.bins)]
        ax.plot(centers, means, marker="o", markersize=3, label=label)
        print(f"{label}: {len(scores)} dets, "
              f"corr={np.corrcoef(scores, ious)[0, 1]:.4f}"
              if len(scores) > 1 else f"{label}: {len(scores)} dets")

    ax.set_xlabel(r"Box IoU$_{3D}$")
    ax.set_ylabel("Box confidence")
    ax.set_xlim(0, 1)
    ax.grid(True)
    ax.legend(loc="lower right")
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
