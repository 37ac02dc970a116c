"""Binned box-confidence vs IoU3D / IoU2D curves with an error cache.

Capability match for the reference's plot/plot_prediction_with_ground_truth.py
(+ the error machinery in plot/common_operations.py:285-420): for each
results folder, every prediction is matched to its best-IoU2D ground truth
(matches with IoU2D <= 0.4 are dropped, like the reference's
min_iou2d_overlap), the matched pair's exact 3D IoU is computed, detections
are filtered by score and by |z error| (the reference's threshold_depth
gates the DEPTH ERROR, not the depth), and the per-bin mean confidence is
plotted against IoU3D and IoU2D with the unbinned correlation in the legend.
The per-folder match arrays are cached to ``error_list.npz`` next to the
results (the reference caches error_list_2.pkl).

Unlike compare_performance_on_vis.py (which reproduces the visibility-
filtered calibration curve), this matches ALL classes against ALL
non-DontCare GTs, exactly like read_folder_and_get_all_errors.

Usage:
  python analysis/plot_prediction_with_ground_truth.py \
      --results out/warmup/results/results_50000 out/groomed/... \
      --labels Warmup GrooMeD --gt data/kitti_split1/validation/label_2 \
      [--score 0.0] [--z-err 100] [--bins 25] [--out-dir .] [--prefix x]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from detection_stats import _rows


def _iou2d(box, gt_boxes):
    """IoU of one (x1,y1,x2,y2) box against [N,4] boxes."""
    if gt_boxes.shape[0] == 0:
        return np.zeros((0,))
    x1 = np.maximum(box[0], gt_boxes[:, 0])
    y1 = np.maximum(box[1], gt_boxes[:, 1])
    x2 = np.minimum(box[2], gt_boxes[:, 2])
    y2 = np.minimum(box[3], gt_boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = ((gt_boxes[:, 2] - gt_boxes[:, 0])
             * (gt_boxes[:, 3] - gt_boxes[:, 1]))
    return inter / np.maximum(area + areas - inter, 1e-12)


def collect_errors(results_data_dir, gt_dir, min_iou2d=0.4, cache=True,
                   max_boxes=500):
    """Match every prediction to its best-IoU2D GT; return match arrays.

    ``max_boxes`` caps detections per image at the first N txt rows
    (the reference's num_predictions_boxes=500); <= 0 disables the cap.
    The cache is keyed on (min_iou2d, max_boxes) and recomputed on
    mismatch; like the reference's pkl cache, it does NOT watch the txt
    files themselves -- delete error_list.npz after regenerating results.

    Returns dict of arrays over kept matches: score, iou2d, iou3d, z_err
    (|z3d_pred - z3d_gt|), z_gt.
    """
    key = np.array([min_iou2d, float(max_boxes)])
    cache_path = os.path.join(os.path.dirname(results_data_dir.rstrip("/")),
                              "error_list.npz")
    if cache and os.path.exists(cache_path):
        loaded = dict(np.load(cache_path))
        if np.array_equal(loaded.pop("cache_key", None), key):
            return loaded

    from groomed_nms_tpu.ops.iou3d_exact import iou3d_exact

    score, iou2d, iou3d, z_err, z_gt = [], [], [], [], []
    for name in sorted(os.listdir(results_data_dir)):
        if not name.endswith(".txt"):
            continue
        dets = _rows(os.path.join(results_data_dir, name), min_cols=16)
        if max_boxes > 0:
            dets = dets[:max_boxes]
        gts = _rows(os.path.join(gt_dir, name))
        # all classes; drop DontCare rows (z3d == -1000) like the reference
        gts = [(c, v) for c, v in gts if v[12] > -999]
        if not dets or not gts:
            continue
        gt2d = np.asarray([[v[3], v[4], v[5], v[6]] for _, v in gts])
        for _, v in dets:
            ov = _iou2d((v[3], v[4], v[5], v[6]), gt2d)
            j = int(np.argmax(ov))
            if ov[j] <= min_iou2d:
                continue
            g = gts[j][1]
            det_box = (v[10], v[11] - v[7] / 2, v[12], v[8], v[7], v[9],
                       v[13])
            gt_box = (g[10], g[11] - g[7] / 2, g[12], g[8], g[7], g[9],
                      g[13])
            score.append(v[14])
            iou2d.append(ov[j])
            iou3d.append(iou3d_exact(det_box, gt_box))
            z_err.append(abs(v[12] - g[12]))
            z_gt.append(g[12])
    out = {k: np.asarray(a) for k, a in
           [("score", score), ("iou2d", iou2d), ("iou3d", iou3d),
            ("z_err", z_err), ("z_gt", z_gt)]}
    if cache:
        try:
            np.savez(cache_path, cache_key=key, **out)
            print(f"cached {cache_path}")
        except OSError:
            pass
    return out


def binned_curve(x, y, bins):
    """Per-bin (mean x, mean y) -- the reference's binning, empty bins
    skipped and the x coordinate being the bin's own mean, not the
    center."""
    which = np.digitize(x, bins) - 1
    xs, ys = [], []
    for b in range(len(bins) - 1):
        m = which == b
        if m.any():
            xs.append(x[m].mean())
            ys.append(y[m].mean())
    return np.asarray(xs), np.asarray(ys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", nargs="+", required=True,
                    help="results dirs (containing data/) or data dirs")
    ap.add_argument("--labels", nargs="+", default=None)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--score", type=float, default=0.0)
    ap.add_argument("--z-err", type=float, default=100.0,
                    help="keep matches with |z error| below this (m)")
    ap.add_argument("--bins", type=int, default=25)
    ap.add_argument("--min-iou2d", type=float, default=0.4)
    ap.add_argument("--max-boxes", type=int, default=500,
                    help="per-image detection cap (first N rows, like the "
                         "reference's num_predictions_boxes); <= 0 = all")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--prefix", default=None)
    args = ap.parse_args()

    labels = args.labels or [os.path.basename(r.rstrip("/"))
                             for r in args.results]
    if len(labels) != len(args.results):
        raise SystemExit("--labels must pair with --results")

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    os.makedirs(args.out_dir, exist_ok=True)
    bins = np.arange(args.bins + 1) / float(args.bins)
    per_model = []
    for rd in args.results:
        data_dir = os.path.join(rd, "data") if \
            os.path.isdir(os.path.join(rd, "data")) else rd
        e = collect_errors(data_dir, args.gt, args.min_iou2d,
                           cache=not args.no_cache,
                           max_boxes=args.max_boxes)
        keep = (e["score"] >= args.score) & (e["z_err"] <= args.z_err)
        per_model.append({k: v[keep] for k, v in e.items()})

    for metric, xlabel in (("iou3d", r"Box IoU$_{3D}$"),
                           ("iou2d", r"Box IoU$_{2D}$")):
        fig, ax = plt.subplots(figsize=(6, 4), dpi=150)
        for e, label in zip(per_model, labels):
            if e["score"].size < 2:
                print(f"{label}: {e['score'].size} matches, skipping")
                continue
            if e[metric].std() > 0 and e["score"].std() > 0:
                corr = np.corrcoef(e[metric], e["score"])[0, 1]
                leg = f"{label}, Corr={corr:.3f}"
            else:
                corr = float("nan")
                leg = label
            xs, ys = binned_curve(e[metric], e["score"], bins)
            ax.plot(xs, ys, lw=2, label=leg)
            print(f"{label} [{metric}]: {e['score'].size} matches, "
                  f"corr={corr:.4f}")
        ax.set_xlabel(xlabel)
        ax.set_ylabel("Box Confidence")
        ax.set_xlim(0, 1.0)
        ax.grid(True)
        ax.legend(loc="lower right")
        fig.tight_layout()
        name = f"scores_vs_{metric}.png" if args.prefix is None else \
            f"scores_vs_{metric}_{args.prefix}.png"
        out = os.path.join(args.out_dir, name)
        fig.savefig(out)
        plt.close(fig)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
