"""Python driver for the parameterized KITTI C++ evaluator.

Capability match for the reference's ``run_kitti_eval_script`` /
``evaluate_kitti_results_verbose`` / ``parse_kitti_result``
(lib/rpn_util.py:2043-2200): runs the binary, parses the stats files into
AP|R40 / AP|R11 per class x difficulty x metric, and sweeps the
distance x IoU grid (4 distances x 7 IoU thresholds) that the reference
implements as 28 separate binaries.
"""

from __future__ import annotations

import os
import pickle
import subprocess

import numpy as np

_EVAL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, os.pardir, "eval")
_BINARY = os.path.join(_EVAL_DIR, "kitti_eval")

CLASSES = ("car", "pedestrian", "cyclist")
METRICS = ("detection", "orientation", "detection_ground", "detection_3d")
DIFFICULTIES = ("easy", "moderate", "hard")


def ensure_binary():
    """Compile eval/kitti_eval via make (dependency-tracked no-op when
    fresh), so edits to kitti_eval.cpp never evaluate with a stale binary."""
    subprocess.check_call(["make", "-C", os.path.abspath(_EVAL_DIR)],
                          stdout=subprocess.DEVNULL)
    return _BINARY


def ap_from_precision(values, protocol="R40"):
    """AP from 41 interpolated precision points.

    Reference parse_kitti_result (lib/rpn_util.py:2031-2038): R40 = mean of
    points 1..40; R11 = mean of every 4th point of all 41 (incl. point 0).
    """
    values = np.asarray(values, np.float64)
    if protocol == "R40":
        return float(values[1:41].mean() * 100.0)
    if protocol == "R11":
        return float(values[0:41:4].mean() * 100.0)
    raise ValueError(protocol)


def parse_stats_file(path, protocol="R40"):
    """[easy, moderate, hard] AP from one stats txt (3 rows x 41 values)."""
    rows = []
    with open(path) as f:
        for line in f:
            vals = [float(v) for v in line.split()]
            if len(vals) >= 41:
                rows.append(ap_from_precision(vals, protocol))
    return rows


def run_kitti_eval(results_dir, gt_dir, overlaps=(0.7, 0.5, 0.5),
                   max_dist=None, protocol="R40"):
    """Run the binary once; returns {(cls, metric): [easy, mod, hard]}.

    ``results_dir`` must contain ``data/*.txt`` detections.
    """
    binary = ensure_binary()
    # the binary only writes stats files for class/metric pairs enabled by
    # the CURRENT detections; clear leftovers from a previous eval so they
    # cannot be reported as this run's results
    for cls in CLASSES:
        for metric in METRICS:
            stale = os.path.join(results_dir, f"stats_{cls}_{metric}.txt")
            if os.path.exists(stale):
                os.remove(stale)
    cmd = [binary, os.path.abspath(results_dir), os.path.abspath(gt_dir),
           "--overlap", str(overlaps[0]), str(overlaps[1]), str(overlaps[2])]
    if max_dist is not None and max_dist > 0:
        cmd += ["--max_dist", str(max_dist)]
    subprocess.check_output(cmd)

    results = {}
    for cls in CLASSES:
        for metric in METRICS:
            path = os.path.join(results_dir, f"stats_{cls}_{metric}.txt")
            if os.path.exists(path):
                results[(cls, metric)] = parse_stats_file(path, protocol)
    return results


def evaluate_kitti_results_verbose(results_dir, gt_dir, fast_eval=True,
                                   protocol="R40", log_fn=print):
    """The reference's full evaluation sweep (lib/rpn_util.py:2076-2200).

    Main pass at (0.7, 0.5, 0.5), side pass at (0.5, 0.3, 0.3), and --
    unless ``fast_eval`` -- the 4x7 distance x IoU grid, pickled as
    ``ap_vs_iou_vs_dist.pkl`` for the plot suite.
    """
    out = {"main": run_kitti_eval(results_dir, gt_dir, (0.7, 0.5, 0.5),
                                  protocol=protocol)}
    for (cls, metric), aps in sorted(out["main"].items()):
        log_fn(f"{cls} {metric} AP|{protocol}: "
               + " / ".join(f"{a:.2f}" for a in aps))

    out["side"] = run_kitti_eval(results_dir, gt_dir, (0.5, 0.3, 0.3),
                                 protocol=protocol)

    if not fast_eval:
        grid = {}
        for dist in (15, 30, 45, 60):
            for iou10 in range(1, 8):
                ov = iou10 / 10.0
                key = f"{dist}m_0_{iou10}"
                grid[key] = run_kitti_eval(results_dir, gt_dir, (ov, ov, ov),
                                           max_dist=dist, protocol=protocol)
        out["grid"] = grid
        with open(os.path.join(results_dir, "ap_vs_iou_vs_dist.pkl"),
                  "wb") as f:
            pickle.dump(grid, f)
    return out


def kitti_roc_table(results_dir, gt_dir, cls="car", metric="detection_3d",
                    ious=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7), protocol="R40",
                    log_fn=print):
    """AP-vs-IoU-threshold ROC table (reference print_kitti_ROC,
    lib/rpn_util.py:2203-2224). Returns {iou: [easy, mod, hard]}."""
    table = {}
    for ov in ious:
        res = run_kitti_eval(results_dir, gt_dir, (ov, ov, ov),
                             protocol=protocol)
        table[ov] = res.get((cls, metric), [0.0, 0.0, 0.0])
    header = "IoU   " + "  ".join(f"{d:>8}" for d in DIFFICULTIES)
    log_fn(header)
    for ov, aps in table.items():
        log_fn(f"{ov:.2f}  " + "  ".join(f"{a:8.2f}" for a in aps))
    return table


def save_kitti_roc(table, out_path, title="AP3D vs IoU"):
    """Plot the ROC table (reference save_kitti_ROC,
    lib/rpn_util.py:2226-2251)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ious = sorted(table)
    for di, name in enumerate(DIFFICULTIES):
        ax.plot(ious, [table[ov][di] for ov in ious], marker="o", label=name)
    ax.set_xlabel("IoU threshold")
    ax.set_ylabel("AP")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
