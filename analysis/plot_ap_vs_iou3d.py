"""AP3D vs IoU threshold at several GT distance gates.

Capability match for the reference's
plot/plot_AP_vs_IOU3D_threshold_at_different_gt_distances.py, consuming the
``ap_vs_iou_vs_dist.pkl`` written by
groomed_nms_tpu.eval.evaluate_kitti_results_verbose(fast_eval=False).

Usage: python analysis/plot_ap_vs_iou3d.py <results_dir> [out.png]
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main(results_dir, out_path="ap_vs_iou3d.png"):
    with open(os.path.join(results_dir, "ap_vs_iou_vs_dist.pkl"), "rb") as f:
        grid = pickle.load(f)

    fig, ax = plt.subplots(figsize=(7, 4.5))
    ious = [i / 10.0 for i in range(1, 8)]
    for dist in (15, 30, 45, 60):
        aps = []
        for i in range(1, 8):
            res = grid.get(f"{dist}m_0_{i}", {})
            aps.append(res.get(("car", "detection_3d"), [0, 0, 0])[1])
        ax.plot(ious, aps, marker="o", label=f"<= {dist} m")
    ax.set_xlabel("IoU3D threshold")
    ax.set_ylabel("AP3D moderate (Car)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print("saved", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
