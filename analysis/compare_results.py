"""Side-by-side qualitative comparison of two result sets.

Capability match for the reference's plot/compare_performance_on_vis.py:
render the same validation images with detections from two results dirs
(e.g. baseline vs GrooMeD-NMS) stacked vertically.

Usage:
  python analysis/compare_results.py --images <image_2 dir> \
      --results-a <dirA/data> --results-b <dirB/data> \
      [--out out_dir] [--limit 20] [--score 0.6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _load_dets(path, score_thres):
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) >= 16 and float(p[15]) > score_thres:
                rows.append((p[0], [float(v) for v in p[4:8]], float(p[15])))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--results-a", required=True)
    ap.add_argument("--results-b", required=True)
    ap.add_argument("--out", default="compare_out")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--score", type=float, default=0.6)
    args = ap.parse_args()

    from PIL import Image
    from groomed_nms_tpu.utils.vis import draw_2d_box

    os.makedirs(args.out, exist_ok=True)
    names = sorted(os.listdir(args.images))[:args.limit]
    for name in names:
        iid = os.path.splitext(name)[0]
        img = np.asarray(Image.open(
            os.path.join(args.images, name)).convert("RGB"))
        fig, axes = plt.subplots(2, 1, figsize=(12, 8))
        for ax, rdir, title in zip(
                axes, (args.results_a, args.results_b), ("A", "B")):
            ax.imshow(img)
            for cls, box, score in _load_dets(
                    os.path.join(rdir, iid + ".txt"), args.score):
                draw_2d_box(ax, box, text=f"{cls[:3]} {score:.2f}")
            ax.set_title(f"{title}: {rdir}")
            ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, iid + ".png"), dpi=100)
        plt.close(fig)
    print(f"wrote {len(names)} comparisons to {args.out}")


if __name__ == "__main__":
    main()
