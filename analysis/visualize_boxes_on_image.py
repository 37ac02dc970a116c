"""Standalone 2D/3D box visualizer over prediction + ground-truth txt files.

Capability match for the reference's plot/visualize_boxes_on_image.py: read
KITTI-format prediction files and the split's ground truth, draw prediction
2D boxes (with index + depth annotations and the reference's small-box /
image-border suspicion highlighting) plus GT boxes and prediction 3D
wireframes, and save the figures.

Usage:
  python analysis/visualize_boxes_on_image.py \
      --results output/groomed_nms/results/results_latest \
      --images data/kitti_split1/validation/image_2 \
      --gt data/kitti_split1/validation/label_2 \
      --calib data/kitti_split1/validation/calib \
      [--num 20] [--score 0.3] [--out-dir vis_boxes]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from detection_stats import _rows

# boxes hugging the top/bottom image border with a tiny area are the typical
# projection artifacts the reference flags in red
# (plot/visualize_boxes_on_image.py:37-38)
THRESH_HEIGHT = 0.3
THRESH_AREA = 0.002


def _read_p2(calib_path):
    with open(calib_path) as f:
        for line in f:
            if line.startswith("P2:"):
                vals = [float(v) for v in line.split()[1:]]
                p2 = np.eye(4)
                p2[:3] = np.asarray(vals).reshape(3, 4)
                return p2
    raise ValueError(f"no P2 in {calib_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True,
                    help="results dir (containing data/) or data dir")
    ap.add_argument("--images", required=True)
    ap.add_argument("--gt", default=None)
    ap.add_argument("--calib", default=None)
    ap.add_argument("--num", type=int, default=20)
    ap.add_argument("--score", type=float, default=0.3)
    ap.add_argument("--classes", nargs="+",
                    default=["Car", "Pedestrian", "Cyclist"])
    ap.add_argument("--out-dir", default="vis_boxes")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from PIL import Image

    from groomed_nms_tpu.utils.vis import draw_2d_box, draw_3d_box

    data_dir = os.path.join(args.results, "data") if \
        os.path.isdir(os.path.join(args.results, "data")) else args.results
    os.makedirs(args.out_dir, exist_ok=True)
    names = sorted(os.listdir(data_dir))[:args.num]
    wanted = {c.lower() for c in args.classes}

    for name in names:
        iid = name[:-4]
        img_path = os.path.join(args.images, iid + ".png")
        if not os.path.exists(img_path):
            continue
        with Image.open(img_path) as im:
            img = np.asarray(im.convert("RGB"))
        ih, iw = img.shape[:2]
        fig, ax = plt.subplots(figsize=(12, 4), dpi=120)
        ax.imshow(img)
        ax.set_axis_off()

        p2 = _read_p2(os.path.join(args.calib, iid + ".txt")) \
            if args.calib else None

        if args.gt:
            for c, v in _rows(os.path.join(args.gt, name), min_cols=14):
                if c.lower() not in wanted:
                    continue
                # gt row: trunc occ alpha x1 y1 x2 y2 h w l x y z ry
                color = "red" if v[12] < 8 else "lime"
                draw_2d_box(ax, v[3:7], color=color,
                            text=f"z={v[12]:.1f}")

        for j, (c, v) in enumerate(_rows(os.path.join(data_dir, name),
                                         min_cols=16)):
            if c.lower() not in wanted or v[14] < args.score:
                continue
            x1, y1, x2, y2 = v[3:7]
            w, h = x2 - x1, y2 - y1
            color = "orange"
            if (y1 < THRESH_HEIGHT * ih or y1 > (1 - THRESH_HEIGHT) * ih) \
                    and w * h < THRESH_AREA * iw * ih:
                color = "red"  # suspicious tiny border box
            draw_2d_box(ax, (x1, y1, x2, y2), color=color,
                        text=f"{j}, {v[12]:.1f}")
            if p2 is not None:
                # det row: ... h w l x y z ry score; y is the box bottom in
                # KITTI labels -> center at y - h/2
                draw_3d_box(ax, p2, v[10], v[11] - v[7] / 2, v[12], v[8],
                            v[7], v[9], v[13])

        out = os.path.join(args.out_dir, iid + ".png")
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
