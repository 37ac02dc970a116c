"""Ground-truth depth distribution histograms per split.

Capability match for the reference's plot/plot_distribution_of_split1_train.py:
for each split (training/validation), filter GTs exactly like training does
(determine_ignores with the config's class lists and scaled-height gates) and
histogram the 3D depth cz3d in 1 m bins up to 60 m.

Usage:
  python analysis/plot_gt_distribution.py --data data/kitti_split1 \
      [--config kitti_3d_warmup] [--splits training validation] \
      [--out-dir images]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def split_depths(root, split, cfg):
    """Depths (cz3d, m) of all non-ignored, non-removed GTs in a split."""
    from groomed_nms_tpu.data.imdb import build_imdb, determine_ignores

    depths = []
    for rec in build_imdb(root, split=split, use_3d_for_2d=cfg.use_3d_for_2d):
        gts = rec.gts
        if not gts or len(gts.get("cls", [])) == 0:
            continue
        # the reference histograms the imdb, whose 2D boxes are already at
        # test_scale (lib/imdb_util.py scales at load); reproduce by scaling
        # the height gate comparison instead of the boxes
        scale = cfg.test_scale / rec.im_h
        # no max_gt_h gate: the reference plot (and this repo's training
        # filter) leave it at its huge default
        igns, rmvs = determine_ignores(gts, list(cfg.lbls), list(cfg.ilbls),
                                       cfg.min_gt_vis, cfg.min_gt_h,
                                       scale_factor=scale)
        keep = ~(igns | rmvs)
        # bbox_3d col 9 = cz3d (camera depth), reference layout
        depths.extend(gts["bbox_3d"][keep, 9].tolist())
    return np.asarray(depths)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="dataset root containing <split>/{image_2,label_2}")
    ap.add_argument("--config", default="kitti_3d_warmup")
    ap.add_argument("--splits", nargs="+",
                    default=["training", "validation"])
    ap.add_argument("--z-max", type=float, default=60.0)
    ap.add_argument("--bins", type=int, default=60)
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args()

    from groomed_nms_tpu.config import load_config
    cfg = load_config(args.config)

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    os.makedirs(args.out_dir, exist_ok=True)
    bins = np.linspace(0, args.z_max, args.bins + 1)
    for split in args.splits:
        d = split_depths(args.data, split, cfg)
        if d.size == 0:
            print(f"{split}: no ground truths found, skipping")
            continue
        fig, ax = plt.subplots(figsize=(8, 6), dpi=150)
        n, _, _ = ax.hist(d, bins, facecolor="dodgerblue", alpha=0.75)
        ax.set_xlabel("Distance (in m)")
        ax.set_ylabel("Histogram")
        ax.set_xlim(0, args.z_max)
        ax.set_ylim(0, max(np.ceil(n.max() / 100) * 100, 1.0))
        ax.grid(True)
        out = os.path.join(args.out_dir, f"gt_depth_{split}.png")
        fig.tight_layout()
        fig.savefig(out)
        plt.close(fig)
        print(f"{split}: {d.size} GTs, median depth {np.median(d):.1f} m "
              f"-> {out}")


if __name__ == "__main__":
    main()
