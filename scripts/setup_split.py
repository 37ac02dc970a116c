"""Symlink KITTI images/calib/labels into training/validation splits.

Capability match for the reference's data/kitti_split{1,2}/setup_split.py:
reads ``train.txt`` / ``val.txt`` id lists and symlinks the raw KITTI
``training`` files into per-split directories.

Usage:
  python scripts/setup_split.py --kitti <path/to/kitti/object> \
      --split-dir data/kitti_split1
"""

import argparse
import os


def link_split(kitti_train, split_dir, ids, split_name):
    out = os.path.join(split_dir, split_name)
    for sub in ("image_2", "calib", "label_2", "prev_2"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    for iid in ids:
        for sub, ext in (("image_2", ".png"), ("calib", ".txt"),
                         ("label_2", ".txt")):
            src = os.path.join(kitti_train, sub, iid + ext)
            dst = os.path.join(out, sub, iid + ext)
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(os.path.abspath(src), dst)
        # optional multi-frame context (prev_2/<id>_{01..03}.png)
        for k in range(1, 4):
            src = os.path.join(kitti_train, "prev_2", f"{iid}_{k:02d}.png")
            dst = os.path.join(out, "prev_2", f"{iid}_{k:02d}.png")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(os.path.abspath(src), dst)
    print(f"{split_name}: {len(ids)} ids linked under {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti", required=True,
                    help="KITTI object dir containing training/")
    ap.add_argument("--split-dir", default="data/kitti_split1")
    args = ap.parse_args()

    kitti_train = os.path.join(args.kitti, "training")
    for name, list_file in (("training", "train.txt"),
                            ("validation", "val.txt")):
        path = os.path.join(args.split_dir, list_file)
        if not os.path.exists(path):
            print(f"missing {path}; skipping {name}")
            continue
        with open(path) as f:
            ids = [line.strip() for line in f if line.strip()]
        link_split(kitti_train, args.split_dir, ids, name)


if __name__ == "__main__":
    main()
