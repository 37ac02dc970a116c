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


def _link(src, dst):
    """Symlink src -> dst, replacing a stale/dangling link; returns whether
    the source existed (lexists, not exists: a dangling dst from a moved
    KITTI tree must be repaired, not crash os.symlink)."""
    if not os.path.exists(src):
        return False
    if os.path.lexists(dst):
        if os.path.islink(dst) and \
                os.readlink(dst) == os.path.abspath(src):
            return True
        os.remove(dst)
    os.symlink(os.path.abspath(src), dst)
    return True


def link_split(kitti_train, split_dir, ids, split_name):
    out = os.path.join(split_dir, split_name)
    for sub in ("image_2", "calib", "label_2", "prev_2"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    missing = 0
    for iid in ids:
        for sub, ext in (("image_2", ".png"), ("calib", ".txt"),
                         ("label_2", ".txt")):
            src = os.path.join(kitti_train, sub, iid + ext)
            if not _link(src, os.path.join(out, sub, iid + ext)):
                missing += 1
        # optional multi-frame context (prev_2/<id>_{01..03}.png) -- not
        # counted as missing: raw KITTI object has no prev_2
        for k in range(1, 4):
            src = os.path.join(kitti_train, "prev_2", f"{iid}_{k:02d}.png")
            _link(src, os.path.join(out, "prev_2", f"{iid}_{k:02d}.png"))
    print(f"{split_name}: {len(ids)} ids linked under {out}"
          + (f" ({missing} MISSING source files)" if missing else ""))
    if missing == 3 * len(ids) and ids:
        raise SystemExit(
            f"no source files found under {kitti_train} -- wrong --kitti?")


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
