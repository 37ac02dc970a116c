"""Write per-image KITTI calibration files for a raw video-demo folder.

Capability match for the reference's plot/write_calibration_matrices.py:
compose P2 = P_rect_02 @ R_rect_00 from the KITTI raw-sequence calibration,
then write one ``calib/<id>.txt`` (the "P2: ..." line the imdb reader
expects) and one ``p2/<id>.npy`` per image so tracking_video.py can run on
raw KITTI sequences.

Usage:
  python analysis/write_calibration_matrices.py \
      --input data/kitti_split1/video_demo \
      [--r-rect 9 floats] [--p-rect 12 floats]
"""

import argparse
import glob
import os

import numpy as np

# defaults = the reference's KITTI raw drive calibration
# (plot/write_calibration_matrices.py:11-12)
R_RECT_00 = [9.999454e-01, 7.259129e-03, -7.519551e-03,
             -7.292213e-03, 9.999638e-01, -4.381729e-03,
             7.487471e-03, 4.436324e-03, 9.999621e-01]
P_RECT_02 = [7.188560e+02, 0.000000e+00, 6.071928e+02, 4.538225e+01,
             0.000000e+00, 7.188560e+02, 1.852157e+02, -1.130887e-01,
             0.000000e+00, 0.000000e+00, 1.000000e+00, 3.779761e-03]


def compose_p2(r_rect_9, p_rect_12):
    """4x4 P = P_rect @ R_rect (homogeneous)."""
    r = np.zeros((4, 4))
    r[3, 3] = 1.0
    r[:3, :3] = np.asarray(r_rect_9, float).reshape(3, 3)
    p = np.zeros((4, 4))
    p[3, 3] = 1.0
    p[:3] = np.asarray(p_rect_12, float).reshape(3, 4)
    return p @ r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="data/kitti_split1/video_demo")
    ap.add_argument("--r-rect", nargs=9, type=float, default=R_RECT_00)
    ap.add_argument("--p-rect", nargs=12, type=float, default=P_RECT_02)
    ap.add_argument("--im-ext", default=".png")
    args = ap.parse_args()

    image_dir = os.path.join(args.input, "image_2")
    calib_dir = os.path.join(args.input, "calib")
    p2_dir = os.path.join(args.input, "p2")
    os.makedirs(calib_dir, exist_ok=True)
    os.makedirs(p2_dir, exist_ok=True)

    p = compose_p2(args.r_rect, args.p_rect)
    line = "P2: " + " ".join(f"{v:.12e}" for v in p[:3].flatten())
    print(line)

    images = sorted(glob.glob(os.path.join(image_dir, "*" + args.im_ext)))
    if not images:
        raise SystemExit(f"no {args.im_ext} images under {image_dir}")
    for i, path in enumerate(images):
        # strip ONLY the trailing extension (str.replace would eat every
        # occurrence, corrupting names like 0000000012.png.png)
        base = os.path.basename(path)
        if base.endswith(args.im_ext):
            base = base[:-len(args.im_ext)]
        with open(os.path.join(calib_dir, base + ".txt"), "w") as f:
            f.write(line + "\n")
        np.save(os.path.join(p2_dir, base + ".npy"), p)
        if i % 250 == 0 or i == len(images) - 1:
            print(f"{i + 1}/{len(images)} images done")


if __name__ == "__main__":
    main()
