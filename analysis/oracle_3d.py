"""AP3D error attribution: which 3D factor caps the score?

For each detection, find its best 2D-IoU ground-truth match and substitute
selected 3D fields from the GT, then re-run the C++ evaluator on the
modified txts.  The gap between the baseline AP3D and each oracle's AP3D
attributes the loss to that factor (depth, full center, rotation, dims).

Capability match for the reference's error-analysis workflow (the plots in
/root/reference/plot/ study AP sensitivity by re-scoring saved results);
this script answers the question VERDICT r4 posed for the synthetic world:
*why* is AP3D@0.7 near zero when 2D AP is ~70 -- and what would fixing each
3D factor buy.

Modes (cumulative substitution of matched-GT values):
  zscale : perfect depth -- z := z_gt and x, y rescaled by z_gt/z (keeps
           the predicted image-plane ray, models an oracle depth estimator)
  center : x, y, z := GT (perfect 3D center)
  ry     : yaw := GT
  dims   : h, w, l := GT
  all    : center + ry + dims (ceiling given the 2D detections)

Usage:
  python analysis/oracle_3d.py --results output/<run>/results/results_N/data \
      --gt data/kitti_split1/validation/label_2 [--score 0.1] [--iou 0.3]
"""

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from groomed_nms_tpu.eval.kitti_eval import run_kitti_eval


def _read(path, ncols):
    rows = []
    if os.path.exists(path):
        for line in open(path):
            v = line.split()
            if len(v) >= ncols:
                rows.append((v[0].lower(), np.array([float(x) for x in
                                                     v[1:ncols]])))
    return rows


def _iou2d(a, b):
    # a: [4], b: [M,4] as x1 y1 x2 y2
    ix = np.maximum(0, np.minimum(a[2], b[:, 2]) - np.maximum(a[0], b[:, 0]))
    iy = np.maximum(0, np.minimum(a[3], b[:, 3]) - np.maximum(a[1], b[:, 1]))
    inter = ix * iy
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) - inter)
    return inter / np.maximum(ua, 1e-9)


# field offsets within the 15 numeric columns after the class token
_BOX2D = slice(3, 7)     # x1 y1 x2 y2
_DIMS = slice(7, 10)     # h w l
_CENTER = slice(10, 13)  # x y z
_RY = 13
_SCORE = 14


def _substitute(det, gt, mode):
    out = det.copy()
    if mode == "zscale":
        z, zg = det[12], gt[12]
        if z > 1e-3:
            out[10:13] = det[10:13] * (zg / z)
        out[12] = zg
    elif mode == "center":
        out[_CENTER] = gt[_CENTER]
    elif mode == "ry":
        out[_RY] = gt[_RY]
    elif mode == "dims":
        out[_DIMS] = gt[_DIMS]
    elif mode == "all":
        out[_CENTER] = gt[_CENTER]
        out[_RY] = gt[_RY]
        out[_DIMS] = gt[_DIMS]
    elif mode == "rysign":
        # everything GT except the yaw SIGN flipped
        out[_CENTER] = gt[_CENTER]
        out[_DIMS] = gt[_DIMS]
        out[_RY] = -gt[_RY]
    elif mode == "rymirror":
        # everything GT except yaw replaced by its alpha-mirror
        # (ry' = 2*atan2(x,z) - ry, the footprint reflected about the line
        # of sight).  The synthetic renderer paints flat AABBs, and the
        # alpha-mirror pair's AABBs differ by only ~2.8 px median, so this
        # is the near-degenerate wrong answer an AABB-only estimator
        # cannot reliably reject -- its AP3D is the worst-case ceiling of
        # that ambiguity (always picking the wrong branch).
        out[_CENTER] = gt[_CENTER]
        out[_DIMS] = gt[_DIMS]
        x, z = gt[10], gt[12]
        out[_RY] = 2.0 * np.arctan2(x, z) - gt[_RY]
    else:
        raise ValueError(mode)
    return out


def _write_oracle(results_dir, gt_dir, out_dir, mode, min_iou):
    os.makedirs(out_dir, exist_ok=True)
    matched = total = 0
    for fn in sorted(os.listdir(results_dir)):
        if not fn.endswith(".txt"):
            continue
        dets = _read(os.path.join(results_dir, fn), 16)
        gts = _read(os.path.join(gt_dir, fn), 15)
        lines = []
        for cls, det in dets:
            total += 1
            cand = np.array([g[_BOX2D] for c, g in gts if c == cls])
            row = det
            if len(cand):
                ious = _iou2d(det[_BOX2D], cand)
                j = int(np.argmax(ious))
                if ious[j] >= min_iou:
                    gt = [g for c, g in gts if c == cls][j]
                    row = _substitute(det, gt, mode)
                    matched += 1
            vals = " ".join(f"{v:.6f}" for v in row)
            lines.append(f"{cls.capitalize()} {vals}")
        open(os.path.join(out_dir, fn), "w").write("\n".join(lines) + "\n")
    return matched, total


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="AP3D error attribution via GT-field substitution")
    ap.add_argument("--results", required=True,
                    help="results .../data dir of KITTI detection txts")
    ap.add_argument("--gt", required=True, help="label_2 dir")
    ap.add_argument("--iou", type=float, default=0.3,
                    help="min 2D IoU to accept a GT match")
    ap.add_argument("--modes", default="zscale,center,ry,dims,all")
    args = ap.parse_args(argv)

    def ap3d(results_dir):
        stats = run_kitti_eval(results_dir, os.path.abspath(args.gt),
                               overlaps=(0.7, 0.5, 0.5))
        g3 = stats.get(("car", "detection_3d"), [0, 0, 0])
        gb = stats.get(("car", "detection_ground"), [0, 0, 0])
        g2 = stats.get(("car", "detection"), [0, 0, 0])
        return g2, gb, g3

    rows = [("baseline", None)] + [(m, m) for m in args.modes.split(",")]
    print(f"{'oracle':>9} | {'AP2D mod':>8} | {'APBEV@0.7 mod':>13} |"
          f" {'AP3D@0.7 mod':>12} | match")
    tmp = tempfile.mkdtemp(prefix="oracle3d_")
    try:
        for name, mode in rows:
            # evaluate from a temp copy so the run dir's own stats files
            # are never clobbered (run_kitti_eval writes next to data/)
            run_dir = os.path.join(tmp, name)
            data_dir = os.path.join(run_dir, "data")
            if mode is None:
                shutil.copytree(os.path.abspath(args.results), data_dir)
                note = ""
            else:
                m, t = _write_oracle(os.path.abspath(args.results),
                                     os.path.abspath(args.gt), data_dir,
                                     mode, args.iou)
                note = f"{m}/{t}"
            g2, gb, g3 = ap3d(run_dir)
            print(f"{name:>9} | {g2[1]:8.2f} | {gb[1]:13.2f} |"
                  f" {g3[1]:12.2f} | {note}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
