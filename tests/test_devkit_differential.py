"""Differential test: eval/kitti_eval.cpp vs the official KITTI devkit.

Compiles the reference repo's devkit evaluator sources
(/root/reference/data/kitti_split1/devkit/cpp/evaluate_object.cpp and the
evaluate_object_30m_0_5.cpp distance variant) against the boost shim in
eval/devkit_shim/, runs both them and this repo's single parameterized
binary on the same synthetic GT/detection txt trees, and asserts the
3x41 interpolated precision rows match to 1e-6 per class/metric/difficulty.

This is the strongest AP-parity evidence obtainable without KITTI images: it
certifies the rebuilt protocol (thresholds, cleanData gates, three-branch
matching, DontCare handling, AOS, the distance gate) decision-for-decision
against the binary the reference's published numbers came from.
"""

import math
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REF_CPP = Path("/root/reference/data/kitti_split1/devkit/cpp")
SHIM = REPO / "eval" / "devkit_shim"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not REF_CPP.exists(),
    reason="needs g++ and the reference devkit sources",
)

CLASSES = ["Car", "Van", "Truck", "Pedestrian", "Person_sitting", "Cyclist",
           "Tram", "Misc"]


@pytest.fixture(scope="module")
def binaries(tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    builds = {
        "ref": REF_CPP / "evaluate_object.cpp",
        "ref_30m_0_5": REF_CPP / "evaluate_object_30m_0_5.cpp",
    }
    out = {}
    for name, src in builds.items():
        exe = d / name
        subprocess.run(
            ["g++", "-O2", "-w", "-std=c++11", "-include", "cstring",
             f"-I{SHIM}", "-o", str(exe), str(src)],
            check=True, capture_output=True)
        out[name] = exe
    exe = d / "kitti_eval"
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-o", str(exe),
         str(REPO / "eval" / "kitti_eval.cpp")],
        check=True, capture_output=True)
    out["ours"] = exe
    return out


def _gt_rows(rng, max_dist_regime=False):
    """Random KITTI label rows spanning the protocol's edge cases."""
    rows = []
    boxes = []
    for _ in range(rng.integers(0, 7)):
        cls = CLASSES[rng.integers(0, len(CLASSES))]
        # heights straddle the 25/40-px difficulty gates
        h2d = float(rng.uniform(15, 120))
        x1 = float(rng.uniform(0, 1100))
        y1 = float(rng.uniform(0, 250))
        x2 = x1 + float(rng.uniform(10, 200))
        y2 = y1 + h2d
        trunc = float(rng.uniform(0, 0.6))
        occ = int(rng.integers(0, 4))
        h, w, l = (float(rng.uniform(1.3, 2.2)), float(rng.uniform(0.5, 2.0)),
                   float(rng.uniform(0.8, 4.5)))
        t1 = float(rng.uniform(-20, 20))
        t2 = float(rng.uniform(0.5, 2.5))
        # depths straddle the 30 m distance gate of the variant binary
        t3 = float(rng.uniform(2, 60)) if max_dist_regime else \
            float(rng.uniform(2, 50))
        ry = float(rng.uniform(-math.pi, math.pi))
        alpha = float(rng.uniform(-math.pi, math.pi))
        rows.append(f"{cls} {trunc:.2f} {occ} {alpha:.2f} "
                    f"{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                    f"{h:.2f} {w:.2f} {l:.2f} {t1:.2f} {t2:.2f} {t3:.2f} "
                    f"{ry:.2f}")
        boxes.append((cls, x1, y1, x2, y2, h, w, l, t1, t2, t3, ry, alpha))
    # a DontCare region absorbing stray detections
    if rng.random() < 0.5:
        x1 = float(rng.uniform(0, 1000))
        y1 = float(rng.uniform(0, 300))
        rows.append(f"DontCare -1 -1 -10 {x1:.2f} {y1:.2f} "
                    f"{x1 + rng.uniform(30, 300):.2f} "
                    f"{y1 + rng.uniform(20, 80):.2f} "
                    f"-1 -1 -1 -1000 -1000 -1000 -10")
    return rows, boxes


def _det_rows(rng, boxes):
    """Detections: jittered copies of GT + random false positives."""
    rows = []
    for (cls, x1, y1, x2, y2, h, w, l, t1, t2, t3, ry, alpha) in boxes:
        if rng.random() < 0.25:
            continue  # missed detection -> FN
        # most detections are tight (exercises the 3D/BEV TP branches, where
        # IoU>0.5 needs centimetre-level agreement), the rest loose
        tight = 0.04 if rng.random() < 0.7 else 1.0
        j = lambda s: float(rng.normal(0, s * tight))
        score = float(rng.uniform(0.01, 0.99))
        if rng.random() < 0.15:
            cls = CLASSES[rng.integers(0, len(CLASSES))]  # class confusion
        rows.append(
            f"{cls} -1 -1 {alpha + j(0.2):.2f} "
            f"{x1 + j(4):.2f} {y1 + j(4):.2f} {x2 + j(4):.2f} "
            f"{y2 + j(4):.2f} {h + j(0.1):.2f} {w + j(0.1):.2f} "
            f"{l + j(0.2):.2f} {t1 + j(0.4):.2f} {t2 + j(0.2):.2f} "
            f"{t3 + j(1.0):.2f} {ry + j(0.1):.2f} {score:.6f}")
    for _ in range(rng.integers(0, 4)):  # pure false positives
        cls = CLASSES[rng.integers(0, len(CLASSES))]
        x1 = float(rng.uniform(0, 1100))
        y1 = float(rng.uniform(0, 250))
        rows.append(
            f"{cls} -1 -1 {rng.uniform(-math.pi, math.pi):.2f} "
            f"{x1:.2f} {y1:.2f} {x1 + rng.uniform(10, 200):.2f} "
            f"{y1 + rng.uniform(15, 120):.2f} {rng.uniform(1.3, 2.2):.2f} "
            f"{rng.uniform(0.5, 2.0):.2f} {rng.uniform(0.8, 4.5):.2f} "
            f"{rng.uniform(-20, 20):.2f} {rng.uniform(0.5, 2.5):.2f} "
            f"{rng.uniform(2, 60):.2f} {rng.uniform(-math.pi, math.pi):.2f} "
            f"{rng.uniform(0.01, 0.99):.6f}")
    return rows


def _make_dataset(root, n_images, seed, n_total=None, max_dist_regime=False):
    """Write gt/ and res/data/ txt trees; images beyond n_images are empty."""
    rng = np.random.default_rng(seed)
    gt_dir = root / "gt"
    data_dir = root / "res" / "data"
    gt_dir.mkdir(parents=True)
    data_dir.mkdir(parents=True)
    for i in range(n_total or n_images):
        name = f"{i:06d}.txt"
        if i < n_images:
            gt_rows, boxes = _gt_rows(rng, max_dist_regime)
            det_rows = _det_rows(rng, boxes)
        else:
            gt_rows, det_rows = [], []
        (gt_dir / name).write_text("\n".join(gt_rows) + "\n" if gt_rows
                                   else "")
        (data_dir / name).write_text("\n".join(det_rows) + "\n" if det_rows
                                     else "")
    return gt_dir, root / "res"


def _read_stats(path):
    rows = [[float(x) for x in line.split()]
            for line in path.read_text().splitlines() if line.strip()]
    return np.array(rows)


def _compare_stats_dirs(ref_dir, our_dir):
    ref_files = sorted(p.name for p in ref_dir.glob("stats_*.txt"))
    our_files = sorted(p.name for p in our_dir.glob("stats_*.txt"))
    assert ref_files == our_files and ref_files, (ref_files, our_files)
    for name in ref_files:
        a = _read_stats(ref_dir / name)
        b = _read_stats(our_dir / name)
        assert a.shape == b.shape, (name, a.shape, b.shape)
        assert np.allclose(a, b, atol=1e-6, equal_nan=True), (
            name, np.nanmax(np.abs(a - b)))


def _run_ours(binaries, res_dir, gt_dir, extra):
    subprocess.run([str(binaries["ours"]), str(res_dir), str(gt_dir)] + extra,
                   check=True, capture_output=True)


def test_differential_base_protocol(binaries, tmp_path):
    """Base devkit (0.7/0.5/0.5 overlap, no distance gate) == kitti_eval."""
    gt_dir, res_dir = _make_dataset(tmp_path, n_images=150, seed=0)
    ours_res = tmp_path / "ours_res"
    shutil.copytree(res_dir, ours_res)

    subprocess.run([str(binaries["ref"]), str(res_dir), str(gt_dir)],
                   check=True, capture_output=True, cwd=tmp_path)
    _run_ours(binaries, ours_res, gt_dir, ["--overlap", "0.7", "0.5", "0.5"])
    _compare_stats_dirs(res_dir, ours_res)


def test_differential_distance_variant(binaries, tmp_path):
    """evaluate_object_30m_0_5 == kitti_eval --overlap 0.5.. --max_dist 30.

    The variant binary hardcodes 3769 images named %06d.txt, a gt dir of
    data/kitti_split1/validation/label_2 relative to CWD, and results under
    results/<sha>; reproduce that layout in a scratch CWD.
    """
    n_real = 120
    work = tmp_path / "work"
    gt_dir, res_dir = _make_dataset(work, n_images=n_real, seed=1,
                                    n_total=3769, max_dist_regime=True)
    fixed_gt = work / "data" / "kitti_split1" / "validation" / "label_2"
    fixed_gt.parent.mkdir(parents=True)
    shutil.move(str(gt_dir), str(fixed_gt))
    fixed_res = work / "results" / "run0"
    fixed_res.parent.mkdir(parents=True)
    shutil.move(str(res_dir), str(fixed_res))
    ours_res = tmp_path / "ours_res"
    shutil.copytree(fixed_res, ours_res)

    subprocess.run([str(binaries["ref_30m_0_5"]), "results/run0"],
                   check=True, capture_output=True, cwd=work)
    _run_ours(binaries, ours_res, fixed_gt,
              ["--overlap", "0.5", "0.5", "0.5", "--max_dist", "30"])
    _compare_stats_dirs(fixed_res, ours_res)


def test_differential_no_aos_when_alpha_missing(binaries, tmp_path):
    """A single alpha==-10 detection row disables AOS in both evaluators."""
    gt_dir, res_dir = _make_dataset(tmp_path, n_images=40, seed=2)
    # corrupt one detection's alpha to the devkit's "not provided" sentinel
    target = res_dir / "data" / "000000.txt"
    rows = [r for r in target.read_text().splitlines() if r.strip()]
    parts = (rows[0].split() if rows else
             "Car -1 -1 0.0 10 10 60 60 1.5 1.6 3.9 1 1 20 0.1 0.9".split())
    parts[3] = "-10"
    rows = [" ".join(parts)] + rows[1:]
    target.write_text("\n".join(rows) + "\n")
    ours_res = tmp_path / "ours_res"
    shutil.copytree(res_dir, ours_res)

    subprocess.run([str(binaries["ref"]), str(res_dir), str(gt_dir)],
                   check=True, capture_output=True, cwd=tmp_path)
    _run_ours(binaries, ours_res, gt_dir, ["--overlap", "0.7", "0.5", "0.5"])
    assert not list(res_dir.glob("stats_*_orientation.txt"))
    _compare_stats_dirs(res_dir, ours_res)
