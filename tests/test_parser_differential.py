"""Differential tests vs the reference's KITTI file parsers
(lib/imdb_util.py:613-884): read_kitti_cal, read_kitti_poses, and
read_kitti_label on identical generated files.

The parsers are the last AP-critical behavioral surface that was only
unit-tested: every downstream target (2D-from-3D regeneration, the 16-col
bbox_3d contract, alpha recomputation + decomposition, visibility
encoding, the behind-camera ign flag) originates here, so field-for-field
parity against the reference code pins the whole data contract.

Skipped wholesale when torch or the reference checkout is absent.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_differential import _install_stubs  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    import matplotlib
    matplotlib.use("Agg")
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import lib.imdb_util as imdb_util
    return types.SimpleNamespace(imdb_util=imdb_util)


def _write_calib(path, p2, scientific):
    fmt = (lambda v: f"{v:.12e}") if scientific else (lambda v: f"{v:.6f}")
    lines = []
    for name in ("P0", "P1"):
        lines.append(name + ": " + " ".join(fmt(v) for v in np.zeros(12)))
    lines.append("P2: " + " ".join(fmt(v) for v in p2[:3].reshape(-1)))
    lines.append("P3: " + " ".join(fmt(v) for v in np.ones(12)))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_kitti_cal_matches_reference(ref, tmp_path):
    from groomed_nms_tpu.data.kitti import read_kitti_calib
    rng = np.random.default_rng(0)
    for i, scientific in enumerate([True, False] * 3):
        p2 = np.eye(4)
        p2[0, 0] = p2[1, 1] = rng.uniform(600, 800)
        p2[0, 2], p2[1, 2] = rng.uniform(580, 660), rng.uniform(170, 200)
        p2[:3, 3] = rng.normal(0, 10, 3)
        path = str(tmp_path / f"cal{i}.txt")
        _write_calib(path, p2, scientific)
        want = ref.imdb_util.read_kitti_cal(path)
        got = read_kitti_calib(path)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_read_kitti_poses_matches_reference(ref, tmp_path):
    from groomed_nms_tpu.data.kitti import read_kitti_poses
    rng = np.random.default_rng(1)
    for i, scientific in enumerate([True, False]):
        fmt = (lambda v: f"{v:.9e}") if scientific else (lambda v: f"{v:.6f}")
        mats = rng.normal(0, 2, (5, 3, 4))
        path = str(tmp_path / f"poses{i}.txt")
        with open(path, "w") as f:
            for m in mats:
                f.write(" ".join(fmt(v) for v in m.reshape(-1)) + "\n")
        want = ref.imdb_util.read_kitti_poses(path)
        got = read_kitti_poses(path)
        assert len(got) == len(want) == 5
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=0, atol=0)


def _random_label_rows(rng, n):
    """Realistic KITTI label rows incl. DontCare, occ states, a track id."""
    classes = ["Car", "Van", "Truck", "Pedestrian", "Cyclist", "DontCare",
               "Misc", "Person_sitting"]
    rows = []
    for _ in range(n):
        cls = classes[rng.integers(0, len(classes))]
        trunc = float(rng.uniform(0, 1))
        occ = int(rng.integers(-1, 4))
        alpha = float(rng.uniform(-np.pi + 0.01, np.pi - 0.01))
        x1, y1 = rng.uniform(0, 1100), rng.uniform(100, 300)
        x2, y2 = x1 + rng.uniform(20, 140), y1 + rng.uniform(15, 80)
        if cls == "DontCare":
            h, w, l = -1.0, -1.0, -1.0
            cx, cy, cz, ry = -1000.0, -1000.0, -1000.0, -10.0
        else:
            h, w, l = rng.uniform(1.2, 2.2), rng.uniform(0.5, 2.0), \
                rng.uniform(1.0, 5.0)
            cx, cy = rng.uniform(-15, 15), rng.uniform(0.5, 2.5)
            cz = rng.uniform(4, 50)
            ry = float(rng.uniform(-np.pi + 0.01, np.pi - 0.01))
        rows.append(
            f"{cls} {trunc:.2f} {occ} {alpha:.2f} {x1:.2f} {y1:.2f} "
            f"{x2:.2f} {y2:.2f} {h:.2f} {w:.2f} {l:.2f} {cx:.2f} {cy:.2f} "
            f"{cz:.2f} {ry:.2f}")
    return rows


@pytest.mark.parametrize("use_3d_for_2d", [False, True])
def test_read_kitti_label_matches_reference(ref, tmp_path, use_3d_for_2d):
    from groomed_nms_tpu.data.kitti import read_kitti_label
    rng = np.random.default_rng(2)
    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = 707.0493
    p2[0, 2], p2[1, 2] = 604.08, 180.51
    p2[0, 3], p2[2, 3] = 45.75, 0.0027

    for case in range(10):
        rows = _random_label_rows(rng, int(rng.integers(3, 14)))
        if case == 0:   # behind-camera object exercises the ign flag
            rows.append("Car 0.00 0 0.50 100.00 150.00 200.00 220.00 "
                        "1.50 1.60 3.90 2.00 1.50 -8.00 0.30")
        path = str(tmp_path / f"label{use_3d_for_2d}_{case}.txt")
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")

        want = ref.imdb_util.read_kitti_label(path, p2, use_3d_for_2d)
        got = read_kitti_label(path, p2, use_3d_for_2d=use_3d_for_2d)

        assert len(want) == len(got["cls"]), "row acceptance must agree"
        for i, obj in enumerate(want):
            assert got["cls"][i] == obj.cls
            assert np.isclose(got["trunc"][i], obj.trunc)
            assert (got["occ"][i] > 0) == obj.occ
            assert bool(got["ign"][i]) == bool(obj.ign)
            assert np.isclose(got["visibility"][i], obj.visibility)
            np.testing.assert_allclose(got["alpha"][i], obj.alpha,
                                       atol=1e-10)
            np.testing.assert_allclose(got["rotY"][i], obj.rotY, atol=1e-10)
            np.testing.assert_allclose(got["bbox_full"][i], obj.bbox_full,
                                       rtol=1e-9, atol=1e-7)
            np.testing.assert_allclose(got["bbox_3d"][i],
                                       np.asarray(obj.bbox_3d, np.float64),
                                       rtol=1e-9, atol=1e-7)
            np.testing.assert_allclose(got["center_3d"][i], obj.center_3d,
                                       rtol=0, atol=0)


def test_read_kitti_label_track_field_matches_reference(ref, tmp_path):
    """Tracking labels carry a 16th integer field (the track id)."""
    from groomed_nms_tpu.data.kitti import read_kitti_label
    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = 707.0
    rows = ["Car 0.00 0 0.50 100.00 150.00 200.00 220.00 "
            "1.50 1.60 3.90 2.00 1.50 18.00 0.30 7",
            "Car 0.10 1 -0.40 300.00 160.00 390.00 230.00 "
            "1.40 1.70 4.10 -3.00 1.60 25.00 -1.10 12"]
    path = str(tmp_path / "track_label.txt")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    want = ref.imdb_util.read_kitti_label(path, p2, False)
    got = read_kitti_label(path, p2)
    assert [o.track for o in want] == got["track"].tolist() == [7, 12]
