"""Data layer: KITTI parsing, alpha decomposition, mirror rewrite, batching."""

import math
import os

import numpy as np
import pytest

from groomed_nms_tpu.data import (decompose_alpha, mirror_labels,
                                  pad_gt_batch, read_kitti_calib,
                                  read_kitti_label)
from groomed_nms_tpu.data.imdb import determine_ignores
from groomed_nms_tpu.data.kitti import rot_y_to_alpha


CAL_TEXT = """P0: 707.0 0.0 604.0 0.0 0.0 707.0 180.0 0.0 0.0 0.0 1.0 0.0
P2: 707.0493 0.0 604.0814 45.75831 0.0 707.0493 180.5066 -0.3454157 0.0 0.0 1.0 0.004981016
"""

LABEL_TEXT = (
    "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
    "-0.65 1.71 46.70 -1.59\n"
    "Van 0.00 2 -1.65 538.45 175.01 560.21 196.26 2.10 1.93 6.06 "
    "-5.31 1.74 53.23 -1.75\n"
    "DontCare -1 -1 -10 582.97 176.07 594.78 186.48 -1 -1 -1 -1000 -1000 -1000 -10\n"
)


@pytest.fixture
def kitti_files(tmp_path):
    cal = tmp_path / "000000_cal.txt"
    cal.write_text(CAL_TEXT)
    lbl = tmp_path / "000000.txt"
    lbl.write_text(LABEL_TEXT)
    return str(cal), str(lbl)


def test_read_calib(kitti_files):
    cal, _ = kitti_files
    p2 = read_kitti_calib(cal)
    assert p2.shape == (4, 4)
    np.testing.assert_allclose(p2[0, 0], 707.0493)
    np.testing.assert_allclose(p2[2, 3], 0.004981016)
    np.testing.assert_allclose(p2[3], [0, 0, 0, 1])


def test_read_label(kitti_files):
    cal, lbl = kitti_files
    p2 = read_kitti_calib(cal)
    gts = read_kitti_label(lbl, p2)
    assert list(gts["cls"]) == ["Car", "Van", "DontCare"]
    b3 = gts["bbox_3d"][0]
    # cy3d recentered by -h/2 (imdb convention)
    np.testing.assert_allclose(b3[8], 1.71 - 1.65 / 2, atol=1e-6)
    # alpha recomputed from rotY and position
    want_alpha = rot_y_to_alpha(-1.59, 46.70, -0.65)
    np.testing.assert_allclose(b3[6], want_alpha, atol=1e-6)
    # projected center consistent with P2
    proj = p2 @ np.array([-0.65, 1.71 - 1.65 / 2, 46.70, 1.0])
    np.testing.assert_allclose(b3[0], proj[0] / proj[2], atol=1e-6)
    # xywh box with inclusive width
    np.testing.assert_allclose(gts["bbox_full"][0, 2],
                               614.12 - 587.01 + 1, atol=1e-6)
    # visibility from occlusion code: 0 -> 1.0, 2 -> 0.33
    np.testing.assert_allclose(gts["visibility"][:2], [1.0, 0.33])


def test_use_3d_for_2d_regenerates_box(kitti_files):
    cal, lbl = kitti_files
    p2 = read_kitti_calib(cal)
    plain = read_kitti_label(lbl, p2, use_3d_for_2d=False)
    regen = read_kitti_label(lbl, p2, use_3d_for_2d=True)
    # the regenerated box differs from the labeled one but stays nearby
    d = np.abs(plain["bbox_full"][0] - regen["bbox_full"][0])
    assert d.max() > 0.01
    assert d.max() < 30


@pytest.mark.parametrize("alpha", np.linspace(-3.1, 3.1, 13))
def test_decompose_alpha_reconstructs(alpha):
    a_sin, a_cos, axis_lbl, head_lbl = decompose_alpha(float(alpha))
    branch = a_sin if axis_lbl == 1 else a_cos
    rec = branch + (math.pi if head_lbl == 1 else 0.0)
    rec = math.remainder(rec - alpha, 2 * math.pi)
    assert abs(rec) < 1e-9
    assert -math.pi / 2 < a_sin <= math.pi / 2
    assert -math.pi < a_cos <= 0


def test_mirror_involution(kitti_files):
    """Mirroring twice restores rotY, alpha, and the 3D center."""
    cal, lbl = kitti_files
    p2 = read_kitti_calib(cal)
    gts = read_kitti_label(lbl, p2)
    p2_inv = np.linalg.inv(p2)
    width = 1242
    once = mirror_labels(gts, p2_inv, width)
    twice = mirror_labels(once, p2_inv, width)
    np.testing.assert_allclose(twice["bbox_3d"][:, 10], gts["bbox_3d"][:, 10],
                               atol=1e-6)  # rotY
    np.testing.assert_allclose(twice["bbox_3d"][:, 6], gts["bbox_3d"][:, 6],
                               atol=1e-4)  # alpha
    np.testing.assert_allclose(twice["bbox_full"], gts["bbox_full"],
                               atol=1e-6)
    # single mirror flips the x center sign-ish (reflected through cx axis)
    assert not np.allclose(once["bbox_3d"][0, 7], gts["bbox_3d"][0, 7])


def test_determine_ignores(kitti_files):
    cal, lbl = kitti_files
    p2 = read_kitti_calib(cal)
    gts = read_kitti_label(lbl, p2)
    igns, rmvs = determine_ignores(gts, ["Car"], ["Van"], min_gt_vis=0.65,
                                   min_gt_h=20)
    # Car valid; Van is an ignore class; DontCare removed (its ign flag is
    # also True via the visibility gate, but rmv wins downstream)
    assert list(rmvs) == [False, False, True]
    assert list(igns[:2]) == [False, True]


def test_pad_gt_batch(kitti_files):
    cal, lbl = kitti_files
    p2 = read_kitti_calib(cal)
    gts = read_kitti_label(lbl, p2)
    batch = pad_gt_batch([gts, {}], [p2, p2], [1.0, 1.0], ["Car"], ["Van"],
                         0.65, 20, max_gts=8, max_igns=4)
    assert batch.gts_2d.shape == (2, 8, 4)
    assert batch.gt_valid[0].sum() == 1      # the Car
    assert batch.ign_valid[0].sum() == 1     # the Van
    assert batch.gt_valid[1].sum() == 0      # empty image
    assert batch.gt_labels[0, 0] == 1.0
    # corners convention: x2 = x + w - 1
    np.testing.assert_allclose(
        batch.gts_2d[0, 0, 2],
        gts["bbox_full"][0, 0] + gts["bbox_full"][0, 2] - 1, rtol=1e-6)
