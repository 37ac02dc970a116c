"""Exact IoU3D oracle vs the differentiable approximation + known cases."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.ops.geometry import get_corners_of_cuboid
from groomed_nms_tpu.ops.iou import iou3d_approximate
from groomed_nms_tpu.ops.iou3d_exact import (bev_footprint, iou3d_exact,
                                             iou_bev_exact)


def test_identical_boxes():
    box = (1.0, 1.5, 20.0, 1.6, 1.5, 3.9, 0.3)
    assert iou3d_exact(box, box) == pytest.approx(1.0, abs=1e-9)
    assert iou_bev_exact((1.0, 20.0, 1.6, 3.9, 0.3),
                         (1.0, 20.0, 1.6, 3.9, 0.3)) == pytest.approx(1.0)


def test_disjoint_boxes():
    a = (0.0, 1.5, 20.0, 1.6, 1.5, 3.9, 0.0)
    b = (50.0, 1.5, 20.0, 1.6, 1.5, 3.9, 0.0)
    assert iou3d_exact(a, b) == 0.0


def test_axis_aligned_half_overlap():
    # two unit cubes offset by half along x: inter 0.5, union 1.5
    a = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0)
    b = (0.5, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0)
    assert iou3d_exact(a, b) == pytest.approx(0.5 / 1.5, abs=1e-9)


def test_rotated_square_45deg():
    # unit square vs itself rotated 45deg about same center:
    # intersection is a regular octagon with area 2*(sqrt(2)-1)
    a = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0)
    b = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0, math.pi / 4)
    inter = 2 * (math.sqrt(2) - 1)
    want = inter / (2 - inter)
    assert iou3d_exact(a, b) == pytest.approx(want, abs=1e-9)


def test_approximate_upper_bounds_exact_for_rotated():
    """The AABB approximation over-estimates footprints, so approximate
    IoU3D and exact IoU3D agree for axis-aligned boxes and diverge for
    rotated ones in a bounded way."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        x, z = rng.uniform(-5, 5, 2)
        box_a = (x, 1.5, 20.0 + z, 1.6, 1.5, 3.9, 0.0)
        box_b = (x + rng.uniform(-1, 1), 1.5, 20.0 + z + rng.uniform(-1, 1),
                 1.6, 1.5, 3.9, 0.0)
        exact = iou3d_exact(box_a, box_b)
        ca = get_corners_of_cuboid(*[jnp.asarray([v]) for v in box_a])
        cb = get_corners_of_cuboid(*[jnp.asarray([v]) for v in box_b])
        _, approx = iou3d_approximate(ca, cb, pairwise=False)
        # axis-aligned: identical up to float error
        np.testing.assert_allclose(float(approx[0]), exact, atol=1e-5)


def test_footprint_is_ccw():
    pts = bev_footprint(0.0, 10.0, 1.6, 3.9, 0.7)
    x, z = pts[:, 0], pts[:, 1]
    area2 = np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1))
    assert area2 > 0
