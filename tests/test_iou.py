"""IoU primitive parity tests (reference lib/core.py:178-575 semantics)."""

import numpy as np
import jax.numpy as jnp

from groomed_nms_tpu.ops.geometry import get_corners_of_cuboid
from groomed_nms_tpu.ops.iou import (
    aabb_volume,
    bev_boxes_from_corners,
    elementwise_iou,
    iou3d_approximate,
    pairwise_intersect,
    pairwise_iou,
    pairwise_iou_ign,
)


def _np_pairwise_iou(a, b, shift=0.0):
    m, n = a.shape[0], b.shape[0]
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + shift
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + shift
            inter = max(iw, 0) * max(ih, 0)
            area_a = (a[i, 2] - a[i, 0] + shift) * (a[i, 3] - a[i, 1] + shift)
            area_b = (b[j, 2] - b[j, 0] + shift) * (b[j, 3] - b[j, 1] + shift)
            out[i, j] = inter / (area_a + area_b - inter)
    return out


def test_pairwise_iou_vs_scalar_oracle(rng):
    a = rng.uniform(0, 50, (7, 4)).astype(np.float32)
    b = rng.uniform(0, 50, (5, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:]) + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) + 1
    for shift in (0.0, 1.0):
        got = np.asarray(pairwise_iou(a, b, shift=shift))
        np.testing.assert_allclose(got, _np_pairwise_iou(a, b, shift), rtol=1e-5)


def test_elementwise_matches_pairwise_diag(rng):
    a = rng.uniform(0, 50, (6, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:]) + 1
    pw = np.asarray(pairwise_iou(a, a))
    ew = np.asarray(elementwise_iou(a, a))
    np.testing.assert_allclose(ew, np.diag(pw), rtol=1e-6)


def test_iou_ign_normalises_by_area_a_only():
    a = np.array([[0, 0, 10, 10]], np.float32)   # area 100
    b = np.array([[0, 0, 5, 10]], np.float32)    # covers half of a
    got = np.asarray(pairwise_iou_ign(a, b))
    np.testing.assert_allclose(got, [[0.5]], atol=1e-6)


def test_identical_boxes_iou_one():
    a = np.array([[2, 3, 10, 12]], np.float32)
    np.testing.assert_allclose(pairwise_iou(a, a), [[1.0]], atol=1e-6)


def test_aabb_volume_axis_aligned():
    corners = get_corners_of_cuboid(
        jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]),
        jnp.array([2.0]), jnp.array([3.0]), jnp.array([4.0]), jnp.array([0.0]))
    np.testing.assert_allclose(aabb_volume(corners), [24.0], atol=1e-5)


def test_aabb_volume_rotated_is_overestimate():
    """The reference intentionally uses AABB volume -> rotation inflates it."""
    corners = get_corners_of_cuboid(
        jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]),
        jnp.array([2.0]), jnp.array([3.0]), jnp.array([4.0]),
        jnp.array([np.pi / 4]))
    assert float(aabb_volume(corners)[0]) > 24.0


def test_bev_boxes_from_corners():
    corners = get_corners_of_cuboid(
        jnp.array([1.0]), jnp.array([0.0]), jnp.array([10.0]),
        jnp.array([2.0]), jnp.array([1.5]), jnp.array([4.0]), jnp.array([0.0]))
    bev = np.asarray(bev_boxes_from_corners(corners))
    # box centered x=1 z=10, length 4 along x, width 2 along z
    np.testing.assert_allclose(bev, [[-1.0, 9.0, 3.0, 11.0]], atol=1e-5)


def test_iou3d_identical_boxes():
    corners = get_corners_of_cuboid(
        jnp.array([1.0, 5.0]), jnp.array([0.5, 0.5]), jnp.array([10.0, 20.0]),
        jnp.array([1.6, 1.7]), jnp.array([1.5, 1.4]), jnp.array([3.9, 4.1]),
        jnp.array([0.1, -0.2]))
    iou_bev, iou_3d = iou3d_approximate(corners, corners, pairwise=True)
    np.testing.assert_allclose(np.diag(np.asarray(iou_bev)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.diag(np.asarray(iou_3d)), 1.0, atol=1e-5)


def test_iou3d_disjoint_boxes():
    c1 = get_corners_of_cuboid(
        jnp.array([0.0]), jnp.array([0.0]), jnp.array([10.0]),
        jnp.array([2.0]), jnp.array([2.0]), jnp.array([2.0]), jnp.array([0.0]))
    c2 = get_corners_of_cuboid(
        jnp.array([100.0]), jnp.array([0.0]), jnp.array([10.0]),
        jnp.array([2.0]), jnp.array([2.0]), jnp.array([2.0]), jnp.array([0.0]))
    iou_bev, iou_3d = iou3d_approximate(c1, c2, pairwise=True)
    np.testing.assert_allclose(iou_bev, 0.0, atol=1e-6)
    np.testing.assert_allclose(iou_3d, 0.0, atol=1e-6)


def test_iou3d_half_overlap_axis_aligned():
    """Two unit cubes offset by half a side: IoU = 0.5/1.5 = 1/3."""
    c1 = get_corners_of_cuboid(
        jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]),
        jnp.array([1.0]), jnp.array([1.0]), jnp.array([1.0]), jnp.array([0.0]))
    c2 = get_corners_of_cuboid(
        jnp.array([0.5]), jnp.array([0.0]), jnp.array([0.0]),
        jnp.array([1.0]), jnp.array([1.0]), jnp.array([1.0]), jnp.array([0.0]))
    _, iou_3d = iou3d_approximate(c1, c2, pairwise=False)
    np.testing.assert_allclose(iou_3d, [1.0 / 3.0], atol=1e-5)


def test_generalized_iou3d_identical_is_normal():
    corners = get_corners_of_cuboid(
        jnp.array([0.0]), jnp.array([0.0]), jnp.array([10.0]),
        jnp.array([2.0]), jnp.array([2.0]), jnp.array([2.0]), jnp.array([0.0]))
    _, giou = iou3d_approximate(corners, corners, pairwise=False, generalized=True)
    np.testing.assert_allclose(giou, [1.0], atol=1e-5)


def test_generalized_iou3d_disjoint_negative():
    c1 = get_corners_of_cuboid(
        jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]),
        jnp.array([1.0]), jnp.array([1.0]), jnp.array([1.0]), jnp.array([0.0]))
    c2 = get_corners_of_cuboid(
        jnp.array([10.0]), jnp.array([0.0]), jnp.array([0.0]),
        jnp.array([1.0]), jnp.array([1.0]), jnp.array([1.0]), jnp.array([0.0]))
    _, giou = iou3d_approximate(c1, c2, pairwise=False, generalized=True)
    assert float(giou[0]) < 0.0


def test_pairwise_vs_elementwise_iou3d_consistency(rng):
    n = 5
    x = rng.uniform(-10, 10, n)
    z = rng.uniform(5, 40, n)
    c = get_corners_of_cuboid(
        jnp.asarray(x), jnp.zeros(n), jnp.asarray(z),
        jnp.full(n, 1.6), jnp.full(n, 1.5), jnp.full(n, 3.9),
        jnp.asarray(rng.uniform(-np.pi, np.pi, n)))
    bev_pw, i3_pw = iou3d_approximate(c, c, pairwise=True, generalized=True)
    bev_ew, i3_ew = iou3d_approximate(c, c, pairwise=False, generalized=True)
    np.testing.assert_allclose(np.diag(np.asarray(bev_pw)), np.asarray(bev_ew), atol=1e-5)
    np.testing.assert_allclose(np.diag(np.asarray(i3_pw)), np.asarray(i3_ew), atol=1e-5)


def test_intersect_broadcasting_shapes(rng):
    """Reference test/test_intersection.py: combination shapes are [M, N]."""
    a = rng.uniform(0, 20, (4, 4)).astype(np.float32)
    b = rng.uniform(0, 20, (9, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:]) + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) + 1
    assert pairwise_intersect(a, b).shape == (4, 9)
    assert pairwise_iou(a, b).shape == (4, 9)
