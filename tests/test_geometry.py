"""Geometry parity tests (reference lib/math_3d.py, lib/util.py:630-679)."""

import math

import numpy as np
import jax.numpy as jnp

from groomed_nms_tpu.ops.geometry import (
    alpha_to_rot_y,
    backproject_2d_points,
    get_corners_of_cuboid,
    project_3d_box,
    project_3d_points,
    rot_y_to_alpha,
    snap_to_pi,
)


def _np_corners(x3d, y3d, z3d, w3d, h3d, l3d, ry3d):
    """Independent numpy oracle following lib/math_3d.py:440-487 layout."""
    n = x3d.shape[0]
    corners = np.zeros((n, 3, 8))
    corners[:, 0, [1, 3, 5, 6]] = l3d[:, None]
    corners[:, 1, [2, 3, 6, 7]] = h3d[:, None]
    corners[:, 2, [4, 5, 6, 7]] = w3d[:, None]
    corners[:, 0] -= l3d[:, None] / 2
    corners[:, 1] -= h3d[:, None] / 2
    corners[:, 2] -= w3d[:, None] / 2
    R = np.zeros((n, 3, 3))
    R[:, 0, 0] = np.cos(ry3d)
    R[:, 0, 2] = np.sin(ry3d)
    R[:, 1, 1] = 1.0
    R[:, 2, 0] = -np.sin(ry3d)
    R[:, 2, 2] = np.cos(ry3d)
    out = np.einsum("nij,njk->nik", R, corners)
    out[:, 0] += x3d[:, None]
    out[:, 1] += y3d[:, None]
    out[:, 2] += z3d[:, None]
    return out


def test_corners_vs_numpy_oracle(rng):
    n = 10
    x = rng.uniform(-20, 20, n)
    y = rng.uniform(-2, 2, n)
    z = rng.uniform(4, 60, n)
    w = rng.uniform(0.5, 3, n)
    h = rng.uniform(0.5, 3, n)
    l = rng.uniform(1, 6, n)
    ry = rng.uniform(-np.pi, np.pi, n)
    got = np.asarray(get_corners_of_cuboid(x, y, z, w, h, l, ry))
    expect = _np_corners(x, y, z, w, h, l, ry)
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_corners_batched_leading_axes(rng):
    b, n = 2, 5
    args = [rng.uniform(1, 5, (b, n)) for _ in range(7)]
    got = get_corners_of_cuboid(*[jnp.asarray(a) for a in args])
    assert got.shape == (b, n, 3, 8)
    single = get_corners_of_cuboid(*[jnp.asarray(a[0]) for a in args])
    np.testing.assert_allclose(got[0], single, atol=1e-6)


def _kitti_like_p2():
    p2 = np.array([
        [721.5377, 0.0, 609.5593, 44.857],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.00274588],
        [0.0, 0.0, 0.0, 1.0],
    ])
    return p2


def test_project_backproject_roundtrip(rng):
    p2 = _kitti_like_p2()
    p2_inv = np.linalg.inv(p2)
    n = 8
    pts = np.stack([
        rng.uniform(-10, 10, n),
        rng.uniform(-2, 2, n),
        rng.uniform(5, 50, n),
    ])  # [3, N]
    proj = np.asarray(project_3d_points(jnp.asarray(p2), jnp.asarray(pts)))
    x3d, y3d, z3d = backproject_2d_points(
        jnp.asarray(p2_inv), jnp.asarray(proj[0:1]), jnp.asarray(proj[1:2]),
        jnp.asarray(proj[2:3]))
    np.testing.assert_allclose(np.asarray(x3d)[0], pts[0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(y3d)[0], pts[1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(z3d)[0], pts[2], atol=1e-3)


def test_snap_to_pi():
    vals = jnp.array([0.0, math.pi, -math.pi, 3 * math.pi, -3 * math.pi, 1.5])
    out = np.asarray(snap_to_pi(vals))
    assert np.all(out > -math.pi - 1e-6) and np.all(out <= math.pi + 1e-6)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[1], math.pi, atol=1e-6)
    np.testing.assert_allclose(out[2], math.pi, atol=1e-6)  # -pi -> +pi
    np.testing.assert_allclose(out[5], 1.5, atol=1e-6)


def test_alpha_rot_roundtrip(rng):
    n = 32
    alpha = rng.uniform(-np.pi, np.pi, n)
    z3d = rng.uniform(5, 60, n)
    x3d = rng.uniform(-20, 20, n)
    ry = np.asarray(alpha_to_rot_y(alpha, z3d, x3d))
    back = np.asarray(rot_y_to_alpha(ry, z3d, x3d))
    # round trip up to 2*pi wrapping
    diff = np.asarray(snap_to_pi(back - alpha))
    np.testing.assert_allclose(diff, 0.0, atol=1e-5)


def test_alpha_to_rot_formula():
    # straight-ahead box (x=0): rotY = alpha + atan2(-z, 0) + pi/2 = alpha
    alpha = np.array([0.3])
    ry = np.asarray(alpha_to_rot_y(alpha, np.array([10.0]), np.array([0.0])))
    np.testing.assert_allclose(ry, [0.3], atol=1e-6)


def test_project_3d_box_contains_center():
    p2 = jnp.asarray(_kitti_like_p2())
    box = np.asarray(project_3d_box(
        p2, jnp.array([0.0]), jnp.array([0.0]), jnp.array([20.0]),
        jnp.array([1.6]), jnp.array([1.5]), jnp.array([3.9]), jnp.array([0.5])))
    center = np.asarray(project_3d_points(
        p2, jnp.array([[0.0], [0.0], [20.0]])))
    u, v = center[0, 0], center[1, 0]
    assert box[0, 0] < u < box[0, 2]
    assert box[0, 1] < v < box[0, 3]


def test_vis_cuboid_projection_matches_geometry_ops(rng):
    """utils/vis.py's host-side numpy cuboid projection must stay in
    lockstep with ops/geometry's corner convention + projection."""
    from groomed_nms_tpu.utils.vis import project_cuboid_verts
    p2 = _kitti_like_p2()
    for _ in range(5):
        x, y, z = rng.uniform(-15, 15), rng.uniform(-1, 2), \
            rng.uniform(5, 50)
        w, h, l = rng.uniform(0.5, 3), rng.uniform(0.5, 3), \
            rng.uniform(1, 6)
        ry = rng.uniform(-np.pi, np.pi)
        verts, depth = project_cuboid_verts(p2, x, y, z, w, h, l, ry)
        corners = get_corners_of_cuboid(x, y, z, w, h, l, ry)
        want = np.asarray(project_3d_points(jnp.asarray(p2),
                                            jnp.asarray(corners)))
        np.testing.assert_allclose(verts, want[:2].T, atol=1e-3)
        np.testing.assert_allclose(depth, want[2], atol=1e-4)
