"""3D geometry: cuboid corners, camera projection, orientation conversions.

JAX re-implementations of the reference's lib/math_3d.py and the
alpha<->rotY converters in lib/util.py:630-679.  All functions are
fixed-shape, jittable, and broadcast over leading batch axes.

Camera axes convention (KITTI camera frame):

        Z (forward)
       /
      /______ X (right)
      |
      V Y (down)

Cuboid corner numbering (the reference's ``iou_3d_convention``, see
lib/math_3d.py:364-380): corners [2,3,6,7] are the bottom face traversed
7-2-3-6 in BEV.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Camera (back)projection is a tiny 4x4 contraction whose outputs feed metric
# 3D coordinates; TPU default (bf16) matmul precision loses ~0.1m at KITTI
# depths, so these einsums always run at HIGHEST precision.
_HI = jax.lax.Precision.HIGHEST

# Unit-cube corner offsets in the iou_3d_convention: axis k of corner j is
# +0.5 extent if j in POS[k] else -0.5 extent (reference lib/math_3d.py:400).
_CORNER_SIGNS_X = jnp.array([-1, 1, -1, 1, -1, 1, 1, -1], dtype=jnp.float32)  # l3d on [1,3,5,6]
_CORNER_SIGNS_Y = jnp.array([-1, -1, 1, 1, -1, -1, 1, 1], dtype=jnp.float32)  # h3d on [2,3,6,7]
_CORNER_SIGNS_Z = jnp.array([-1, -1, -1, -1, 1, 1, 1, 1], dtype=jnp.float32)  # w3d on [4,5,6,7]


def get_corners_of_cuboid(x3d, y3d, z3d, w3d, h3d, l3d, ry3d):
    """Corners [..., 3, 8] of oriented cuboids, rotated about camera Y.

    Matches reference lib/math_3d.py:364-460 (iou_3d_convention=True):
    the local box spans l3d along X, h3d along Y, w3d along Z, then rotates
    by R_y(ry3d) and translates to (x3d, y3d, z3d).
    """
    x3d, y3d, z3d = jnp.asarray(x3d), jnp.asarray(y3d), jnp.asarray(z3d)
    w3d, h3d, l3d, ry3d = (jnp.asarray(w3d), jnp.asarray(h3d),
                           jnp.asarray(l3d), jnp.asarray(ry3d))

    lx = 0.5 * l3d[..., None] * _CORNER_SIGNS_X   # [..., 8]
    ly = 0.5 * h3d[..., None] * _CORNER_SIGNS_Y
    lz = 0.5 * w3d[..., None] * _CORNER_SIGNS_Z

    c, s = jnp.cos(ry3d)[..., None], jnp.sin(ry3d)[..., None]
    # R_y(theta) @ [lx, ly, lz]
    gx = c * lx + s * lz + x3d[..., None]
    gy = ly + y3d[..., None]
    gz = -s * lx + c * lz + z3d[..., None]
    return jnp.stack([gx, gy, gz], axis=-2)      # [..., 3, 8]


def project_3d_points(p2, points_3d):
    """Project camera-frame 3D points to the image via a 4x4 P2.

    ``points_3d`` [..., 3, N] -> returns [..., 3, N] of (u, v, z) where the
    homogeneous divide is skipped when |z| <= 1e-2 (reference
    lib/math_3d.py:47-71).
    """
    ones = jnp.ones_like(points_3d[..., :1, :])
    pts4 = jnp.concatenate([points_3d, ones], axis=-2)
    proj = jnp.einsum("ij,...jn->...in", p2, pts4, precision=_HI)
    z = proj[..., 2:3, :]
    safe = jnp.where(jnp.abs(z) > 1e-2, z, jnp.ones_like(z))
    uv = jnp.where(jnp.abs(z) > 1e-2, proj[..., :2, :] / safe, proj[..., :2, :])
    return jnp.concatenate([uv, z], axis=-2)


def backproject_2d_points(p2_inv, x2d, y2d, z2d):
    """Lift image points (u, v) at depth z back to the camera frame.

    Reference lib/math_3d.py:74-97: multiply pixel coords by depth, then
    apply P2^{-1}.  Returns (x3d, y3d, z3d).
    """
    pts = jnp.stack([x2d * z2d, y2d * z2d, z2d, jnp.ones_like(z2d)], axis=-2)
    out = jnp.einsum("ij,...jn->...in", p2_inv, pts, precision=_HI)
    return out[..., 0, :], out[..., 1, :], out[..., 2, :]


def snap_to_pi(theta):
    """Wrap angles into (-pi, pi] (reference lib/math_3d.py:497-510)."""
    theta = jnp.asarray(theta)
    wrapped = jnp.mod(theta + math.pi, 2 * math.pi) - math.pi
    # mod maps pi -> -pi; the reference keeps +pi and excludes -pi.
    return jnp.where(wrapped <= -math.pi, wrapped + 2 * math.pi, wrapped)


def alpha_to_rot_y(alpha, z3d, x3d):
    """Observation angle alpha -> global yaw rotY (reference lib/util.py:630)."""
    return snap_to_pi(alpha + jnp.arctan2(-jnp.asarray(z3d), jnp.asarray(x3d)) + 0.5 * math.pi)


def rot_y_to_alpha(ry3d, z3d, x3d):
    """Global yaw rotY -> observation angle alpha (reference lib/util.py:657)."""
    return snap_to_pi(ry3d - jnp.arctan2(-jnp.asarray(z3d), jnp.asarray(x3d)) - 0.5 * math.pi)


def project_3d_box(p2, x3d, y3d, z3d, w3d, h3d, l3d, ry3d):
    """Axis-aligned 2D box enclosing the projected cuboid corners.

    Returns [..., 4] = [x1, y1, x2, y2] (reference lib/math_3d.py:103-144,
    get_2D_from_3D's verts path).
    """
    corners = get_corners_of_cuboid(x3d, y3d, z3d, w3d, h3d, l3d, ry3d)
    proj = project_3d_points(p2, corners)
    u, v = proj[..., 0, :], proj[..., 1, :]
    return jnp.stack(
        [u.min(axis=-1), v.min(axis=-1), u.max(axis=-1), v.max(axis=-1)], axis=-1
    )
