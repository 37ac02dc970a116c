"""Post-hoc depth/yaw refinement by 2D-3D projection consistency.

Capability match for the reference's ``hill_climb`` / ``test_projection``
(lib/rpn_util.py:2254-2349), used by the analysis scripts to refine z and
rotY so the projected cuboid matches the predicted 2D box.

TPU re-design: the reference climbs one box at a time with unbounded while
loops; here the climb is batched over all boxes (vmap) with a fixed
iteration budget -- each iteration evaluates the +/- step candidates for z
and rotY in parallel, takes the better one if it improves by more than
``min_ol_dif``, else halves the step.  Early-converged lanes become no-ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import snap_to_pi
from .iou import elementwise_iou


def projection_consistency(p2, p2_inv, box_2d, x2d, y2d, z2d, w3d, h3d, l3d,
                           ry3d):
    """IoU between a 2D box and the projection of the decoded 3D box.

    box_2d: [..., 4] as [x, y, w, h] (the reference's bbox_full layout).
    Returns (overlap [...], invalid [...]) -- invalid when any cuboid corner
    falls behind the camera.
    """
    corners_box = jnp.stack([
        box_2d[..., 0], box_2d[..., 1],
        box_2d[..., 0] + box_2d[..., 2] - 1,
        box_2d[..., 1] + box_2d[..., 3] - 1], axis=-1)

    pts = jnp.stack([x2d * z2d, y2d * z2d, z2d, jnp.ones_like(z2d)], axis=-1)
    cam = jnp.einsum("ij,...j->...i", p2_inv, pts,
                     precision=jax.lax.Precision.HIGHEST)
    x3d, y3d, z3d = cam[..., 0], cam[..., 1], cam[..., 2]

    from .geometry import get_corners_of_cuboid, project_3d_points
    corners = get_corners_of_cuboid(x3d, y3d, z3d, w3d, h3d, l3d, ry3d)
    proj = project_3d_points(p2, corners)
    invalid = jnp.any(proj[..., 2, :] <= 0, axis=-1)
    u, v = proj[..., 0, :], proj[..., 1, :]
    proj_box = jnp.stack([u.min(-1), v.min(-1), u.max(-1), v.max(-1)],
                         axis=-1)
    ol = elementwise_iou(corners_box, proj_box)
    return jnp.nan_to_num(ol, nan=0.0), invalid


@functools.partial(jax.jit, static_argnames=("max_steps",))
def hill_climb(p2, p2_inv, box_2d, x2d, y2d, z2d, w3d, h3d, l3d, ry3d, *,
               step_z_init=1.0, step_r_init=0.3, z_lim=0.01, r_lim=0.01,
               min_ol_dif=0.0, max_steps=24):
    """Batched coordinate-descent on (z, ry). All box args are [N].

    Returns (z2d_refined, ry3d_refined, overlap).
    """
    def consistency(z, r):
        return projection_consistency(p2, p2_inv, box_2d, x2d, y2d, z,
                                      w3d, h3d, l3d, r)

    ol0, invalid0 = consistency(z2d, ry3d)

    def body(_, state):
        z, r, ol, sz, sr = state

        # z direction
        ol_n, inv_n = consistency(z - sz, r)
        ol_p, inv_p = consistency(z + sz, r)
        go_p = ((ol_p - ol) > min_ol_dif) & (ol_p > ol_n) & ~inv_p
        go_n = ~go_p & ((ol_n - ol) > min_ol_dif) & ~inv_n
        active = sz > z_lim
        z = jnp.where(active & go_p, z + sz,
                      jnp.where(active & go_n, z - sz, z))
        ol = jnp.where(active & go_p, ol_p,
                       jnp.where(active & go_n, ol_n, ol))
        sz = jnp.where(active & ~(go_p | go_n), sz * 0.5, sz)

        # rotation direction
        ol_n, inv_n = consistency(z, r - sr)
        ol_p, inv_p = consistency(z, r + sr)
        go_p = ((ol_p - ol) > min_ol_dif) & (ol_p > ol_n) & ~inv_p
        go_n = ~go_p & ((ol_n - ol) > min_ol_dif) & ~inv_n
        active = sr > r_lim
        r = jnp.where(active & go_p, r + sr,
                      jnp.where(active & go_n, r - sr, r))
        ol = jnp.where(active & go_p, ol_p,
                       jnp.where(active & go_n, ol_n, ol))
        sr = jnp.where(active & ~(go_p | go_n), sr * 0.5, sr)
        return z, r, ol, sz, sr

    n = z2d.shape[0]
    state = (z2d, ry3d, ol0,
             jnp.full((n,), step_z_init), jnp.full((n,), step_r_init))
    z_new, r_new, ol_new, _, _ = jax.lax.fori_loop(0, max_steps, body, state)

    # invalid initial projections keep their inputs (reference L2261)
    z_out = jnp.where(invalid0, z2d, z_new)
    r_out = snap_to_pi(jnp.where(invalid0, ry3d, r_new))
    ol_out = jnp.where(invalid0, ol0, ol_new)
    return z_out, r_out, ol_out
