"""Box-overlap primitives: 2D IoU, ignore-overlap, and approximate 3D IoU.

JAX re-implementations of the reference's lib/core.py:178-477 (``intersect``,
``iou``, ``iou_ign``, ``iou3d``/``iou3d_approximate``, ``get_volume``,
``remove_rotation_in_boxes``).  Everything here is a pure batched tensor op:
`pairwise_*` functions return full [M, N] matrices (MXU-friendly shapes),
`elementwise_*` return [M].

The 2D primitives use the *exclusive* convention (w = x2 - x1, no +1 shift),
matching the reference's lib/core.py ``iou``; the classical-NMS oracles use a
+1 shift, so `pairwise_iou` takes a ``shift`` argument.
"""

from __future__ import annotations

import jax.numpy as jnp


def _area(box, shift=0.0):
    return (box[..., 2] - box[..., 0] + shift) * (box[..., 3] - box[..., 1] + shift)


def pairwise_intersect(box_a, box_b, shift=0.0):
    """Pairwise intersection area. box_a [M, 4], box_b [N, 4] -> [M, N]."""
    max_xy = jnp.minimum(box_a[:, None, 2:4], box_b[None, :, 2:4])
    min_xy = jnp.maximum(box_a[:, None, 0:2], box_b[None, :, 0:2])
    wh = jnp.clip(max_xy - min_xy + shift, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(box_a, box_b, shift=0.0):
    """Pairwise IoU. box_a [M, 4], box_b [N, 4] -> [M, N].

    Reference lib/core.py:480-529 (mode='combinations').
    """
    inter = pairwise_intersect(box_a, box_b, shift)
    union = _area(box_a, shift)[:, None] + _area(box_b, shift)[None, :] - inter
    return inter / union


def pairwise_iou_ign(box_a, box_b):
    """Overlap of box_a inside ignore regions box_b, normalised by area_a only.

    Reference lib/core.py:536-575: union = area_a (area_b and inter zeroed).
    box_a [M, 4], box_b [N, 4] -> [M, N].
    """
    inter = pairwise_intersect(box_a, box_b)
    return inter / _area(box_a)[:, None]


def elementwise_intersect(box_a, box_b, shift=0.0):
    """Row-wise intersection area. box_a, box_b [M, 4] -> [M]."""
    max_xy = jnp.minimum(box_a[..., 2:4], box_b[..., 2:4])
    min_xy = jnp.maximum(box_a[..., 0:2], box_b[..., 0:2])
    wh = jnp.clip(max_xy - min_xy + shift, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def elementwise_iou(box_a, box_b, shift=0.0):
    """Row-wise IoU. box_a, box_b [M, 4] -> [M] (reference mode='list')."""
    inter = elementwise_intersect(box_a, box_b, shift)
    union = _area(box_a, shift) + _area(box_b, shift) - inter
    return inter / union


def aabb_volume(corners):
    """Axis-aligned bounding volume of corner sets [..., 3, 8] -> [...].

    Reference lib/core.py:434-460 -- intentionally the AABB volume (the
    'approximate' in iou3d_approximate).
    """
    diff = corners.max(axis=-1) - corners.min(axis=-1)
    return jnp.prod(diff, axis=-1)


def bev_boxes_from_corners(corners):
    """Axis-aligned BEV footprints from cuboid corners.

    corners [..., 3, 8] -> [..., 4] = [x1, z1, x2, z2] over the bottom face
    corners [2, 3, 6, 7] (reference lib/core.py:352-356 + 463-477).
    """
    bottom = corners[..., :, jnp.array([2, 3, 6, 7])]     # [..., 3, 4]
    x, z = bottom[..., 0, :], bottom[..., 2, :]
    return jnp.stack(
        [x.min(axis=-1), z.min(axis=-1), x.max(axis=-1), z.max(axis=-1)], axis=-1
    )


def _span_overlap(lo_a, hi_a, lo_b, hi_b, pairwise):
    if pairwise:
        lo = jnp.maximum(lo_a[:, None], lo_b[None, :])
        hi = jnp.minimum(hi_a[:, None], hi_b[None, :])
    else:
        lo = jnp.maximum(lo_a, lo_b)
        hi = jnp.minimum(hi_a, hi_b)
    return jnp.clip(hi - lo, 0.0, None)


def _span_hull(lo_a, hi_a, lo_b, hi_b, pairwise):
    if pairwise:
        lo = jnp.minimum(lo_a[:, None], lo_b[None, :])
        hi = jnp.maximum(hi_a[:, None], hi_b[None, :])
    else:
        lo = jnp.minimum(lo_a, lo_b)
        hi = jnp.maximum(hi_a, hi_b)
    return jnp.clip(hi - lo, 0.0, None)


def iou3d_approximate(corners_a, corners_b, pairwise=True, generalized=False):
    """Differentiable approximate 3D IoU between cuboid corner sets.

    Axis-aligns the rotated BEV footprints (AABB), multiplies the BEV
    rectangle overlap by the vertical overlap, and divides by the AABB
    volumes.  ``generalized=True`` adds the GIoU-3D hull penalty.  Matches
    reference lib/core.py:305-432 including its quirks (AABB volume, zero
    clamp on spans).

    corners_a [M, 3, 8], corners_b [N, 3, 8].
    Returns (iou_bev, iou_3d): [M, N] if pairwise else [M].
    """
    vol_a, vol_b = aabb_volume(corners_a), aabb_volume(corners_b)
    y_lo_a, y_hi_a = corners_a[..., 1, :].min(-1), corners_a[..., 1, :].max(-1)
    y_lo_b, y_hi_b = corners_b[..., 1, :].min(-1), corners_b[..., 1, :].max(-1)

    bev_a = bev_boxes_from_corners(corners_a)
    bev_b = bev_boxes_from_corners(corners_b)

    y_inter = _span_overlap(y_lo_a, y_hi_a, y_lo_b, y_hi_b, pairwise)
    if pairwise:
        vol = vol_a[:, None] + vol_b[None, :]
        iou_bev = pairwise_iou(bev_a, bev_b)
        inter_bev = pairwise_intersect(bev_a, bev_b)
    else:
        vol = vol_a + vol_b
        iou_bev = elementwise_iou(bev_a, bev_b)
        inter_bev = elementwise_intersect(bev_a, bev_b)

    inter_3d = inter_bev * y_inter
    union_3d = vol - inter_3d
    iou_3d = inter_3d / union_3d

    if generalized:
        x_hull = _span_hull(bev_a[..., 0], bev_a[..., 2], bev_b[..., 0], bev_b[..., 2], pairwise)
        z_hull = _span_hull(bev_a[..., 1], bev_a[..., 3], bev_b[..., 1], bev_b[..., 3], pairwise)
        y_hull = _span_hull(y_lo_a, y_hi_a, y_lo_b, y_hi_b, pairwise)
        vol_hull = x_hull * y_hull * z_hull
        iou_3d = iou_3d - (vol_hull - union_3d) / vol_hull

    return iou_bev, iou_3d
