"""2D/3D box parameterisations and R-CNN-style delta transforms.

Functional JAX re-implementations with the same numerical semantics as the
reference's numpy/torch pair (reference: lib/rpn_util.py:794-934 --
``bbox_transform``, ``bbox_transform_3d``, ``bbox_transform_inv`` -- and the
coordinate converters at lib/rpn_util.py:768-791).  Every function is
shape-polymorphic over leading batch axes and safe under ``jit``/``vmap``.

Box convention: ``[x1, y1, x2, y2]`` inclusive pixel corners; widths are
``x2 - x1 + 1`` (legacy R-CNN convention, load-bearing for parity with the
reference's anchors and the KITTI evaluator inputs).
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_corners(box):
    """[x, y, w, h] -> [x1, y1, x2, y2] with the inclusive-pixel convention.

    Mirrors reference lib/rpn_util.py:781 (bbXYWH2Coords).
    """
    box = jnp.asarray(box)
    x1 = box[..., 0]
    y1 = box[..., 1]
    x2 = box[..., 0] + box[..., 2] - 1
    y2 = box[..., 1] + box[..., 3] - 1
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def corners_to_xywh(box):
    """[x1, y1, x2, y2] -> [x, y, w, h] (reference lib/rpn_util.py:768)."""
    box = jnp.asarray(box)
    w = box[..., 2] - box[..., 0] + 1
    h = box[..., 3] - box[..., 1] + 1
    return jnp.stack([box[..., 0], box[..., 1], w, h], axis=-1)


def center_size(box):
    """Return (ctr_x, ctr_y, w, h) of corner boxes (inclusive convention)."""
    w = box[..., 2] - box[..., 0] + 1.0
    h = box[..., 3] - box[..., 1] + 1.0
    cx = box[..., 0] + 0.5 * w
    cy = box[..., 1] + 0.5 * h
    return cx, cy, w, h


def bbox_transform(ex_rois, gt_rois):
    """2D deltas [dx, dy, dw, dh] from anchors to ground truths.

    Same math as reference lib/rpn_util.py:843-869: center offsets divided by
    anchor size, log-space scale ratios.
    """
    ex_cx, ex_cy, ex_w, ex_h = center_size(ex_rois)
    gt_cx, gt_cy, gt_w, gt_h = center_size(gt_rois)
    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes, deltas, means=None, stds=None):
    """Decode 2D deltas against anchor boxes, optionally de-normalising.

    Reference lib/rpn_util.py:872-934.  ``boxes`` [..., 4] corner anchors,
    ``deltas`` [..., 4] predicted (possibly normalised) deltas.
    """
    cx, cy, w, h = center_size(boxes)
    dx, dy, dw, dh = (deltas[..., 0], deltas[..., 1], deltas[..., 2], deltas[..., 3])
    if stds is not None:
        stds = jnp.asarray(stds)
        dx = dx * stds[0]
        dy = dy * stds[1]
        dw = dw * stds[2]
        dh = dh * stds[3]
    if means is not None:
        means = jnp.asarray(means)
        dx = dx + means[0]
        dy = dy + means[1]
        dw = dw + means[2]
        dh = dh + means[3]
    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h
    return jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w - 1,
            pred_cy + 0.5 * pred_h - 1,
        ],
        axis=-1,
    )


def bbox_transform_3d(ex_rois_2d, ex_rois_3d, gt_rois, decomp_alpha=False,
                      has_vel=False, rois_3d_cen=None):
    """3D regression targets relative to an anchor's learned 3D prior.

    Reference lib/rpn_util.py:794-840.  ``gt_rois`` columns are the imdb
    ``bbox_3d`` layout ``[cx, cy, cz2d, w3d, h3d, l3d, alpha, cx3d, cy3d,
    cz3d, rotY, elev, alpha_sin, alpha_cos, axis_lbl, head_lbl, (vel)]``.
    ``ex_rois_3d`` columns are anchor prior ``[z, w3d, h3d, l3d, rotY,
    (sin, cos, (vel))]``.

    Returns ``[dx, dy, dz, dlog_w, dlog_h, dlog_l, drotY, (dsin, dcos,
    (dvel)), gt_rois[7:]]`` -- the raw GT tail is appended exactly as the
    reference does so downstream consumers can recover raw camera coords.
    """
    _, _, ex_w, ex_h = center_size(ex_rois_2d)
    if rois_3d_cen is None:
        ex_cx = ex_rois_2d[..., 0] + 0.5 * ex_w
        ex_cy = ex_rois_2d[..., 1] + 0.5 * ex_h
    else:
        ex_cx = rois_3d_cen[..., 0]
        ex_cy = rois_3d_cen[..., 1]

    dx = (gt_rois[..., 0] - ex_cx) / ex_w
    dy = (gt_rois[..., 1] - ex_cy) / ex_h
    dz = gt_rois[..., 2] - ex_rois_3d[..., 0]
    dw = jnp.log(gt_rois[..., 3] / ex_rois_3d[..., 1])
    dh = jnp.log(gt_rois[..., 4] / ex_rois_3d[..., 2])
    dl = jnp.log(gt_rois[..., 5] / ex_rois_3d[..., 3])
    drot = gt_rois[..., 6] - ex_rois_3d[..., 4]

    cols = [dx, dy, dz, dw, dh, dl, drot]
    if decomp_alpha:
        cols.append(gt_rois[..., 12] - ex_rois_3d[..., 5])
        cols.append(gt_rois[..., 13] - ex_rois_3d[..., 6])
        if has_vel:
            if ex_rois_3d.shape[-1] < 8:
                # guard: jnp silently CLAMPS out-of-bounds static indices,
                # so a 7-col prior would make [..., 7] read the cos prior
                # and corrupt every velocity target without any error
                raise ValueError(
                    "has_vel targets need an 8-column anchor prior "
                    f"[z w3d h3d l3d rotY sin cos vel]; got "
                    f"{ex_rois_3d.shape[-1]} columns")
            if gt_rois.shape[-1] == 17:
                cols.append(gt_rois[..., 16] - ex_rois_3d[..., 7])
            else:
                cols.append(jnp.full_like(dx, -jnp.inf))
    targets = jnp.stack(cols, axis=-1)
    return jnp.concatenate([targets, gt_rois[..., 7:]], axis=-1)
