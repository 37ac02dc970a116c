"""RoIAlign via bilinear interpolation (pure JAX, differentiable).

Capability match for the reference's CUDA RoIAlign
(lib/roi_align/src/roi_align_kernel.cu:15-162 + torch FFI wrappers) -- note
the reference op is dead code (nothing imports it, verified in SURVEY.md
section 2.9); it is provided here for feature parity.  The backward pass is
free via autodiff instead of the reference's hand-written atomicAdd kernel.

Semantics follow the reference kernel: each output cell samples the feature
map at the cell center via bilinear interpolation over an aligned_height x
aligned_width grid scaled by ``spatial_scale`` (the average-pool 'Avg'
module variant; 'Max' is a reduction flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                             "reduction"))
def roi_align(features, rois, *, output_size=(7, 7), spatial_scale=1.0,
              sampling_ratio=2, reduction="avg"):
    """RoIAlign.

    Args:
      features: [H, W, C] feature map (single image; vmap over batch).
      rois: [N, 4] boxes [x1, y1, x2, y2] in input coordinates.
      output_size: (oh, ow) output grid.
      spatial_scale: multiplier mapping roi coords to feature coords.
      sampling_ratio: sample points per output cell edge.
      reduction: 'avg' or 'max' over the cell's sample points.

    Returns [N, oh, ow, C].
    """
    h, w, c = features.shape
    oh, ow = output_size
    s = sampling_ratio

    boxes = rois * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    # sample grid: s*s points per output cell, at cell-relative offsets
    cell_w = roi_w / ow
    cell_h = roi_h / oh
    ix = (jnp.arange(ow * s) + 0.5) / s                       # [ow*s]
    iy = (jnp.arange(oh * s) + 0.5) / s
    sample_x = x1[:, None] + ix[None, :] * cell_w[:, None]    # [N, ow*s]
    sample_y = y1[:, None] + iy[None, :] * cell_h[:, None]

    x0 = jnp.clip(jnp.floor(sample_x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sample_y), 0, h - 1)
    x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    fx = jnp.clip(sample_x - x0, 0.0, 1.0)                    # [N, ow*s]
    fy = jnp.clip(sample_y - y0, 0.0, 1.0)

    def gather(yi, xi):
        # [N, oh*s, ow*s, C]
        return features[yi[:, :, None], xi[:, None, :]]

    f00 = gather(y0i, x0i)
    f01 = gather(y0i, x1i)
    f10 = gather(y1i, x0i)
    f11 = gather(y1i, x1i)
    wx = fx[:, None, :, None]
    wy = fy[:, :, None, None]
    out = (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx
           + f10 * wy * (1 - wx) + f11 * wy * wx)             # [N, oh*s, ow*s, C]

    out = out.reshape(rois.shape[0], oh, s, ow, s, c)
    if reduction == "max":
        return out.max(axis=(2, 4))
    return out.mean(axis=(2, 4))
