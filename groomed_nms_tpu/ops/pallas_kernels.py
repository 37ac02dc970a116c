"""Pallas TPU kernels for the detection hot path.

``fused_iou_prune`` computes, in a single tiled pass over VMEM:
  * the full pairwise IoU matrix of N (score-sorted) boxes, and
  * the GrooMeD-NMS prune matrix P = pruning(iou) masked strictly lower
    triangular with a zeroed diagonal (reference lib/groomed_nms.py:71-75),
    with padded boxes zeroed.

Fusing both outputs halves HBM traffic versus computing IoU then re-reading
it for the prune transform, and the [TILE, TILE] blocks stay in VMEM.  Box
coordinates are fed as a [4, N] array so the N axis lands on the 128-wide
lane dimension.

Use ``interpret=True`` on CPU (tests); the jitted wrapper picks the real
kernel on TPU automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256


def _make_kernel(n_pad, nms_threshold, temperature, pruning_method, shift):
    def kernel(rows_ref, cols_ref, iou_ref, prune_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        # a-boxes: [4, TILE] -> column vectors [TILE, 1]
        ax1 = rows_ref[0, :].reshape(_TILE, 1)
        ay1 = rows_ref[1, :].reshape(_TILE, 1)
        ax2 = rows_ref[2, :].reshape(_TILE, 1)
        ay2 = rows_ref[3, :].reshape(_TILE, 1)
        # b-boxes: row vectors [1, TILE]
        bx1 = cols_ref[0, :].reshape(1, _TILE)
        by1 = cols_ref[1, :].reshape(1, _TILE)
        bx2 = cols_ref[2, :].reshape(1, _TILE)
        by2 = cols_ref[3, :].reshape(1, _TILE)

        iw = jnp.maximum(
            jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + shift, 0.0)
        ih = jnp.maximum(
            jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + shift, 0.0)
        inter = iw * ih
        area_a = (ax2 - ax1 + shift) * (ay2 - ay1 + shift)
        area_b = (bx2 - bx1 + shift) * (by2 - by1 + shift)
        union = jnp.maximum(area_a + area_b - inter, 1e-12)
        iou = inter / union
        iou_ref[:, :] = iou

        if pruning_method == "linear":
            p = iou
        elif pruning_method == "sigmoidal":
            p = jax.nn.sigmoid((iou - nms_threshold) / temperature)
        elif pruning_method == "soft_nms":
            p = 1.0 - jnp.exp(-(iou * iou) / temperature)
        else:
            raise NotImplementedError(pruning_method)

        row_ids = i * _TILE + jax.lax.broadcasted_iota(
            jnp.int32, (_TILE, _TILE), 0)
        col_ids = j * _TILE + jax.lax.broadcasted_iota(
            jnp.int32, (_TILE, _TILE), 1)
        # strictly lower triangular: only earlier (higher-scored) boxes prune
        prune_ref[:, :] = jnp.where(col_ids < row_ids, p, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nms_threshold", "temperature", "pruning_method",
                     "shift", "interpret"))
def fused_iou_prune(boxes, valid_mask=None, *, nms_threshold=0.4,
                    temperature=0.1, pruning_method="linear", shift=0.0,
                    interpret=False):
    """boxes [N, 4] (score-sorted) -> (iou [N, N], prune [N, N]).

    ``valid_mask`` zeroes padded rows/cols of both outputs.
    """
    n = boxes.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    coords = jnp.pad(boxes.astype(jnp.float32).T, ((0, 0), (0, n_pad - n)))

    grid = (n_pad // _TILE, n_pad // _TILE)
    kernel = _make_kernel(n_pad, nms_threshold, temperature, pruning_method,
                          shift)
    iou, prune = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, _TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(coords, coords)

    iou = iou[:n, :n]
    prune = prune[:n, :n]
    if valid_mask is not None:
        vv = valid_mask[:, None] & valid_mask[None, :]
        iou = jnp.where(vv, iou, 0.0)
        prune = jnp.where(vv, prune, 0.0)
    return iou, prune


# ---------------------------------------------------------------------------
# fused head scoring
# ---------------------------------------------------------------------------

def _score_kernel(c, with_accept):
    def kernel(*refs):
        if with_accept:
            x_ref, a_ref, out_ref = refs
        else:
            x_ref, out_ref = refs
        x = x_ref[:].astype(jnp.float32)          # (B, BLK, per)
        logits = x[:, :, :c]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.max(e[:, :, 1:], axis=-1) / jnp.sum(e, axis=-1)
        if with_accept:
            s = s * a_ref[:]
        out_ref[:] = s
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "interpret"))
def fused_head_scores(fused, accept=None, *, num_classes, interpret=False):
    """Detection score (max fg softmax x optional acceptance) per anchor.

    ``fused`` [B, R, per] is the RPN head's raw fused tensor (compute dtype,
    class logits in channels [0, num_classes)); ``accept`` [B, R] f32 or
    None.  Returns [B, R] f32 == ``max(softmax(logits)[1:]) * accept``.

    One VMEM pass: the XLA lowering of the same math materializes two
    [B, R, C] f32 intermediates whose tiny minor dims use 4 of 128 tile
    lanes (profiled at 1.9 ms/batch-8 for R=126k on v5e); here the only HBM
    traffic is one read of ``fused`` and one [B, R] write.
    """
    b, r, per = fused.shape
    # full-batch blocks, 1D grid over the roi axis; the lane dim of the out
    # block must be 128-divisible, the sublane dim is the full batch.
    # blk is kept moderate: ``per`` sits on the lane axis and is padded to
    # 128 lanes in VMEM, so a block occupies b*blk*128*dtype bytes on chip
    # (HBM traffic is still only the real b*blk*per bytes).
    blk = min(2048, -(-r // 512) * 512)
    grid = (-(-r // blk),)
    in_specs = [pl.BlockSpec((b, blk, per), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM)]
    args = [fused]
    if accept is not None:
        in_specs.append(pl.BlockSpec((b, blk), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(accept.astype(jnp.float32))
    return pl.pallas_call(
        _score_kernel(num_classes, accept is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, blk), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r), jnp.float32),
        # f32 temps are lane-padded (per -> 128), so the scoped stack runs
        # ~b*blk*128*4 bytes per live temp -- well past the 16M default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# batched greedy NMS
# ---------------------------------------------------------------------------

def _nms_kernel(n, t, thr, shift):
    n_tiles = n // t

    def kernel(coords_ref, scores_ref, keep_ref):
        x1 = coords_ref[0, 0, :]
        y1 = coords_ref[0, 1, :]
        x2 = coords_ref[0, 2, :]
        y2 = coords_ref[0, 3, :]
        area = (x2 - x1 + shift) * (y2 - y1 + shift)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
        tri = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 0) <
               jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
               ).astype(jnp.float32)
        # all mask algebra in f32 (Mosaic can't reshape i1 vectors), and
        # keep doubles as the alive set for not-yet-finalized tiles
        keep_ref[0, 0, :] = (scores_ref[0, 0, :] > 0.0).astype(jnp.float32)

        def tile_body(ti, _):
            s = ti * t
            # tile coords re-read through the ref (Mosaic lowers dynamic
            # slices of REFS, not of values)
            tx1 = coords_ref[0, 0, pl.ds(s, t)].reshape(t, 1)
            ty1 = coords_ref[0, 1, pl.ds(s, t)].reshape(t, 1)
            tx2 = coords_ref[0, 2, pl.ds(s, t)].reshape(t, 1)
            ty2 = coords_ref[0, 3, pl.ds(s, t)].reshape(t, 1)
            ta = (tx2 - tx1 + shift) * (ty2 - ty1 + shift)
            iw = jnp.maximum(
                jnp.minimum(tx2, x2[None, :]) -
                jnp.maximum(tx1, x1[None, :]) + shift, 0.0)
            ih = jnp.maximum(
                jnp.minimum(ty2, y2[None, :]) -
                jnp.maximum(ty1, y1[None, :]) + shift, 0.0)
            inter = iw * ih
            over = (inter / jnp.maximum(ta + area[None, :] - inter, 1e-12)
                    > thr).astype(jnp.float32)                 # [t, n]
            # suppression by kept boxes in earlier (finalized) tiles
            prev = keep_ref[0, 0, :] * (col < s).astype(jnp.float32)
            sup = jnp.sum(over * prev[None, :], axis=1)
            tv = (scores_ref[0, 0, pl.ds(s, t)] > 0.0).astype(jnp.float32)
            alive0 = tv * (sup <= 0.0).astype(jnp.float32)     # [t]
            # within-tile fixpoint of the greedy recurrence; tile-vs-tile
            # overlaps recomputed directly (cheaper than slicing `over`)
            siw = jnp.maximum(
                jnp.minimum(tx2, tx2.reshape(1, t)) -
                jnp.maximum(tx1, tx1.reshape(1, t)) + shift, 0.0)
            sih = jnp.maximum(
                jnp.minimum(ty2, ty2.reshape(1, t)) -
                jnp.maximum(ty1, ty1.reshape(1, t)) + shift, 0.0)
            sinter = siw * sih
            over_tt = (sinter / jnp.maximum(
                ta + ta.reshape(1, t) - sinter, 1e-12)
                > thr).astype(jnp.float32) * tri

            def cond(state):
                return state[1]

            def body(state):
                a, _ = state
                sup_in = jnp.sum(over_tt * a.reshape(t, 1), axis=0)
                a_new = alive0 * (sup_in <= 0.0).astype(jnp.float32)
                return a_new, jnp.any(a_new != a)

            a, _ = jax.lax.while_loop(cond, body,
                                      (alive0, jnp.array(True)))
            keep_ref[0, 0, pl.ds(s, t)] = a
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nms_threshold", "shift", "tile",
                                    "interpret"))
def greedy_nms_pallas(boxes, scores, *, nms_threshold=0.4, shift=1.0,
                      tile=256, interpret=False):
    """Batched exact greedy NMS; rows must be score-sorted per image.

    boxes [B, N, 4], scores [B, N] (rows with score <= 0 are padding) ->
    keep [B, N] bool.  Identical keep set to
    :func:`~groomed_nms_tpu.ops.nms.greedy_nms_blocked` per image: tiles
    are finalized in order, cross-tile suppression is one [t, N] pass and
    the within-tile greedy recurrence iterates to fixpoint -- but the whole
    image (boxes, IoU tiles, alive set) stays in VMEM and the batch rides
    the grid, replacing 2.3 ms of XLA while-loop overhead per batch-8.
    """
    b, n, _ = boxes.shape
    n_pad = -(-n // tile) * tile
    coords = jnp.moveaxis(boxes.astype(jnp.float32), -1, 1)   # [B, 4, N]
    coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad - n)))
    sc = jnp.pad(scores.astype(jnp.float32),
                 ((0, 0), (0, n_pad - n)))[:, None, :]
    keep = pl.pallas_call(
        _nms_kernel(n_pad, min(tile, n_pad), nms_threshold, shift),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        interpret=interpret,
    )(coords, sc)
    return keep[:, 0, :n] > 0.5
