"""Batched 3D detection inference -- one XLA program per batch.

Capability match for the reference's ``im_detect_3d`` + ``test_kitti_3d_old``
(lib/rpn_util.py:1052-1487), re-designed TPU-first:

* the reference runs batch-1 with five device<->host round trips per image
  (decode on device, sort/top-k in numpy, CUDA NMS, numpy hstack, host clip);
  here the full pipeline -- forward, decode, de-normalisation, closed-form
  P2^-1 backprojection, decomp-alpha orientation selection, score fusion with
  the acceptance probability, top-k pre-NMS, classical greedy NMS *or*
  GrooMeD-NMS, and top-k post-NMS -- is a single jitted function over a
  whole image batch.  Only the final KITTI txt formatting is host-side.

* outputs are fixed-shape [B, topN_post, 17] + validity mask; padded rows
  have score 0.

Detection row layout (input-resolution-independent, original image scale):
  [x1, y1, x2, y2, score, cls,
   x2d, y2d, z2d,              (projected 3D center, original pixels)
   w3d, h3d, l3d, alpha,
   x3d, y3d, z3d, ry3d]        (camera frame; y3d at cuboid *center*)
The host writer re-grounds y3d += h3d/2 (reference lib/rpn_util.py:1471).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np

from .ops.boxes import bbox_transform_inv
from .ops.geometry import alpha_to_rot_y, rot_y_to_alpha, snap_to_pi, \
    get_corners_of_cuboid
from .ops.groomed_nms import differentiable_nms
from .ops.iou import pairwise_iou, iou3d_approximate


@dataclass(frozen=True)
class DetectConfig:
    num_classes: int = 4
    nms_topN_pre: int = 3000
    nms_topN_post: int = 40
    nms_thres: float = 0.4
    score_thres: float = 0.6
    clip_boxes: bool = False
    # NMS flavor: classical greedy (False) or GrooMeD (True)
    use_differentiable_nms: bool = False
    diff_nms_boxes: int = 512           # reference caps at 500
    diff_nms_pruning_method: str = "linear"
    diff_nms_temperature: float = 0.1
    diff_nms_valid_box_prob_threshold: float = 0.3
    diff_nms_group_boxes: bool = True
    diff_nms_mask_group_boxes: bool = True
    diff_nms_group_size: int = 100
    overlap_in_nms: str = "2d"
    # score fusion: use_acceptance_prob_for_nms folds un/accept into the
    # RANKING score (pre-NMS top-k + NMS); use_un_for_score folds it into
    # the WRITTEN score column (reference rpn_util.py:1524-1526 sets
    # score = score*un at decode, and its writer at 1430-1435 skips the
    # second multiply when use_acceptance_prob_for_nms already did)
    use_acceptance_prob_for_nms: bool = True
    use_un_for_score: bool = True
    decomp_alpha: bool = True
    # pre-NMS top-k selection: exact lax.top_k (default) or the TPU-native
    # two-stage approx_max_k. With k=3000 of ~126k anchors the recall target
    # bounds how many *pre-NMS candidates* may be missed -- in practice the
    # final top-40 post-NMS rows are far above the pre-NMS cutoff, so 0.99
    # recall leaves headline detections unchanged (measured identical on the
    # bench fixture; see docs/BENCHMARKS.md)
    use_approx_topk: bool = False
    approx_topk_recall: float = 0.99


NUM_DET_COLS = 17
_N_BOX2D = 4      # matches models/rpn_3d.py fused-head channel order


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_detections(outputs, rois, rois_3d, p2, p2_inv, scale_factor,
                      bbox_means, bbox_stds, cfg: DetectConfig):
    """Decode raw head outputs into per-anchor detection rows.

    Args:
      outputs: dict of head outputs ('prob' [B,R,C], 'bbox_2d', 'bbox_3d',
        optional 'accept_prob'/'uncertainty').
      rois / rois_3d: [R, 5] anchors + [R, P] 3D priors.
      p2 / p2_inv: [B, 4, 4]; scale_factor: [B].

    Returns (dets [B, R, 17], scores [B, R]) in original image coordinates.
    """
    prob = outputs["prob"]
    bbox_2d = outputs["bbox_2d"]
    bbox_3d = outputs["bbox_3d"]
    means = jnp.asarray(bbox_means, jnp.float32)
    stds = jnp.asarray(bbox_stds, jnp.float32)
    b, r, _ = prob.shape

    # rois may be shared across the batch ([R, C]) or pre-gathered per
    # image ([B, K, C], the select_top_pre_nms fast path)
    if rois.ndim == 2:
        rois = rois[None]
    if rois_3d.ndim == 2:
        rois_3d = rois_3d[None]

    coords_2d = bbox_transform_inv(rois[..., :4], bbox_2d,
                                   means=means[:4], stds=stds[:4])
    coords_2d = coords_2d / scale_factor[:, None, None]

    widths = rois[..., 2] - rois[..., 0] + 1.0
    heights = rois[..., 3] - rois[..., 1] + 1.0
    ctr_x = rois[..., 0] + 0.5 * widths
    ctr_y = rois[..., 1] + 0.5 * heights

    if cfg.decomp_alpha:
        stat_idx = jnp.array([4, 5, 6, 7, 8, 9, 11, 12])
    else:
        stat_idx = jnp.array([4, 5, 6, 7, 8, 9, 10])
    dn = bbox_3d[..., :stat_idx.shape[0]] * stds[stat_idx] + means[stat_idx]

    x2d = (dn[..., 0] * widths + ctr_x) / scale_factor[:, None]
    y2d = (dn[..., 1] * heights + ctr_y) / scale_factor[:, None]
    z2d = rois_3d[..., 0] + dn[..., 2]
    w3d = jnp.exp(dn[..., 3]) * rois_3d[..., 1]
    h3d = jnp.exp(dn[..., 4]) * rois_3d[..., 2]
    l3d = jnp.exp(dn[..., 5]) * rois_3d[..., 3]

    if cfg.decomp_alpha:
        rsin = rois_3d[..., 5] + dn[..., 6]
        rcos = rois_3d[..., 6] + dn[..., 7]
        axis_mask = bbox_3d[..., 8] >= 0.5
        head_mask = bbox_3d[..., 9] >= 0.5
        alpha = jnp.where(axis_mask, rsin, rcos)
        alpha = alpha + jnp.where(head_mask, jnp.pi, 0.0)
    else:
        alpha = rois_3d[..., 4] + dn[..., 6]

    # backproject the projected center through P2^-1 (reference
    # lib/rpn_util.py:1205-1215)
    ones = jnp.ones_like(z2d)
    pts = jnp.stack([x2d * z2d, y2d * z2d, z2d, ones], axis=-1)  # [B, R, 4]
    cam = jnp.einsum("bij,brj->bri", p2_inv, pts,
                     precision=jax.lax.Precision.HIGHEST)
    x3d, y3d, z3d = cam[..., 0], cam[..., 1], cam[..., 2]
    ry3d = alpha_to_rot_y(snap_to_pi(alpha), z3d, x3d)
    alpha_out = rot_y_to_alpha(ry3d, z3d, x3d)

    cls_pred = (jnp.argmax(prob[..., 1:], axis=-1) + 1).astype(jnp.float32)
    raw_scores = jnp.max(prob[..., 1:], axis=-1)
    accept = outputs.get("accept_prob")
    if accept is None:
        accept = outputs.get("uncertainty")
    scores = raw_scores
    if cfg.use_acceptance_prob_for_nms and accept is not None:
        scores = raw_scores * accept
    # written column: un-fused iff use_un_for_score (the use_un_for_score=
    # False ablation ranks by the fused score but writes the raw one)
    written = raw_scores * accept \
        if (cfg.use_un_for_score and accept is not None) else raw_scores

    dets = jnp.stack([
        coords_2d[..., 0], coords_2d[..., 1], coords_2d[..., 2],
        coords_2d[..., 3], written, cls_pred,
        x2d, y2d, z2d, w3d, h3d, l3d, alpha_out,
        x3d, y3d, z3d, ry3d,
    ], axis=-1)
    return dets, scores


def _top_k_indices(scores, k, cfg: DetectConfig):
    """Descending-score index selection for the pre-NMS gather.

    ``use_approx_topk`` swaps exact lax.top_k (a full sort lowering on TPU)
    for lax.approx_max_k, the TPU-native two-stage reduction; indices come
    back in descending-value order either way (aggregate_to_topk=True).
    """
    if cfg.use_approx_topk:
        _, idx = jax.lax.approx_max_k(
            scores, k, recall_target=cfg.approx_topk_recall,
            aggregate_to_topk=True)
        return idx
    _, idx = jax.lax.top_k(scores, k)
    return idx


@functools.partial(jax.jit, static_argnames=("cfg",))
def select_top_pre_nms(outputs, rois, rois_3d, cfg: DetectConfig):
    """Gather the top ``nms_topN_pre`` rois per image BEFORE decoding.

    Scores (max fg prob, fused with the acceptance probability) need only
    the class probabilities; the geometric decode is per-roi elementwise, so
    gather-then-decode is exactly decode-then-gather -- but runs on 3k rois
    instead of 127k. Profiled at 8+ ms/batch-8 of elementwise decode work
    removed from the hot path.

    When ``outputs`` carries ``fused_raw`` (the RPN head's [B, R, per] fused
    tensor in compute dtype), scoring and the gather read it directly and the
    f32 per-channel splits happen on the gathered top-k only.  The full-size
    f32 cls/prob/bbox tensors then have no consumers and XLA dead-code-
    eliminates them: materializing [B, 126k, 18] f32 (18-wide minor dim, 2
    of 128 tile lanes used) cost ~4.5 ms/batch-8 in layout copies on v5e.
    Both paths are bit-identical: the f32 casts/softmax/sigmoid commute with
    the gather.

    Returns (gathered outputs dict, rois [B, K, 5], rois_3d [B, K, P]).
    """
    fused = outputs.get("fused_raw")
    accept_full = outputs.get("accept_prob")
    unc_full = outputs.get("uncertainty")

    if fused is not None:
        c = cfg.num_classes
        has_unc = unc_full is not None
        n3d = fused.shape[-1] - c - _N_BOX2D - (1 if has_unc else 0)
        accept = accept_full if accept_full is not None else unc_full
        if not cfg.use_acceptance_prob_for_nms:
            accept = None
        # max fg softmax prob (x acceptance) in ONE VMEM pass over the bf16
        # head tensor: max_i(e_i/s) == max_i(e_i)/s exactly (/s monotone),
        # so no [B, R, C] softmax is ever materialized.
        from .ops.pallas_kernels import fused_head_scores
        scores = fused_head_scores(
            fused, accept, num_classes=c,
            interpret=jax.default_backend() != "tpu")
        k = min(cfg.nms_topN_pre, scores.shape[-1])
        idx = _top_k_indices(scores, k, cfg)               # [B, K]
        sel_f = jnp.take_along_axis(fused, idx[..., None],
                                    axis=1).astype(jnp.float32)
        cls_k = sel_f[..., :c]
        b3 = sel_f[..., c + _N_BOX2D:c + _N_BOX2D + n3d]
        b3 = jnp.concatenate([b3[..., :8], jax.nn.sigmoid(b3[..., 8:10]),
                              b3[..., 10:]], axis=-1)
        sel = {"prob": jax.nn.softmax(cls_k, axis=-1),
               "bbox_2d": sel_f[..., c:c + _N_BOX2D], "bbox_3d": b3}
        if has_unc:
            sel["uncertainty"] = jax.nn.sigmoid(sel_f[..., c + _N_BOX2D
                                                      + n3d])
        if accept_full is not None:
            sel["accept_prob"] = jnp.take_along_axis(accept_full, idx,
                                                     axis=1)
        return sel, rois[idx], rois_3d[idx]

    prob = outputs["prob"]
    scores = jnp.max(prob[..., 1:], axis=-1)
    accept = accept_full if accept_full is not None else unc_full
    if cfg.use_acceptance_prob_for_nms and accept is not None:
        scores = scores * accept
    k = min(cfg.nms_topN_pre, scores.shape[-1])
    idx = _top_k_indices(scores, k, cfg)                   # [B, K]

    def take(x):
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)

    sel = {"prob": take(prob), "bbox_2d": take(outputs["bbox_2d"]),
           "bbox_3d": take(outputs["bbox_3d"])}
    for key in ("accept_prob", "uncertainty"):
        if outputs.get(key) is not None:
            sel[key] = take(outputs[key])
    return sel, rois[idx], rois_3d[idx]


def im_detect_3d(outputs, rois, rois_3d, p2, p2_inv, scale_factor,
                 bbox_means, bbox_stds, cfg: DetectConfig):
    """Fused batched detection: top-k gather -> decode -> NMS -> top-k.

    Same results as decode_detections + nms_and_topk on the full roi set
    (the reference's im_detect_3d pipeline, lib/rpn_util.py:1052-1356), with
    the elementwise decode restricted to the pre-NMS top-k.
    """
    sel, sel_rois, sel_rois_3d = select_top_pre_nms(outputs, rois, rois_3d,
                                                    cfg)
    dets, scores = decode_detections(sel, sel_rois, sel_rois_3d, p2, p2_inv,
                                     scale_factor, bbox_means, bbox_stds,
                                     cfg)
    # select_top_pre_nms returns rows in descending score order already
    return nms_and_topk(dets, scores, cfg, presorted=True)


@functools.partial(jax.jit, static_argnames=("cfg", "presorted"))
def nms_and_topk(dets, scores, cfg: DetectConfig, presorted: bool = False):
    """Top-k pre-NMS -> NMS -> top-k post. [B,R,17] -> [B,topN_post,17]+mask.

    ``presorted=True`` skips the initial top-k when rows are already in
    descending score order (the im_detect_3d path, whose pre-NMS gather
    sorted them)."""

    k_pre = min(cfg.nms_topN_pre, scores.shape[1])
    if presorted:
        d = dets[:, :k_pre]
        vals = scores[:, :k_pre]
    else:
        vals, idx = jax.lax.top_k(scores, k_pre)
        d = jnp.take_along_axis(dets, idx[..., None], axis=1)

    if cfg.use_differentiable_nms:

        def per_image(d, vals):
            k = min(cfg.diff_nms_boxes, k_pre)
            d = d[:k]
            vals = vals[:k]
            iou2d = pairwise_iou(d[:, :4], d[:, :4])
            if cfg.overlap_in_nms != "2d":
                corners = get_corners_of_cuboid(
                    d[:, 13], d[:, 14], d[:, 15], d[:, 9], d[:, 10],
                    d[:, 11], d[:, 16])
                _, g3d = iou3d_approximate(corners, corners, pairwise=True,
                                           generalized=True)
                g3d = 0.5 * (1.0 + g3d)
                overlaps = g3d if cfg.overlap_in_nms == "3d" else iou2d * g3d
                overlaps = jnp.nan_to_num(overlaps, nan=0.0)
            else:
                overlaps = iou2d
            res = differentiable_nms(
                vals, overlaps,
                nms_threshold=cfg.nms_thres,
                pruning_method=cfg.diff_nms_pruning_method,
                temperature=cfg.diff_nms_temperature,
                valid_box_prob_threshold=cfg.diff_nms_valid_box_prob_threshold,
                group_boxes=cfg.diff_nms_group_boxes,
                mask_group_boxes=cfg.diff_nms_mask_group_boxes,
                group_size=cfg.diff_nms_group_size)
            # rank survivors by the RESCORED non-suppression probability:
            # the reference's keep_inds come back ordered by descending
            # rescored value and the writer truncates to nms_topN_post in
            # that order (lib/groomed_nms.py:120-127, lib/rpn_util.py:1341,
            # 1422) -- ranking by the original score would keep a
            # different top-k whenever >topN_post boxes survive.  The
            # WRITTEN score stays the original (d's score column),
            # matching the reference (scores_new is never folded back).
            return jnp.where(res.keep, res.rescored, -1.0), d

        keep_score, d = jax.vmap(per_image)(d, vals)
    else:
        # exact greedy NMS, whole batch in one VMEM-resident Pallas kernel
        # (replaces the reference's CUDA bitmask kernel + host sweep,
        # lib/nms/nms_kernel.cu:24-144); rows are already score-sorted
        from .ops.pallas_kernels import greedy_nms_pallas
        alive = greedy_nms_pallas(d[..., :4], vals,
                                  nms_threshold=cfg.nms_thres, shift=1.0,
                                  interpret=jax.default_backend() != "tpu")
        keep_score = jnp.where(alive, vals, -1.0)

    k_post = min(cfg.nms_topN_post, keep_score.shape[1])
    post_vals, post_idx = jax.lax.top_k(keep_score, k_post)
    out = jnp.take_along_axis(d, post_idx[..., None], axis=1)
    valid = post_vals > 0
    return out, valid


def rpn_outputs_dict(out):
    """RPNOutputs -> the outputs dict im_detect_3d consumes (incl. the
    fused_raw fast-path tensor when the model provides it)."""
    d = {"prob": out.prob, "bbox_2d": out.bbox_2d, "bbox_3d": out.bbox_3d,
         "accept_prob": out.accept_prob, "uncertainty": out.uncertainty}
    if getattr(out, "fused_raw", None) is not None:
        d["fused_raw"] = out.fused_raw
    return d


def detect_batch(apply_fn, variables, images, rois, rois_3d, p2, p2_inv,
                 scale_factor, bbox_means, bbox_stds, cfg: DetectConfig):
    """Full inference for one preprocessed image batch (convenience driver)."""
    out = apply_fn(variables, images, train=False)
    return im_detect_3d(rpn_outputs_dict(out), rois, rois_3d, p2, p2_inv,
                        scale_factor, bbox_means, bbox_stds, cfg)


@jax.jit
def refine_detections(dets, valid, p2, p2_inv):
    """Post-hoc z/ry hill-climb refinement of final detections.

    Capability match for the reference's ``hill_climb``/``test_projection``
    (lib/rpn_util.py:2254-2349, reachable there only from analysis scripts):
    coordinate-descent on depth and yaw so the projected cuboid matches the
    predicted 2D box.  Batched over images AND boxes (the reference climbs
    one box at a time in a python while loop).

    Only improving steps are ever taken, so the projection-consistency
    objective is monotonically non-decreasing per box; rows whose initial
    projection is invalid (a corner behind the camera) or that are masked
    out by ``valid`` keep their inputs.

    Args: dets [B, K, 17] (decode_detections layout), valid [B, K] bool,
    p2 / p2_inv [B, 4, 4] in the ORIGINAL image frame (dets' x2d/y2d/boxes
    are original-frame).  Returns refined dets with columns z2d, alpha,
    x3d, y3d, z3d, ry3d updated.
    """
    from .ops.refine import hill_climb

    def per_image(d, v, p, pi):
        box2d = jnp.stack([d[:, 0], d[:, 1],
                           d[:, 2] - d[:, 0] + 1.0,
                           d[:, 3] - d[:, 1] + 1.0], axis=-1)
        x2d, y2d, z2d = d[:, 6], d[:, 7], d[:, 8]
        w3d, h3d, l3d, ry3d = d[:, 9], d[:, 10], d[:, 11], d[:, 16]
        z_new, r_new, _ = hill_climb(p, pi, box2d, x2d, y2d, z2d,
                                     w3d, h3d, l3d, ry3d)
        z_new = jnp.where(v, z_new, z2d)
        r_new = jnp.where(v, r_new, ry3d)
        # re-derive the camera-frame center from the refined depth and the
        # (unchanged) projected center, then alpha from the refined yaw
        pts = jnp.stack([x2d * z_new, y2d * z_new, z_new,
                         jnp.ones_like(z_new)], axis=-1)
        cam = jnp.einsum("ij,kj->ki", pi, pts,
                         precision=jax.lax.Precision.HIGHEST)
        alpha = rot_y_to_alpha(r_new, cam[:, 2], cam[:, 0])
        out = d.at[:, 8].set(z_new)
        out = out.at[:, 12].set(alpha)
        out = out.at[:, 13].set(cam[:, 0])
        out = out.at[:, 14].set(cam[:, 1])
        out = out.at[:, 15].set(cam[:, 2])
        out = out.at[:, 16].set(r_new)
        return out

    return jax.vmap(per_image)(dets, valid, p2, p2_inv)


def clip_detections(dets, im_w, im_h):
    """Clip final 2D boxes to the original image (reference
    lib/rpn_util.py:1347-1351, enabled by conf.clip_boxes)."""
    dets = np.array(dets, copy=True)
    dets[:, 0] = np.clip(dets[:, 0], 0, im_w - 1)
    dets[:, 1] = np.clip(dets[:, 1], 0, im_h - 1)
    dets[:, 2] = np.clip(dets[:, 2], 0, im_w - 1)
    dets[:, 3] = np.clip(dets[:, 3], 0, im_h - 1)
    return dets


def write_kitti_detections(path, dets, valid, class_names,
                           score_thres=0.6, classes_to_write=None):
    """Write one image's detections in KITTI result format (host-side).

    Matches the reference writer (lib/rpn_util.py:1437-1480) including the
    load-bearing 6-decimal precision and the ``y3d += h3d/2`` re-grounding.
    ``dets`` rows use the 17-col layout of :func:`decode_detections`.
    """
    dets = np.asarray(dets)
    valid = np.asarray(valid)
    lines = []
    for i in range(dets.shape[0]):
        if not valid[i]:
            continue
        row = dets[i]
        score = row[4]
        cls_idx = int(row[5]) - 1
        if cls_idx < 0 or cls_idx >= len(class_names):
            continue
        cls = class_names[cls_idx]
        if score <= score_thres:
            continue
        if classes_to_write is not None and cls not in classes_to_write:
            continue
        x1, y1, x2, y2 = row[0], row[1], row[2], row[3]
        w3d, h3d, l3d = row[9], row[10], row[11]
        alpha, x3d, y3d, z3d, ry3d = row[12], row[13], row[14], row[15], row[16]
        y3d = y3d + h3d / 2.0
        lines.append(
            f"{cls} -1 -1 {alpha:.6f} {x1:.6f} {y1:.6f} {x2:.6f} {y2:.6f} "
            f"{h3d:.6f} {w3d:.6f} {l3d:.6f} {x3d:.6f} {y3d:.6f} {z3d:.6f} "
            f"{ry3d:.6f} {score:.6f}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def write_kitti_tracks(path, tracks, score_thres=0.6, class_name="Car"):
    """Write one clip's final smoothed tracks in KITTI result format.

    Shared by scripts/test_kalman.py and scripts/serve.py (video
    artifacts).  The fused state X is [x y z w3d h3d l3d theta head vel].
    ``tracks.box2d`` is ALREADY in original-image pixels
    (extract_measurements descales by /scale like the reference's
    clean_and_denorm, models/video.py:91, and the forecast refresh
    projects through the original-resolution P2) and ``tracks.un``
    ALREADY folds the 2D score (un = uncertainty * score, kalman.py:283
    = the reference's tracks.bbox_un,
    models/densenet121_3d_dilate_decomp_alpha_un_kalman.py:353), so both
    are written raw: score = un (the reference's ``use_un_for_score``)
    gated at un > score_thres, boxes undivided -- exactly the reference
    video writer (lib/rpn_util.py:1690-1812).  A review round caught the
    earlier writer dividing box2d by scale again and multiplying the
    score back in (shrunken boxes, squared scores).  ry comes from theta
    plus the heading flip; y is re-grounded by h3d/2.
    """
    valid = np.asarray(tracks.valid)
    xs = np.asarray(tracks.X)
    box2d = np.asarray(tracks.box2d)
    un = np.asarray(tracks.un)
    lines = []
    for ti in np.flatnonzero(valid):
        x, y, z, w3, h3, l3, theta, head, _ = xs[ti]
        ry = theta + (np.pi if head >= 0.5 else 0.0)
        ry = np.arctan2(np.sin(ry), np.cos(ry))
        alpha = float(rot_y_to_alpha(ry, z, x))
        score = un[ti]
        if score <= score_thres:
            continue
        x1, y1, x2, y2 = box2d[ti, :4]
        lines.append(
            f"{class_name} -1 -1 {alpha:.6f} {x1:.6f} {y1:.6f} {x2:.6f} "
            f"{y2:.6f} {h3:.6f} {w3:.6f} {l3:.6f} {x:.6f} "
            f"{y + h3 / 2:.6f} {z:.6f} {ry:.6f} {score:.6f}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
