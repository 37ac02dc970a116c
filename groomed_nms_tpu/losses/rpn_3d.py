"""Master RPN 3D loss with GrooMeD-NMS in the loop -- one jitted function.

Capability match for the reference's ``RPN_3D_loss`` (lib/loss/rpn_3d.py:17-
1409).  The reference interleaves per-image numpy target assignment, host
index lists, and torch ops; here the whole loss is a single fixed-shape JAX
function: batched target assignment (vmapped ``compute_targets``), mask-based
fg/bg sampling (rank-by-sort instead of index lists), top-k gathers for the
fixed-size GrooMeD-NMS subset, and per-image AP ranking losses via ``vmap``.

Semantics preserved from the reference (with file:line):
  * hard-negative sampling: lowest-scored fg/bg first (rpn_3d.py:590-608);
  * global fg/bg class reweighting fg_fraction/(1-ff) * bg/fg
    (rpn_3d.py:929-938) and optional focal reweight (rpn_3d.py:945-961);
  * CE clamp to [0, 2000] (rpn_3d.py:993);
  * closed-form P2 inversion for raw camera coords (rpn_3d.py:536-559);
  * decomp-alpha rot selection by axis/head labels (rpn_3d.py:561-574);
  * GrooMeD-NMS on the top-``max_nms_boxes`` sampled fg by score with
    detached overlaps (rpn_3d.py:721-793);
  * after-NMS best-box targets 0.5*(1+GIoU3D)*IoU2D > beta (rpn_3d.py:796-825);
  * after-NMS classify/rank/regress losses (rpn_3d.py:1091-1148);
  * acceptance-prob classify/rank/regress/likelihood losses (rpn_3d.py:1033-1086);
  * smooth-L1 2D/3D regression with sin/cos selection + BCE axis/head
    (rpn_3d.py:1163-1373), optional GT-IoU3D / acceptance-prob weighting;
  * self-balancing uncertainty running-average lambda (rpn_3d.py:1323-1382),
    carried functionally in :class:`UncertaintyState`;
  * -log(IoU2D) loss (rpn_3d.py:1395-1405).

Known intentional divergences (documented, all beyond-parity or pad-driven):
  * the NMS subset is 512 boxes (power-of-two tile) vs the reference's 500;
  * the per-image AP loss ranks the top ``max_ap_boxes`` sampled-fg anchors
    instead of all of them (fg counts above 1024 are truncated; the dropped
    anchors are zero-score zero-target negatives);
  * background-image sampling uses the same formula as foreground images
    (the reference's bg-image branch rounds 0.2*0.8 to 0 samples,
    rpn_3d.py:630 -- a quirk we do not reproduce).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..anchors import compute_targets
from ..ops.boxes import bbox_transform_inv
from ..ops.geometry import alpha_to_rot_y, get_corners_of_cuboid, snap_to_pi
from ..ops.groomed_nms import differentiable_nms
from ..ops.iou import elementwise_iou, iou3d_approximate, pairwise_iou
from .aploss import ap_loss


class UncertaintyState(NamedTuple):
    """Running-average lambda for the self-balancing confidence term."""

    lam: jnp.ndarray   # scalar f32
    n: jnp.ndarray     # scalar i32 frame counter (capped at 100)

    @staticmethod
    def init():
        return UncertaintyState(lam=jnp.zeros(()), n=jnp.zeros((), jnp.int32))


class GTBatch(NamedTuple):
    """Padded per-batch ground truth (G = max GTs, I = max ignore regions)."""

    gts_2d: jnp.ndarray     # [B, G, 4] valid GT corner boxes (image scale)
    gts_3d: jnp.ndarray     # [B, G, 16] imdb bbox_3d rows
    gt_labels: jnp.ndarray  # [B, G] class ids >= 1
    gt_valid: jnp.ndarray   # [B, G] bool
    ign_2d: jnp.ndarray     # [B, I, 4]
    ign_valid: jnp.ndarray  # [B, I] bool
    p2: jnp.ndarray         # [B, 4, 4] camera projection
    scale: jnp.ndarray      # [B] image scale factor


@dataclass(frozen=True)
class LossConfig:
    num_classes: int = 4
    # sampling (reference conf: scripts/config/groumd_nms.py:116-124)
    fg_fraction: float = 0.2
    box_samples: float = 0.2          # <=0 means "all boxes"
    hard_negatives: bool = True
    focal_loss: float = 0.0
    fg_thresh: float = 0.5
    ign_thresh: float = 0.5
    bg_thresh_lo: float = 0.0
    bg_thresh_hi: float = 0.5
    best_thresh: float = 0.35
    # lambdas
    cls_2d_lambda: float = 1.0
    iou_2d_lambda: float = 1.0
    bbox_2d_lambda: float = 0.0
    bbox_3d_lambda: float = 1.0
    bbox_axis_head_lambda: float = 0.35
    decomp_alpha: bool = True
    # GrooMeD-NMS in loss
    use_nms_in_loss: bool = False
    nms_thres: float = 0.4
    diff_nms_pruning_method: str = "linear"
    diff_nms_temperature: float = 0.1
    diff_nms_valid_box_prob_threshold: float = 0.3
    diff_nms_group_boxes: bool = True
    diff_nms_mask_group_boxes: bool = True
    diff_nms_group_size: int = 100
    after_nms_lambda: float = 0.05
    after_nms_loss_mode: str = "rank"     # classify | rank | regress
    rank_boxes_of_all_images_at_once: bool = False
    overlap_in_nms: str = "2d"            # 2d | 3d | product
    best_target_box_beta: float = 0.3
    rank_with_class_confidence: bool = False
    # acceptance probability
    predict_acceptance_prob: bool = False
    acceptance_prob_lambda: float = 0.0
    acceptance_prob_mode: str = "likelihood"  # classify|rank|regress|likelihood
    # classify mode: bins-1 ordinal binary classifiers over IoU3D-to-target
    # boundaries (Kim et al. ordinal classification), or top-sort_K-vs-rest
    # when sort_K > 0 with a single classifier.  Reference
    # lib/loss/rpn_3d.py:647-705 (targets) and 1040-1043 (weighted BCE).
    acceptance_prob_classify_bins: int = 2
    acceptance_prob_classify_sort_K: int = 0
    bins_boundary: tuple = (0.5,)
    # which boxes the acceptance loss trains on (rpn_3d.py:1005-1016):
    # 'foregrounds' = sampled fg anchors (every shipped config);
    # 'overlaps' = anchors with max 2D IoU vs any GT > overlap_thres
    # (rpn_3d.py:650-651); 'all' = every anchor, L1 weighted by the
    # sampled cls weights (rpn_3d.py:1007,1059-1060).
    boxes_for_acceptance_prob: str = "foregrounds"
    acceptance_prob_overlap_thres: float = 0.01
    use_acceptance_prob_in_regression_loss: bool = False
    weigh_acceptance_prob_regularization: bool = False
    weigh_3D_regression_loss_by_gt_iou3d: bool = False
    # velocity regression (the kalman/video variant). The released
    # reference computes dvel targets + stats (lib/rpn_util.py:633-655,
    # 794-840) and decodes the channel at inference
    # (..._un_kalman.py:207-212) but ships with the loss term disabled
    # (lib/loss/rpn_3d.py:186 hardcodes has_vel=False); here the term is a
    # working knob. Requires bbox_means/stds with 14 columns (col 13 = vel).
    has_vel: bool = False
    # uncertainty (the `_un` variant / self-balancing scheme)
    has_un: bool = False
    bbox_un_lambda: float = 0.0
    bbox_un_dynamic: bool = False
    # fixed sizes for jit
    max_nms_boxes: int = 512
    max_ap_boxes: int = 1024

    def __post_init__(self):
        # the velocity column layout (t3d col 9 / bbox_3d col 10) exists
        # only under decomp_alpha -- bbox_transform_3d appends dvel after
        # the sin/cos pair; fail early with a clear message instead of an
        # opaque out-of-bounds slice at trace time
        if self.has_vel and not self.decomp_alpha:
            raise ValueError("has_vel=True requires decomp_alpha=True "
                             "(velocity targets are laid out after the "
                             "alpha sin/cos columns)")
        if self.boxes_for_acceptance_prob not in (
                "foregrounds", "overlaps", "all"):
            raise ValueError(
                f"boxes_for_acceptance_prob="
                f"{self.boxes_for_acceptance_prob!r}: expected "
                "'foregrounds', 'overlaps' or 'all'")
        if self.predict_acceptance_prob and self.acceptance_prob_lambda:
            if self.acceptance_prob_mode == "classify":
                n_cls = self.acceptance_prob_classify_bins - 1
                if n_cls < 1:
                    raise ValueError(
                        "acceptance_prob_classify_bins must be >= 2")
                sort_k = self.acceptance_prob_classify_sort_K
                if sort_k > 0 and n_cls != 1:
                    # the top-K-positives split is only defined for ONE
                    # binary classifier (reference rpn_3d.py:688-696 is
                    # bins=2-only); silently training boundary mode
                    # instead would contradict what the config asked for
                    raise ValueError(
                        "acceptance_prob_classify_sort_K > 0 requires "
                        f"bins=2 (one classifier); got bins="
                        f"{self.acceptance_prob_classify_bins}")
                if sort_k == 0 and len(self.bins_boundary) != n_cls:
                    raise ValueError(
                        f"bins_boundary needs {n_cls} entries (bins-1) for "
                        f"ordinal classify, got {len(self.bins_boundary)}")


def _smooth_l1(x, t):
    d = jnp.abs(x - t)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _bce(p, t, eps=1e-7):
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


def _masked_mean(x, mask):
    """Mean of x over mask & isfinite(x); 0 if the set is empty."""
    ok = mask & jnp.isfinite(x)
    cnt = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(jnp.where(ok, x, 0.0)) / cnt


def _rank_ascending(key):
    """rank[i] = position of element i when sorting key ascending. [R]->[R]."""
    order = jnp.argsort(key, stable=True)
    return jnp.zeros(key.shape, jnp.int32).at[order].set(
        jnp.arange(key.shape[0], dtype=jnp.int32))


def _select_lowest(mask, score, num):
    """Boolean-select the `num` lowest-scored elements of `mask` (hard mining)."""
    key = jnp.where(mask, score, jnp.inf)
    rank = _rank_ascending(key)
    return mask & (rank < num)


@functools.partial(jax.jit, static_argnames=("cfg",))
def rpn_3d_loss(outputs, rois, rois_3d, batch: GTBatch, bbox_means, bbox_stds,
                un_state: UncertaintyState, cfg: LossConfig):
    """Compute total loss + stats for one batch.

    Args:
      outputs: dict with 'cls' [B,R,C], 'prob' [B,R,C], 'bbox_2d' [B,R,4],
        'bbox_3d' [B,R,10], optional 'accept_prob' [B,R], 'uncertainty' [B,R].
      rois: [R, 5] anchor boxes + tracker (static for a feat size).
      rois_3d: [R, P] per-anchor 3D priors gathered by tracker.
      batch: padded ground truth.
      bbox_means / bbox_stds: [13] target normalisation (2D 0:4, 3D 4:13).
      un_state: self-balancing lambda carry.
      cfg: static :class:`LossConfig`.

    Returns (loss, stats_dict, new_un_state).
    """
    cls = outputs["cls"]
    prob = outputs["prob"]
    bbox_2d = outputs["bbox_2d"]
    bbox_3d = outputs["bbox_3d"]
    accept_prob = outputs.get("accept_prob")
    accept_cls = outputs.get("accept_cls")   # [B,R,bins-1] classify mode
    if accept_prob is None and cfg.has_un:
        accept_prob = outputs.get("uncertainty")
    if accept_prob is not None:
        accept_prob = jnp.clip(accept_prob, 0.0005, 1.0)

    b, r, _ = cls.shape
    means = jnp.asarray(bbox_means, jnp.float32)
    stds = jnp.asarray(bbox_stds, jnp.float32)
    stats = {}

    # ------------------------------------------------------------------
    # target assignment (vmapped over batch), then mean/std normalisation
    # ------------------------------------------------------------------
    tgt = jax.vmap(
        lambda g2, g3, gl, gv, i2, iv: compute_targets(
            rois, rois_3d, g2, g3, gl, gv, i2, iv,
            fg_thresh=cfg.fg_thresh, ign_thresh=cfg.ign_thresh,
            bg_thresh_lo=cfg.bg_thresh_lo, bg_thresh_hi=cfg.bg_thresh_hi,
            best_thresh=cfg.best_thresh, decomp_alpha=cfg.decomp_alpha,
            has_vel=cfg.has_vel)
    )(batch.gts_2d, batch.gts_3d, batch.gt_labels, batch.gt_valid,
      batch.ign_2d, batch.ign_valid)

    fg = tgt.fg_mask                       # [B, R]
    bg = tgt.bg_mask
    label_int = jnp.where(fg, tgt.labels.astype(jnp.int32), 0)

    t2d_n = (tgt.transforms_2d - means[:4]) / stds[:4]
    n3d = (9 if cfg.decomp_alpha else 7) + (1 if cfg.has_vel else 0)
    t3d_n = (tgt.transforms_3d[..., :n3d] - means[4:4 + n3d]) / stds[4:4 + n3d]

    # ------------------------------------------------------------------
    # fg/bg sampling with hard negatives (scores = prob of assigned label)
    # ------------------------------------------------------------------
    # class-axis select via one-hot multiply-reduce: take_along_axis over a
    # 4-wide minor dim lowered to ~7 ms/step of XLA gathers under jvp
    label_onehot = (label_int[..., None] == jnp.arange(
        cls.shape[-1], dtype=jnp.int32)).astype(jnp.float32)   # [B, R, C]
    score_of_label = jnp.sum(
        jax.lax.stop_gradient(prob) * label_onehot, axis=-1)

    n_fg = jnp.sum(fg, axis=1)             # [B]
    n_bg = jnp.sum(bg, axis=1)
    if cfg.box_samples and cfg.box_samples > 0:
        want_fg = jnp.minimum(
            jnp.round(r * cfg.box_samples * cfg.fg_fraction).astype(jnp.int32),
            n_fg)
        want_bg = jnp.minimum(
            jnp.round(r * cfg.box_samples).astype(jnp.int32) - want_fg, n_bg)
    else:
        want_fg, want_bg = n_fg, n_bg

    if cfg.hard_negatives:
        fg_sel = jax.vmap(_select_lowest)(fg, score_of_label, want_fg)
        bg_sel = jax.vmap(_select_lowest)(bg, score_of_label, want_bg)
    else:
        # deterministic fallback (first-k); reference uses np.random.choice,
        # but every shipped config sets hard_negatives=True.
        fg_sel = jax.vmap(_select_lowest)(fg, jnp.zeros_like(score_of_label),
                                          want_fg)
        bg_sel = jax.vmap(_select_lowest)(bg, jnp.zeros_like(score_of_label),
                                          want_bg)

    active = fg_sel | bg_sel
    fg_num = jnp.sum(fg_sel)
    bg_num = jnp.sum(bg_sel)

    # global class re-weighting (reference rpn_3d.py:929-938)
    fg_weight = jnp.where(
        fg_num > 0,
        (cfg.fg_fraction / (1 - cfg.fg_fraction)) * (bg_num / jnp.maximum(fg_num, 1)),
        0.0)
    labels_weight = jnp.where(fg_sel, fg_weight, 0.0) + jnp.where(bg_sel, 1.0, 0.0)
    if cfg.focal_loss:
        labels_weight = labels_weight * jnp.where(
            active, (1.0 - score_of_label) ** cfg.focal_loss, 1.0)

    # ------------------------------------------------------------------
    # decode predictions
    # ------------------------------------------------------------------
    coords_2d = bbox_transform_inv(rois[None, :, :4], bbox_2d,
                                   means=means[:4], stds=stds[:4])
    coords_2d_tar = bbox_transform_inv(rois[None, :, :4], t2d_n,
                                       means=means[:4], stds=stds[:4])

    widths = rois[:, 2] - rois[:, 0] + 1.0
    heights = rois[:, 3] - rois[:, 1] + 1.0
    ctr_x = rois[:, 0] + 0.5 * widths
    ctr_y = rois[:, 1] + 0.5 * heights

    # de-normalisation indices into the 13-col means/stds vector.  In decomp
    # mode the model's bbox_3d cols are [x y z w h l rsin rcos axis head]
    # (no plain-rot channel, like the reference which feeds the same alpha
    # conv output to both sin (stats col 11) and cos (stats col 12) decodes).
    if cfg.decomp_alpha:
        stat_idx = jnp.array([4, 5, 6, 7, 8, 9, 11, 12])
    else:
        stat_idx = jnp.array([4, 5, 6, 7, 8, 9, 10])
    dn = bbox_3d[..., :stat_idx.shape[0]] * stds[stat_idx] + means[stat_idx]
    x2d_dn = dn[..., 0] * widths + ctr_x          # projected center (512 px)
    y2d_dn = dn[..., 1] * heights + ctr_y
    z2d_dn = rois_3d[:, 0] + dn[..., 2]
    w3d_raw = jnp.exp(dn[..., 3]) * rois_3d[:, 1]
    h3d_raw = jnp.exp(dn[..., 4]) * rois_3d[:, 2]
    l3d_raw = jnp.exp(dn[..., 5]) * rois_3d[:, 3]
    if cfg.decomp_alpha:
        rsin_dn = rois_3d[:, 5] + dn[..., 6]
        rcos_dn = rois_3d[:, 6] + dn[..., 7]
        rot_dn = None
    else:
        rot_dn = rois_3d[:, 4] + dn[..., 6]

    # closed-form P2 inversion (reference rpn_3d.py:536-559)
    p2 = batch.p2
    p2a, p2b, p2c = p2[:, 0, 0], p2[:, 0, 2], p2[:, 0, 3]
    p2d, p2e, p2f = p2[:, 1, 1], p2[:, 1, 2], p2[:, 1, 3]
    p2h = p2[:, 2, 3]
    scale = batch.scale[:, None]
    x2d_full = x2d_dn / scale
    y2d_full = y2d_dn / scale
    z3d_raw = z2d_dn - p2h[:, None]
    x3d_raw = ((z3d_raw + p2h[:, None]) * x2d_full - p2b[:, None] * z3d_raw
               - p2c[:, None]) / p2a[:, None]
    y3d_raw = ((z3d_raw + p2h[:, None]) * y2d_full - p2e[:, None] * z3d_raw
               - p2f[:, None]) / p2d[:, None]

    raw3 = tgt.raw_gt_3d                            # [B, R, 16]
    axis_tar = raw3[..., 14]
    head_tar = raw3[..., 15]
    if cfg.decomp_alpha:
        rot_raw = jnp.where(axis_tar == 1, rsin_dn, rcos_dn)
        rot_raw = rot_raw + jnp.where(head_tar == 1, math.pi, 0.0)
    else:
        rot_raw = rot_dn
    rot_raw_snap = snap_to_pi(jax.lax.stop_gradient(rot_raw))
    ry3d_raw = alpha_to_rot_y(rot_raw_snap,
                              jax.lax.stop_gradient(z3d_raw),
                              jax.lax.stop_gradient(x3d_raw))

    # the raw 3D branch only feeds detached targets/overlaps downstream
    x3d_raw_d = jax.lax.stop_gradient(x3d_raw)
    y3d_raw_d = jax.lax.stop_gradient(y3d_raw)
    z3d_raw_d = jax.lax.stop_gradient(z3d_raw)
    w3d_raw_d = jax.lax.stop_gradient(w3d_raw)
    h3d_raw_d = jax.lax.stop_gradient(h3d_raw)
    l3d_raw_d = jax.lax.stop_gradient(l3d_raw)

    # raw GT camera-frame targets (bbox_3d row layout, imdb convention)
    x3d_tar, y3d_tar, z3d_tar = raw3[..., 7], raw3[..., 8], raw3[..., 9]
    w3d_tar, h3d_tar, l3d_tar = raw3[..., 3], raw3[..., 4], raw3[..., 5]
    ry3d_tar, alpha_tar = raw3[..., 10], raw3[..., 6]

    total = jnp.zeros(())

    # ------------------------------------------------------------------
    # classification loss (reference rpn_3d.py:976-1001)
    # ------------------------------------------------------------------
    if cfg.cls_2d_lambda:
        logp = jax.nn.log_softmax(cls, axis=-1)
        # where-masked (not multiplied): an underflowed logp of -inf on a
        # non-label class would turn 0 * -inf into NaN
        ce = -jnp.sum(jnp.where(label_onehot > 0, logp, 0.0), axis=-1)
        ce = jnp.clip(ce * labels_weight, 0.0, 2000.0)
        loss_cls = _masked_mean(ce, active) * cfg.cls_2d_lambda
        total = total + loss_cls
        stats["cls"] = loss_cls

        cls_pred = jnp.argmax(jax.lax.stop_gradient(cls), axis=-1)
        stats["acc_fg"] = _masked_mean(
            (cls_pred == label_int).astype(jnp.float32), fg)
        stats["acc_bg"] = _masked_mean((cls_pred == 0).astype(jnp.float32), bg)

    # ------------------------------------------------------------------
    # acceptance-prob targets: elementwise IoU3D(pred, assigned GT) on fg
    # (reference rpn_3d.py:646-705, "foregrounds" mode)
    # ------------------------------------------------------------------
    # (the NMS-in-loss branch computes its own after-NMS targets inside
    # per_image and never reads accept_tar, so use_nms_in_loss alone does
    # not require this block)
    need_accept_tar = (cfg.predict_acceptance_prob or
                       cfg.weigh_3D_regression_loss_by_gt_iou3d)
    accept_tar = jnp.zeros((b, r))
    if need_accept_tar:
        cp = get_corners_of_cuboid(x3d_raw_d, y3d_raw_d, z3d_raw_d,
                                   w3d_raw_d, h3d_raw_d, l3d_raw_d, ry3d_raw)
        ct = get_corners_of_cuboid(x3d_tar, y3d_tar, z3d_tar,
                                   w3d_tar, h3d_tar, l3d_tar, ry3d_tar)
        flat = lambda c: c.reshape((-1,) + c.shape[-2:])
        _, iou3d_el = iou3d_approximate(flat(cp), flat(ct), pairwise=False)
        # dense on ALL fg anchors (not just sampled): the reference fills
        # raw_gt only for compute_targets' fg_inds (rpn_util.py:461-475),
        # so non-fg rows carry a zero GT cuboid whose IoU3D is 0; read
        # sites mask by the mode's active set.
        accept_tar = jnp.where(fg, iou3d_el.reshape(b, r), 0.0)
        accept_tar = jnp.nan_to_num(accept_tar, nan=0.0, posinf=0.0, neginf=0.0)

    if cfg.predict_acceptance_prob and cfg.acceptance_prob_lambda and \
            (accept_prob is not None or accept_cls is not None):
        # active set (reference rpn_3d.py:647-659, 1005-1016).  'all' is
        # implemented per-image-correct: the reference's flattened
        # arange(R) index set covers only image 0's rows for batch > 1
        # (rpn_3d.py:1007 after the view(-1) at 970), a bug we do not
        # reproduce; its batch=1 semantics (every anchor active, L1
        # weighted by the sampled cls weights) generalize per image.
        if cfg.boxes_for_acceptance_prob == "overlaps":
            accept_sel = tgt.ols_max > cfg.acceptance_prob_overlap_thres
        elif cfg.boxes_for_acceptance_prob == "all":
            accept_sel = jnp.ones((b, r), bool)
        else:
            accept_sel = fg_sel
        if cfg.acceptance_prob_mode == "classify":
            if accept_cls is None:
                raise ValueError(
                    "acceptance_prob_mode='classify' needs the model's "
                    "accept_cls head (RPNConfig.acceptance_prob_classify_"
                    "bins > 1); these outputs only carry accept_prob")
            # ordinal-bin targets (reference lib/loss/rpn_3d.py:680-705):
            # per image, classifier c splits the sampled-fg boxes at
            # bins_boundary[c] on IoU3D-to-target (or, with sort_K and one
            # classifier, into top-K-by-IoU3D vs rest); positives are
            # re-weighted by the per-image neg/pos count ratio, and the
            # weighted BCE is averaged over every (fg box, classifier) cell
            # of the batch (rpn_3d.py:1040-1043).
            n_cls = cfg.acceptance_prob_classify_bins - 1
            iou_d = jax.lax.stop_gradient(accept_tar)          # [B, R]
            if cfg.acceptance_prob_classify_sort_K > 0 and n_cls == 1:
                def topk_pos(iou_img, sel_img):
                    key = jnp.where(sel_img, iou_img, -jnp.inf)
                    rank_desc = _rank_ascending(-key)
                    return sel_img & \
                        (rank_desc < cfg.acceptance_prob_classify_sort_K)
                pos = jax.vmap(topk_pos)(iou_d, accept_sel)[..., None]
            else:
                bnds = jnp.asarray(cfg.bins_boundary, jnp.float32)
                pos = accept_sel[:, :, None] & (iou_d[..., None] > bnds)
            n_pos = jnp.sum(pos, axis=1).astype(jnp.float32)   # [B, C]
            n_neg = jnp.sum(accept_sel, axis=1).astype(jnp.float32)[:, None] \
                - n_pos
            w_pos = jnp.where(n_neg > 0,
                              n_neg / jnp.maximum(n_pos, 1.0), 1.0)
            bce = _bce(accept_cls, pos.astype(jnp.float32))
            bce = bce * jnp.where(pos, w_pos[:, None, :], 1.0)
            loss_ap = _masked_mean(
                bce, jnp.broadcast_to(accept_sel[:, :, None], bce.shape)) \
                * cfg.acceptance_prob_lambda
        elif cfg.acceptance_prob_mode == "likelihood":
            if cfg.boxes_for_acceptance_prob == "foregrounds":
                lp = -jnp.log(accept_prob)
            else:
                # reference quirk: likelihood degenerates to plain L1 for
                # 'all'/'overlaps' (rpn_3d.py:1060-1068 branches on the
                # box set first, -log only under 'foregrounds')
                lp = jnp.abs(accept_prob - jax.lax.stop_gradient(accept_tar))
        elif cfg.acceptance_prob_mode == "regress":
            lp = jnp.abs(accept_prob - jax.lax.stop_gradient(accept_tar))
        elif cfg.acceptance_prob_mode == "rank":
            # the reference ranks ALL fg boxes of the batch in ONE AP loss
            # over the flattened [B*R] tensors (lib/loss/rpn_3d.py:1014-1016,
            # 1046-1056), optionally folding class confidence into the
            # ranked score; -1 targets mark non-fg boxes invalid for APLoss
            ap_scores = accept_prob
            if cfg.rank_with_class_confidence:
                ap_scores = ap_scores * jnp.max(prob[..., 1:], axis=-1)
            rank_tar = jnp.where(accept_tar >= 0.6, 1.0, 0.0)
            rank_tar = jnp.where(accept_sel, rank_tar, -1.0)
            lp = None
            # only active boxes participate (others get target -1 =
            # ignored), so gather the top max_ap_boxes active per image
            # before ap_loss: our batched AP loss is O(N^2) memory
            # ([N, N] rank terms), and the reference's raw [B*R] flatten
            # (lib/loss/rpn_3d.py:1046-1056) would need ~257 GB at
            # 512x1760.  The cap only binds when an image has more than
            # max_ap_boxes active anchors.
            def gather_rank(sc_img, tar_img, sel_img):
                key = jnp.where(sel_img, sc_img, -jnp.inf)
                _, idx = jax.lax.top_k(key, min(cfg.max_ap_boxes, r))
                valid = jnp.take(key, idx) > -jnp.inf
                return (jnp.where(valid, sc_img[idx], 0.0),
                        jnp.where(valid, tar_img[idx], -1.0))

            sc_b, tar_b = jax.vmap(gather_rank)(ap_scores, rank_tar,
                                                accept_sel)
            loss_ap = ap_loss(sc_b.reshape(-1), tar_b.reshape(-1)) \
                * cfg.acceptance_prob_lambda
        else:
            raise NotImplementedError(cfg.acceptance_prob_mode)
        if cfg.acceptance_prob_mode in ("likelihood", "regress"):
            if cfg.boxes_for_acceptance_prob == "all":
                # 'all' weighs the L1 by the sampled cls weights
                # (rpn_3d.py:1059-1060); unsampled anchors get weight 0
                # but still count in the mean's denominator
                lp = lp * jax.lax.stop_gradient(labels_weight)
            if cfg.weigh_acceptance_prob_regularization:
                lp = lp * jax.lax.stop_gradient(accept_tar)
            loss_ap = _masked_mean(lp, accept_sel) \
                * cfg.acceptance_prob_lambda
        total = total + loss_ap
        stats["bbox_prob"] = loss_ap

    # ------------------------------------------------------------------
    # GrooMeD-NMS in the loss (reference rpn_3d.py:721-832)
    # ------------------------------------------------------------------
    if cfg.use_nms_in_loss:
        if accept_prob is not None:
            scores_nms = accept_prob
            if cfg.rank_with_class_confidence:
                scores_nms = scores_nms * jnp.max(prob[..., 1:], axis=-1)
        else:
            scores_nms = jnp.max(prob[..., 1:], axis=-1)

        def per_image(scores_img, fg_img, coords_img, x3, y3, z3, w3, h3, l3,
                      ry3, g2, g3, gv):
            k = min(cfg.max_nms_boxes, r)   # tiny feature maps: R < cfg cap
            key = jnp.where(fg_img, scores_img, -jnp.inf)
            vals, idx = jax.lax.top_k(key, k)
            valid = vals > -jnp.inf
            s_sub = jnp.where(valid, scores_img[idx], 0.0)

            boxes_sub = coords_img[idx]
            iou2d_sub = jax.lax.stop_gradient(
                pairwise_iou(boxes_sub, boxes_sub))
            corners_sub = get_corners_of_cuboid(
                x3[idx], y3[idx], z3[idx], w3[idx], h3[idx], l3[idx], ry3[idx])
            if cfg.overlap_in_nms != "2d":
                _, g3d = iou3d_approximate(corners_sub, corners_sub,
                                           pairwise=True, generalized=True)
                g3d = 0.5 * (1.0 + g3d)
                overlaps = g3d if cfg.overlap_in_nms == "3d" else iou2d_sub * g3d
                overlaps = jax.lax.stop_gradient(
                    jnp.nan_to_num(overlaps, nan=0.0))
            else:
                overlaps = iou2d_sub

            res = differentiable_nms(
                s_sub, overlaps, valid_mask=valid,
                nms_threshold=cfg.nms_thres,
                pruning_method=cfg.diff_nms_pruning_method,
                temperature=cfg.diff_nms_temperature,
                valid_box_prob_threshold=cfg.diff_nms_valid_box_prob_threshold,
                group_boxes=cfg.diff_nms_group_boxes,
                mask_group_boxes=cfg.diff_nms_mask_group_boxes,
                group_size=cfg.diff_nms_group_size)
            scores_after_img = jnp.zeros((r,)).at[idx].set(
                jnp.where(valid, res.rescored, 0.0))

            # after-NMS best-box targets (reference rpn_3d.py:796-825)
            corners_gt = get_corners_of_cuboid(
                g3[:, 7], g3[:, 8], g3[:, 9], g3[:, 3], g3[:, 4], g3[:, 5],
                g3[:, 10])
            _, giou_gt = iou3d_approximate(corners_sub, corners_gt,
                                           pairwise=True, generalized=True)
            iou2d_gt = pairwise_iou(boxes_sub, g2)
            swg = 0.5 * (1.0 + giou_gt) * iou2d_gt       # [k, G]
            swg = jnp.where(valid[:, None] & gv[None, :], swg, -1.0)
            swg = jnp.nan_to_num(swg, nan=-1.0)
            best_box = jnp.argmax(swg, axis=0)           # [G]
            best_val = jnp.max(swg, axis=0)
            is_tgt = gv & (best_val > cfg.best_target_box_beta)
            targets_after_img = jnp.zeros((r,)).at[idx[best_box]].max(
                is_tgt.astype(jnp.float32))
            return scores_after_img, targets_after_img

        scores_after, targets_after = jax.vmap(per_image)(
            scores_nms, fg_sel, coords_2d, x3d_raw_d, y3d_raw_d, z3d_raw_d,
            w3d_raw_d, h3d_raw_d, l3d_raw_d, ry3d_raw,
            batch.gts_2d, batch.gts_3d, batch.gt_valid)

        if cfg.after_nms_lambda:
            if cfg.after_nms_loss_mode == "rank":
                def gather_ap(sa, ta, fg_img, sc_img):
                    key = jnp.where(fg_img, sc_img, -jnp.inf)
                    _, idx = jax.lax.top_k(key, min(cfg.max_ap_boxes, r))
                    valid = jnp.take(key, idx) > -jnp.inf
                    logits = jnp.where(valid, sa[idx], 0.0)
                    targets = jnp.where(valid, ta[idx], -1.0)
                    return logits, targets, jnp.any(fg_img)

                logits_b, targets_b, has_fg = jax.vmap(gather_ap)(
                    scores_after, targets_after, fg_sel, scores_nms)
                if cfg.rank_boxes_of_all_images_at_once:
                    # the no_rankwise_AP ablation: one ranking over the
                    # whole batch (reference rpn_3d.py:1118-1119)
                    loss_nms = ap_loss(logits_b.reshape(-1),
                                       targets_b.reshape(-1))
                else:
                    ap_vals = jax.vmap(ap_loss)(logits_b, targets_b)
                    img_cnt = jnp.maximum(jnp.sum(has_fg), 1)
                    loss_nms = jnp.sum(
                        jnp.where(has_fg, ap_vals, 0.0)) / img_cnt
            elif cfg.after_nms_loss_mode == "classify":
                tgt_d = jax.lax.stop_gradient(targets_after)
                n_pos = jnp.sum(jnp.where(fg_sel, tgt_d, 0.0))
                n_neg = jnp.sum(fg_sel) - n_pos
                w_neg = jnp.where(
                    (n_pos > 0) & (n_neg > 0),
                    (n_pos / jnp.maximum(n_neg, 1.0)) ** 0.25, 1.0)
                bce = _bce(scores_after, tgt_d)
                bce = bce * jnp.where(tgt_d == 0, w_neg, 1.0)
                loss_nms = _masked_mean(bce, fg_sel)
            elif cfg.after_nms_loss_mode == "regress":
                l1 = jnp.abs(scores_after - jax.lax.stop_gradient(targets_after))
                loss_nms = _masked_mean(l1, fg_sel)
            else:
                raise NotImplementedError(cfg.after_nms_loss_mode)
            loss_nms = loss_nms * cfg.after_nms_lambda
            total = total + loss_nms
            stats["after_nms"] = loss_nms

    # ------------------------------------------------------------------
    # 2D / 3D regression losses (reference rpn_3d.py:1154-1405)
    # ------------------------------------------------------------------
    new_state = un_state
    any_fg = fg_num > 0

    if cfg.bbox_2d_lambda:
        l2d = jnp.sum(_smooth_l1(bbox_2d, t2d_n), axis=-1)
        loss_2d = _masked_mean(l2d, fg_sel) * cfg.bbox_2d_lambda
        loss_2d = jnp.where(any_fg, loss_2d, 0.0)
        total = total + loss_2d
        stats["bbox_2d"] = loss_2d

    ious_2d = elementwise_iou(coords_2d, coords_2d_tar)
    stats["iou_2d"] = _masked_mean(jax.lax.stop_gradient(ious_2d), fg_sel)

    cen_dist = jnp.sqrt((x3d_raw_d - x3d_tar) ** 2 + (y3d_raw_d - y3d_tar) ** 2
                        + (z3d_raw_d - z3d_tar) ** 2)
    stats["cen_dist"] = _masked_mean(cen_dist, fg_sel)
    stats["z_err"] = _masked_mean(jnp.abs(z3d_raw_d - z3d_tar), fg_sel)
    stats["rot_err"] = _masked_mean(jnp.abs(rot_raw_snap - alpha_tar), fg_sel)

    if cfg.bbox_3d_lambda:
        terms = [_smooth_l1(bbox_3d[..., i], t3d_n[..., i]) for i in range(6)]
        if cfg.decomp_alpha:
            l_rsin = _smooth_l1(bbox_3d[..., 6], t3d_n[..., 7])
            l_rcos = _smooth_l1(bbox_3d[..., 7], t3d_n[..., 8])
            l_ry = jnp.where(axis_tar == 1, l_rsin, l_rcos)
            l_axis = _bce(bbox_3d[..., 8], axis_tar)
            l_head = _bce(bbox_3d[..., 9], head_tar)
            stats["acc_axis"] = _masked_mean(
                ((jax.lax.stop_gradient(bbox_3d[..., 8]) >= 0.5) ==
                 (axis_tar == 1)).astype(jnp.float32), fg_sel)
            stats["acc_head"] = _masked_mean(
                ((jax.lax.stop_gradient(bbox_3d[..., 9]) >= 0.5) ==
                 (head_tar == 1)).astype(jnp.float32), fg_sel)
        else:
            l_ry = _smooth_l1(bbox_3d[..., 6], t3d_n[..., 6])
            l_axis = l_head = None
        terms.append(l_ry)

        if cfg.has_vel:
            # dvel target is -inf for objects without a velocity (first
            # frame of a track) and NaN on masked non-fg rows: compute the
            # smooth-L1 on a sanitized target and average over the valid-vel
            # fg subset only (the reference keeps a separate vel count,
            # lib/rpn_util.py:633-655). Kept out of `terms` so no inf/NaN
            # sentinel ever multiplies a differentiable tensor.
            vel_tar = t3d_n[..., 9]
            vel_ok = fg_sel & jnp.isfinite(vel_tar)
            l_vel = _smooth_l1(bbox_3d[..., 10],
                               jnp.where(vel_ok, vel_tar, 0.0))
        else:
            l_vel = vel_ok = None

        if cfg.weigh_3D_regression_loss_by_gt_iou3d:
            w_iou = jax.lax.stop_gradient(accept_tar)
            terms = [t * w_iou for t in terms]
            if l_axis is not None:
                l_axis, l_head = l_axis * w_iou, l_head * w_iou
            if l_vel is not None:
                l_vel = l_vel * w_iou

        # self-balancing lambda from the un-weighted 3D loss magnitude
        if cfg.bbox_un_dynamic and accept_prob is not None:
            init = sum(_masked_mean(t, fg_sel) for t in terms) * cfg.bbox_3d_lambda
            if l_axis is not None:
                init = init + (_masked_mean(l_axis, fg_sel) +
                               _masked_mean(l_head, fg_sel)) * cfg.bbox_axis_head_lambda
            init = jax.lax.stop_gradient(init)
            n_new = jnp.minimum(un_state.n + 1, 100)
            lam_new = jnp.where(
                un_state.n == 0, init,
                init / n_new + un_state.lam * (n_new - 1) / n_new)
            new_state = UncertaintyState(lam=lam_new, n=n_new)
            un_lambda = lam_new
        else:
            un_lambda = jnp.asarray(cfg.bbox_un_lambda)

        use_accept_weight = cfg.use_acceptance_prob_in_regression_loss or \
            (cfg.bbox_un_dynamic and accept_prob is not None)
        if use_accept_weight and accept_prob is not None:
            terms = [t * accept_prob for t in terms]
            if l_axis is not None:
                l_axis = l_axis * accept_prob
                l_head = l_head * accept_prob
            if l_vel is not None:
                l_vel = l_vel * accept_prob
            stats["conf"] = _masked_mean(
                jax.lax.stop_gradient(accept_prob), fg_sel)

        loss_3d = sum(_masked_mean(t, fg_sel) for t in terms)
        if l_vel is not None:
            loss_3d = loss_3d + _masked_mean(l_vel, vel_ok)
        if l_axis is not None:
            loss_3d = loss_3d + (_masked_mean(l_axis, fg_sel) +
                                 _masked_mean(l_head, fg_sel)) * cfg.bbox_axis_head_lambda
        loss_3d = jnp.where(any_fg, loss_3d * cfg.bbox_3d_lambda, 0.0)
        total = total + loss_3d
        stats["bbox_3d"] = loss_3d

        # (1 - confidence) regulariser with the (possibly dynamic) lambda
        if accept_prob is not None and (cfg.bbox_un_dynamic or cfg.bbox_un_lambda > 0):
            loss_un = _masked_mean(1.0 - accept_prob, fg_sel) * un_lambda
            loss_un = jnp.where(any_fg, loss_un, 0.0)
            total = total + loss_un
            stats["un"] = loss_un

    if cfg.iou_2d_lambda:
        l_iou = -jnp.log(jnp.clip(ious_2d, 1e-12, 1.0))
        loss_iou = _masked_mean(l_iou, fg_sel & (ious_2d > 0)) * cfg.iou_2d_lambda
        loss_iou = jnp.where(any_fg, loss_iou, 0.0)
        total = total + loss_iou
        stats["iou_2d_loss"] = loss_iou

    stats["total"] = total
    stats["fg_num"] = fg_num.astype(jnp.float32)
    stats["bg_num"] = bg_num.astype(jnp.float32)
    return total, stats, new_state
