"""Video 3D detection model: shared RPN over frames + pose + Kalman scan.

Capability match for the reference's video forward
(models/densenet121_3d_dilate_decomp_alpha_un_kalman.py:970-1115):
stacked frames share one backbone + head; consecutive trunk features feed
the ego-pose network; per-frame detections (decode -> score threshold ->
NMS -> fixed slots) drive the differentiable Kalman tracker.

TPU-first: frames fold into the batch dim for the trunk (one big conv
batch), and the temporal recursion is a ``lax.scan`` with fixed-slot
tracks -- the whole clip is a single XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_transform_inv, center_size
from ..ops.geometry import alpha_to_rot_y, snap_to_pi
from ..ops.nms import greedy_nms
from .densenet import DenseNetBackbone
from .kalman import MEAS_COLS, PoseNet, Tracks, track_step
from .rpn_3d import RPN3D, RPNConfig


@dataclass(frozen=True)
class VideoConfig:
    rpn: RPNConfig = field(default_factory=lambda: RPNConfig(
        predict_uncertainty=True))
    max_measurements: int = 64
    max_tracks: int = 128
    score_thres: float = 0.6
    nms_thres: float = 0.4
    best_thresh: float = 0.35
    # phase-1 association distance (m).  0.5 is the reference's intended
    # value; its batched eval leaks best_thresh into this for every record
    # after the first (see kalman.associate_tracks) -- set 0.35 to
    # reproduce that behaviour
    match_dist: float = 0.5


class VideoOutputs(NamedTuple):
    frame_outputs: object      # RPNOutputs with leading [B*F]
    trunk_feats: jnp.ndarray   # [B, F, fh, fw, C]
    poses: jnp.ndarray         # [B, F-1, 6] relative ego poses


class VideoRPN3D(nn.Module):
    """Shared-backbone per-frame RPN + pairwise pose head."""

    config: VideoConfig = field(default_factory=VideoConfig)

    @nn.compact
    def __call__(self, images, train: bool = False) -> VideoOutputs:
        """images: [B, F, H, W, 3] (frame 0 = earliest)."""
        b, f, h, w, c = images.shape
        flat = images.reshape(b * f, h, w, c)

        rpn = RPN3D(self.config.rpn, name="rpn")
        outputs, feats = rpn(flat, train, return_base=True)
        fh, fw = feats.shape[1], feats.shape[2]
        feats = feats.reshape(b, f, fh, fw, feats.shape[-1])

        pose_net = PoseNet(name="pose_net")
        if f > 1:
            pairs = jnp.concatenate([feats[:, :-1], feats[:, 1:]], axis=-1)
        else:
            # single-frame clip: still run the pose branch on a dummy
            # self-pair (output sliced to length 0) so its params exist --
            # a checkpoint from a 1-frame init must restore for F>1
            # tracking/export
            pairs = jnp.concatenate([feats[:, :1], feats[:, :1]], axis=-1)
        poses = jax.vmap(pose_net, in_axes=1, out_axes=1)(pairs)[:, :f - 1]
        return VideoOutputs(frame_outputs=outputs, trunk_feats=feats,
                            poses=poses)


def extract_measurements(outputs, rois, rois_3d, p2, scale,
                         bbox_means, bbox_stds, cfg: VideoConfig):
    """Per-frame measurements for the tracker: decode -> threshold -> NMS
    -> fixed ``max_measurements`` slots.

    Mirrors clean_and_denorm (kalman.py:156-327).  All args batched on the
    leading dim.  Returns (meas [B, M, 16], valid [B, M]).
    """
    means = jnp.asarray(bbox_means, jnp.float32)
    stds = jnp.asarray(bbox_stds, jnp.float32)
    prob = outputs.prob
    b, r, _ = prob.shape

    coords_2d = bbox_transform_inv(rois[None, :, :4], outputs.bbox_2d,
                                   means=means[:4], stds=stds[:4])
    # clean_and_denorm (..._un_kalman.py:196-199) re-derives this decode
    # WITHOUT bbox_transform_inv's -1 end correction (rpn_util.py:925-926);
    # compensate so video measurements match the reference bit-for-bit
    coords_2d = coords_2d.at[..., 2:4].add(1.0)
    coords_2d = coords_2d / scale[:, None, None]

    ctr_x, ctr_y, widths, heights = center_size(rois[:, :4])

    stat_idx = jnp.array([4, 5, 6, 7, 8, 9, 11, 12])
    dn = outputs.bbox_3d[..., :8] * stds[stat_idx] + means[stat_idx]
    # velocity channel (reference ..._un_kalman.py:207-212): denormalise by
    # stats col 13, add the anchor's velocity prior (rois_3d col 7), clamp >=0
    has_vel = outputs.bbox_3d.shape[-1] >= 11 and rois_3d.shape[-1] >= 8 \
        and stds.shape[0] >= 14
    if has_vel:
        vel = jnp.maximum(
            rois_3d[:, 7] + outputs.bbox_3d[..., 10] * stds[13] + means[13],
            0.0)
    else:
        vel = jnp.zeros_like(outputs.bbox_3d[..., 0])
    x2d = (dn[..., 0] * widths + ctr_x) / scale[:, None]
    y2d = (dn[..., 1] * heights + ctr_y) / scale[:, None]
    z2d = rois_3d[:, 0] + dn[..., 2]
    w3d = jnp.exp(dn[..., 3]) * rois_3d[:, 1]
    h3d = jnp.exp(dn[..., 4]) * rois_3d[:, 2]
    l3d = jnp.exp(dn[..., 5]) * rois_3d[:, 3]
    rsin = rois_3d[:, 5] + dn[..., 6]
    rcos = rois_3d[:, 6] + dn[..., 7]
    axis_mask = outputs.bbox_3d[..., 8] >= 0.5
    head = outputs.bbox_3d[..., 9]
    alpha = jnp.where(axis_mask, rsin, rcos)

    # closed-form backprojection
    p2a, p2b, p2c = p2[:, 0, 0], p2[:, 0, 2], p2[:, 0, 3]
    p2d, p2e, p2f = p2[:, 1, 1], p2[:, 1, 2], p2[:, 1, 3]
    p2h = p2[:, 2, 3]
    z3d = z2d - p2h[:, None]
    x3d = ((z3d + p2h[:, None]) * x2d - p2b[:, None] * z3d - p2c[:, None]) \
        / p2a[:, None]
    y3d = ((z3d + p2h[:, None]) * y2d - p2e[:, None] * z3d - p2f[:, None]) \
        / p2d[:, None]
    ry3d = alpha_to_rot_y(snap_to_pi(alpha), z3d, x3d)

    scores = jnp.max(prob[..., 1:], axis=-1)
    cls_pred = (jnp.argmax(prob[..., 1:], axis=-1) + 1).astype(jnp.float32)
    un = outputs.uncertainty if outputs.uncertainty is not None else \
        jnp.ones_like(scores)
    fg = scores >= cfg.score_thres

    def per_image(coords, sc, fg_img, cl, x, y, z, w3, h3, l3, ry, hd, u,
                  vl):
        m = cfg.max_measurements
        key = jnp.where(fg_img, sc, -jnp.inf)
        vals, idx = jax.lax.top_k(key, m)
        valid = vals > -jnp.inf
        boxes = coords[idx]
        # idx is already score-descending, so greedy_nms's internal sort is
        # stable here; one shared suppression implementation (ops/nms.py)
        alive = greedy_nms(boxes, vals, valid,
                           nms_threshold=cfg.nms_thres, shift=1.0)
        meas = jnp.stack([
            boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
            sc[idx], cl[idx],
            x[idx], y[idx], z[idx], w3[idx], h3[idx], l3[idx],
            snap_to_pi(ry[idx]), hd[idx], u[idx],
            vl[idx],
        ], axis=-1)
        return meas, alive

    return jax.vmap(per_image)(coords_2d, scores, fg, cls_pred, x3d, y3d,
                               z3d, w3d, h3d, l3d, ry3d, head, un, vel)


def video_track(meas_frames, valid_frames, poses_dn, p2, cfg: VideoConfig,
                best_thresh=None):
    """Run the tracker over a clip for one batch element.

    Args:
      meas_frames: [F, M, 16]; valid_frames: [F, M];
      poses_dn: [F, 6] denormalised relative poses (row 0 unused).
      p2: [4, 4].

    Returns final Tracks + stacked per-frame track snapshots.
    """
    bt = best_thresh if best_thresh is not None else cfg.best_thresh

    def step(carry, inp):
        tracks, frame_idx = carry
        meas, valid, pose = inp
        # frame 0: skip the ego projection (no previous frame)
        tracks = track_step(tracks, meas, valid,
                            jnp.where(frame_idx > 0, pose,
                                      jnp.zeros_like(pose)),
                            p2, best_thresh=bt, apply_pose=True,
                            match_dist=cfg.match_dist)
        return (tracks, frame_idx + 1), tracks

    init = (Tracks.empty(cfg.max_tracks), jnp.zeros((), jnp.int32))
    (final, _), snapshots = jax.lax.scan(
        step, init, (meas_frames, valid_frames, poses_dn))
    return final, snapshots
