"""Fused-track alignment loss: train pose/conf THROUGH the Kalman tracker.

The reference's video stage intends to train only the pose branch
(``freeze_blacklist=['pose', 'conf']`` -- substring match over parameter
names, so exactly pose_feats + pose + conf, i.e. our ``pose_net``) with
gradients flowing through the kalman-fused forward
(/root/reference/scripts/config/kitti_3d_full.py:37-47).  The released
reference cannot actually run this -- its trainer calls ``rpn_net(images)``
(scripts/train_rpn_3d.py:137) while the kalman model's forward requires
``(x, p2s, p2_invs, scales)`` and returns track shots
(models/..._un_kalman.py:970) -- so this module implements the *intent*:
our tracker (models/kalman.py) is pure differentiable JAX, and this loss
supervises the FUSED track states against current-frame ground truth,
back-propagating into the pose prediction via ``project_ego``.

Measured against direct pose supervision (scripts/train_pose.py, our
default scheme) in analysis/compare_video_training_schemes.py; the
resulting numbers live in docs/PARITY.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.kalman import Tracks, track_step


def fused_track_loss(poses_dn, meas_frames, valid_frames, gt_centers,
                     gt_valid, p2, cfg, best_thresh=None):
    """Alignment of kalman-fused tracks with current-frame GT centers.

    Args:
      poses_dn: [F, 6] denormalised relative ego poses (row 0 unused) --
        the differentiable path back into the pose branch.
      meas_frames / valid_frames: [F, M, 16] / [F, M] per-frame
        measurements (from extract_measurements, or oracle boxes).
      gt_centers: [G, 3] current-frame GT 3D centers (camera frame).
      gt_valid: [G] bool.
      p2: [4, 4].

    Returns (loss, n_matched): mean smooth-L1 over 3D center residuals of
    fused tracks greedily matched to GT by center distance. Rolls the
    tracker over the clip with lax.scan (same code path as inference,
    models/video.py::video_track) so the gradient includes ego projection,
    forecasting, and the Kalman update chain.
    """
    bt = best_thresh if best_thresh is not None else cfg.best_thresh

    def step(carry, inp):
        tracks, idx = carry
        meas, valid, pose = inp
        tracks = track_step(tracks, meas, valid,
                            jnp.where(idx > 0, pose, jnp.zeros_like(pose)),
                            p2, best_thresh=bt, apply_pose=True)
        return (tracks, idx + 1), None

    init = (Tracks.empty(cfg.max_tracks), jnp.zeros((), jnp.int32))
    (final, _), _ = jax.lax.scan(step, init,
                                 (meas_frames, valid_frames, poses_dn))

    centers = final.X[:, :3]                       # [T, 3]
    tvalid = final.valid
    # pairwise distances track x GT; invalid pairs pushed to +inf
    d = jnp.linalg.norm(centers[:, None, :] - gt_centers[None, :, :],
                        axis=-1)
    d = jnp.where(tvalid[:, None] & gt_valid[None, :], d, jnp.inf)
    # each GT takes its nearest track (tracks may serve multiple GTs only
    # when tracks are scarce; adequate for an alignment objective)
    best_t = jnp.argmin(d, axis=0)                 # [G]
    best_d = d.min(axis=0)
    matched = gt_valid & jnp.isfinite(best_d)
    res = centers[best_t] - gt_centers             # [G, 3]
    l1 = jnp.abs(res)
    huber = jnp.where(l1 < 1.0, 0.5 * l1 * l1, l1 - 0.5).sum(-1)
    n = jnp.maximum(matched.sum(), 1)
    loss = jnp.where(matched, huber, 0.0).sum() / n
    return loss, matched.sum()
