"""Ego-pose loss: L1 on the denormalised 6-DoF relative pose.

Capability match for the reference's Pose_loss (lib/loss/pose.py:15-98):
predictions and targets are mean/std normalised pose vectors; the loss
denormalises both and takes an L1 mean, reported per translation/rotation
group for logging.
"""

from __future__ import annotations

import jax.numpy as jnp


def pose_loss(pose_pred, pose_tar, pose_means, pose_stds,
              pose_lambda_t=1.0, pose_lambda_r=1.0):
    """L1 on denormalised poses, translation/rotation weighted separately.

    Matches the reference's Pose_loss.forward exactly
    (lib/loss/pose.py:71-78): ``loss = mean|t_err| * pose_lambda_t +
    mean|r_err| * pose_lambda_r`` over the denormalised 6-DoF vectors
    (reference defaults pose_lambda_t=1, pose_lambda_r=40 --
    scripts/config/kitti_3d_full.py:150-151).

    Args:
      pose_pred / pose_tar: [B, 6] normalised (tx, ty, tz, rx, ry, rz).
      pose_means / pose_stds: [6] statistics.

    Returns (loss, stats_dict).
    """
    means = jnp.asarray(pose_means).reshape(-1)[:6]
    stds = jnp.asarray(pose_stds).reshape(-1)[:6]
    pred_dn = pose_pred * stds + means
    tar_dn = pose_tar * stds + means
    err = jnp.abs(pred_dn - tar_dn)
    t_err = err[:, :3].mean()
    r_err = err[:, 3:].mean()
    loss = t_err * pose_lambda_t + r_err * pose_lambda_r
    stats = {
        "pose": loss,
        "t_err": t_err,
        "r_err": r_err,
    }
    return loss, stats
