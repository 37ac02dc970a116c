"""Ego-pose loss: L1 on the denormalised 6-DoF relative pose.

Capability match for the reference's Pose_loss (lib/loss/pose.py:15-98):
predictions and targets are mean/std normalised pose vectors; the loss
denormalises both and takes an L1 mean, reported per translation/rotation
group for logging.
"""

from __future__ import annotations

import jax.numpy as jnp


def pose_loss(pose_pred, pose_tar, pose_means, pose_stds, pose_lambda=1.0):
    """L1 on denormalised poses.

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
    loss = err.mean() * pose_lambda
    stats = {
        "pose": loss,
        "t_err": err[:, :3].mean(),
        "r_err": err[:, 3:].mean(),
    }
    return loss, stats
