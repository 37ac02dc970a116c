"""Convert reference torch checkpoints into this framework's Flax params.

The reference trains torchvision DenseNet-121 (NCHW, OIHW convs) with 14
separate 1x1 head convs; this framework uses NHWC/HWIO and one fused head
conv with per-anchor channel blocks in (h, w, a) order.  The converter:

* maps ``base.*`` (torchvision ``features``) onto ``backbone/*`` --
  conv kernels transposed OIHW -> HWIO, BatchNorm weight/bias/running_mean/
  running_var onto scale/bias/mean/var;
* assembles the fused head kernel from the reference's separate convs
  (``cls``, ``bbox_x..bbox_h``, ``bbox_x3d..bbox_head``), permuting output
  channels from the reference's class-major [cls: c*A + a] / per-field [a]
  layouts into our anchor-major [a * C_total + field] layout;
* maps the acceptance-prob branch (``acceptance_prob.layer_i``).

Works on a plain ``state_dict``-style mapping of numpy arrays (load a torch
.pth with ``torch.load(..., map_location='cpu')`` and call ``.numpy()``), so
torch itself is only needed by the caller.  ``module.`` prefixes from
DataParallel are stripped, mirroring load_weights (lib/core.py:641-668).
"""

from __future__ import annotations

import re

import numpy as np

_DENSE_RE = re.compile(r"denseblock(\d+)\.denselayer(\d+)\.(.+)")
_TRANS_RE = re.compile(r"transition(\d+)\.(.+)")

_HEAD_FIELDS_3D = ["bbox_x3d", "bbox_y3d", "bbox_z3d", "bbox_w3d",
                   "bbox_h3d", "bbox_l3d"]


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _strip(sd):
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _bn(dst_params, dst_stats, name, sd, prefix):
    dst_params[name] = {"scale": np.asarray(sd[prefix + ".weight"]),
                        "bias": np.asarray(sd[prefix + ".bias"])}
    dst_stats[name] = {"mean": np.asarray(sd[prefix + ".running_mean"]),
                       "var": np.asarray(sd[prefix + ".running_var"])}


def convert_backbone(sd):
    """torchvision ``features`` state dict -> (params, batch_stats) trees."""
    sd = _strip(sd)
    params, stats = {}, {}

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    params["conv0"] = {"kernel": _conv(sd["conv0.weight"])}
    _bn(params, stats, "norm0", sd, "norm0")

    for key in list(sd):
        m = _DENSE_RE.fullmatch(key)
        if m and key.endswith("conv1.weight"):
            bi, li = int(m.group(1)), int(m.group(2))
            base = f"denseblock{bi}.denselayer{li}"
            name = f"denseblock{bi}_layer{li}"
            layer_p, layer_s = {}, {}
            _bn(layer_p, layer_s, "norm1", sd, base + ".norm1")
            layer_p["conv1"] = {"kernel": _conv(sd[base + ".conv1.weight"])}
            _bn(layer_p, layer_s, "norm2", sd, base + ".norm2")
            layer_p["conv2"] = {"kernel": _conv(sd[base + ".conv2.weight"])}
            params[name] = layer_p
            stats[name] = layer_s

    for key in list(sd):
        m = _TRANS_RE.fullmatch(key)
        if m and key.endswith("conv.weight"):
            ti = int(m.group(1))
            base, name = f"transition{ti}", f"transition{ti}"
            layer_p, layer_s = {}, {}
            _bn(layer_p, layer_s, "norm", sd, base + ".norm")
            layer_p["conv"] = {"kernel": _conv(sd[base + ".conv.weight"])}
            params[name] = layer_p
            stats[name] = layer_s

    _bn(params, stats, "norm5", sd, "norm5")
    return params, stats


def convert_rpn_checkpoint(sd, num_classes, num_anchors,
                           predict_acceptance_prob=False,
                           predict_uncertainty=None,
                           predict_velocity=False):
    """Full reference RPN state dict -> {'params', 'batch_stats'} trees.

    The reference's bbox_3d head has no separate rsin/rcos convs -- the
    single ``bbox_alpha`` conv output feeds both decode paths
    (models/...alpha.py:189) -- so its kernel is duplicated into our two
    channels.

    ``predict_uncertainty`` (the `_un` variant's ``bbox_un`` conv,
    models/...alpha_un.py:68) defaults to auto-detection from the state
    dict; a mismatch between the flag and the checkpoint raises instead
    of silently dropping or fabricating the head.  ``predict_velocity``
    zero-inits the velocity channel: the reference has no velocity conv
    (its released checkpoints predate the video stage), matching
    :func:`widen_fused_head_for_velocity`.
    """
    sd = _strip(sd)
    has_un = "bbox_un.weight" in sd
    if predict_uncertainty is None:
        predict_uncertainty = has_un
    if predict_uncertainty != has_un:
        raise ValueError(
            f"predict_uncertainty={predict_uncertainty} but the checkpoint "
            f"{'has' if has_un else 'lacks'} bbox_un weights -- converting "
            "would silently drop or randomize the uncertainty head")
    base_sd = {k[len("base."):]: v for k, v in sd.items()
               if k.startswith("base.")}
    bb_params, bb_stats = convert_backbone(base_sd)

    params = {"backbone": bb_params}
    stats = {"backbone": bb_stats}

    params["prop_feats"] = {
        "kernel": _conv(sd["prop_feats.0.weight"]),
        "bias": np.asarray(sd["prop_feats.0.bias"]),
    }

    a, c = num_anchors, num_classes
    n3d = 10 + (1 if predict_velocity else 0)
    per_anchor = c + 4 + n3d + (1 if predict_uncertainty else 0)
    in_ch = sd["cls.weight"].shape[1]
    kernel = np.zeros((1, 1, in_ch, a * per_anchor), np.float32)
    bias = np.zeros((a * per_anchor,), np.float32)

    def put(field_idx, w, b, anchor_stride=1):
        """w: [A(or c*A), in, 1, 1]; scatter into fused layout."""
        w = np.asarray(w)[..., 0, 0]          # [out, in]
        b = np.asarray(b)
        for ai in range(a):
            for off in range(anchor_stride):
                src = off * a + ai if anchor_stride > 1 else ai
                dst = ai * per_anchor + field_idx + off
                kernel[0, 0, :, dst] = w[src]
                bias[dst] = b[src]

    # cls: reference channel = class * A + anchor
    put(0, sd["cls.weight"], sd["cls.bias"], anchor_stride=c)
    for fi, field in enumerate(["bbox_x", "bbox_y", "bbox_w", "bbox_h"]):
        put(c + fi, sd[field + ".weight"], sd[field + ".bias"])
    for fi, field in enumerate(_HEAD_FIELDS_3D):
        put(c + 4 + fi, sd[field + ".weight"], sd[field + ".bias"])
    # rsin and rcos both come from bbox_alpha (see docstring)
    put(c + 10, sd["bbox_alpha.weight"], sd["bbox_alpha.bias"])
    put(c + 11, sd["bbox_alpha.weight"], sd["bbox_alpha.bias"])
    put(c + 12, sd["bbox_axis.weight"], sd["bbox_axis.bias"])
    put(c + 13, sd["bbox_head.weight"], sd["bbox_head.bias"])
    # velocity channel (c + 4 + 10, when present) stays zero-init
    if predict_uncertainty:
        put(c + 4 + n3d, sd["bbox_un.weight"], sd["bbox_un.bias"])
    params["head"] = {"kernel": kernel, "bias": bias}

    if predict_acceptance_prob:
        layers = sorted({int(m.group(1)) for k in sd
                         for m in [re.fullmatch(
                             r"acceptance_prob\.layer_(\d+)\.weight", k)]
                         if m})
        for li in layers:
            w = sd[f"acceptance_prob.layer_{li}.weight"]
            b = sd[f"acceptance_prob.layer_{li}.bias"]
            name = "accept_out" if li == layers[-1] else f"accept_{li}"
            params[name] = {"kernel": _conv(w), "bias": np.asarray(b)}

    return {"params": params, "batch_stats": stats}


def assemble_video_variables(video_model, single_frame_state, pose_npz=None,
                             example_shape=(1, 2, 64, 64, 3)):
    """Build VideoRPN3D variables from a single-frame RPN checkpoint.

    Mirrors the reference's staging (the video model warm-starts its trunk +
    heads from the `_un` single-frame run and trains only the pose branch,
    scripts/config/kitti_3d_full.py): the RPN subtree comes from
    ``single_frame_state`` (a TrainState), the pose branch from the npz
    written by scripts/train_pose.py (or fresh init when absent).
    """
    import jax
    import jax.numpy as jnp

    # one jitted init graph: eager flax init pays a dispatch round trip
    # per parameter on remote platforms (see trainer.create_train_state)
    variables = jax.jit(video_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros(example_shape, jnp.float32),
        train=False)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    params["rpn"] = single_frame_state.params
    stats["rpn"] = single_frame_state.batch_stats

    if pose_npz is not None:
        z = np.load(pose_npz)
        pose = params["pose_net"]

        def fill(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                key = f"{prefix}{k}"
                if isinstance(v, dict):
                    out[k] = fill(v, key + "/")
                else:
                    out[k] = z[key] if key in z.files else v
            return out

        params["pose_net"] = fill(pose)
    return {"params": params, "batch_stats": stats}


def load_video_variables(model, cfg, out_dir, restore=None, log=None):
    """Restore serving variables for a ``VideoRPN3D`` model.

    The one shared implementation of the loading rule previously
    triplicated across scripts/{test_kalman,tracking_video,export}.py:
    when ``out_dir`` holds a video-stage checkpoint (scripts/train.py's
    video dispatch saves the full VideoRPN3D, rpn + pose branch), restore
    it directly; otherwise assemble the RPN subtree from the single-frame
    checkpoint -- warning loudly on random init, so an untrained serving
    artifact is never silent -- plus the pose branch and pose statistics
    written by scripts/train_pose.py (identity stats when absent).

    Returns ``(variables, pose_means, pose_stds, step)``.
    """
    import logging
    import os

    from ..models import RPN3D
    from ..training import (build_lr_schedule, build_optimizer,
                            create_train_state, latest_checkpoint,
                            restore_checkpoint)

    log = log or logging.getLogger(__name__)
    tx = build_optimizer("sgd", build_lr_schedule(cfg.lr, 100))
    ckpt = latest_checkpoint(out_dir)
    if ckpt is not None and cfg.model == "kalman":
        v_state = create_train_state(
            model, (1, max(1, cfg.video_count), 64, 64, 3), tx)
        v_state = restore_checkpoint(out_dir, v_state, restore,
                                     restore_optimizer=False)
        variables = {"params": v_state.params,
                     "batch_stats": v_state.batch_stats}
        step = int(v_state.step)
        log.info("video-model weights restored from %s (iter %d)",
                 out_dir, step)
    else:
        sf_state = create_train_state(RPN3D(model.config.rpn),
                                      (1, 64, 64, 3), tx)
        if ckpt is not None:
            sf_state = restore_checkpoint(out_dir, sf_state, restore,
                                          restore_optimizer=False)
            log.info("single-frame weights restored from %s (iter %d)",
                     out_dir, int(sf_state.step))
        elif getattr(cfg, "pretrained", None) and \
                latest_checkpoint(cfg.pretrained) is not None:
            # the same warm-start rule as scripts/train.py's video
            # dispatch: the single-frame `_un` checkpoint has no velocity
            # channel, so restore into a velocity-free head and widen
            import dataclasses
            sf_cfg = dataclasses.replace(model.config.rpn,
                                         predict_velocity=False)
            pre = create_train_state(RPN3D(sf_cfg), (1, 64, 64, 3), tx)
            pre = restore_checkpoint(cfg.pretrained, pre,
                                     restore_optimizer=False)
            params = pre.params
            if model.config.rpn.predict_velocity:
                params = widen_fused_head_for_velocity(
                    params, model.config.rpn.num_anchors,
                    model.config.rpn.num_classes)
            sf_state = sf_state.replace(params=params,
                                        batch_stats=pre.batch_stats,
                                        step=pre.step)
            log.info("single-frame weights warm-started from %s (iter %d)",
                     cfg.pretrained, int(pre.step))
        else:
            log.warning("no checkpoint under %s; using random weights",
                        out_dir)
        pose_npz = os.path.join(out_dir + "_pose", "pose_net_params.npz")
        variables = assemble_video_variables(
            model, sf_state, pose_npz if os.path.exists(pose_npz) else None)
        step = int(sf_state.step)

    pose_stats = os.path.join(out_dir + "_pose", "pose_stats.npz")
    if os.path.exists(pose_stats):
        z = np.load(pose_stats)
        pose_means, pose_stds = z["means"], z["stds"]
    else:
        pose_means, pose_stds = np.zeros(6), np.ones(6)
    return variables, pose_means, pose_stds, step


def widen_fused_head_for_velocity(params, num_anchors, num_classes):
    """Insert a zero-init velocity channel into a fused head kernel/bias.

    Warm-starting the video model (n_box3d=11) from a single-frame `_un`
    checkpoint (n_box3d=10) needs the per-anchor channel block widened from
    ``C+4+10+unc`` to ``C+4+11+unc``; the new vel channel starts at zero so
    the decoded velocity equals the anchor's learned velocity prior.
    Mirrors the reference staging where the kalman model reuses the `_un`
    weights (scripts/config/kitti_3d_full.py:39) and the vel channel is not
    covered by them.
    """
    head = params["head"]
    kernel = np.asarray(head["kernel"])      # [1, 1, in, A*per]
    bias = np.asarray(head["bias"])
    a, c = num_anchors, num_classes
    per = kernel.shape[-1] // a
    vel_pos = c + 4 + 10                     # after the head(sig) channel
    new_per = per + 1
    nk = np.zeros(kernel.shape[:-1] + (a * new_per,), kernel.dtype)
    nb = np.zeros((a * new_per,), bias.dtype)
    for ai in range(a):
        src, dst = ai * per, ai * new_per
        nk[..., dst:dst + vel_pos] = kernel[..., src:src + vel_pos]
        nb[dst:dst + vel_pos] = bias[src:src + vel_pos]
        nk[..., dst + vel_pos + 1:dst + new_per] = \
            kernel[..., src + vel_pos:src + per]
        nb[dst + vel_pos + 1:dst + new_per] = bias[src + vel_pos:src + per]
    out = dict(params)
    out["head"] = {"kernel": nk, "bias": nb}
    return out
