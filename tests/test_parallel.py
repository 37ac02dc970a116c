"""Data-parallel correctness: mesh-sharded step == single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groomed_nms_tpu.anchors import locate_anchors
from groomed_nms_tpu.losses import LossConfig
from groomed_nms_tpu.models import RPN3D, RPNConfig
from groomed_nms_tpu.models.densenet import tiny_densenet_config
from groomed_nms_tpu.parallel import (batch_sharding, create_mesh, replicate,
                                      shard_batch, shard_train_step)
from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                      create_train_state, make_train_step)


def _setup(batch_size):
    rng = np.random.default_rng(0)
    a = 4
    cfg = RPNConfig(num_classes=4, num_anchors=a, prop_features=32,
                    backbone=tiny_densenet_config())
    model = RPN3D(cfg)
    h, w = 32, 64
    fh, fw = h // 16, w // 16
    templates = np.abs(rng.normal(size=(a, 4))).astype(np.float32)
    templates[:, 2:] += templates[:, :2] + 16.0
    priors = np.concatenate(
        [templates, np.abs(rng.normal(size=(a, 7))).astype(np.float32) + 1.0],
        axis=1)
    rois = np.asarray(locate_anchors(priors, (fh, fw), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
    # warmup-style loss (deterministic, no dynamic state interplay)
    lcfg = LossConfig(max_nms_boxes=16, max_ap_boxes=32)
    tx = build_optimizer("sgd", build_lr_schedule(0.01, 100), batch_skip=1)
    state = create_train_state(model, (1, h, w, 3), tx)
    step_fn = make_train_step(lcfg, jnp.asarray(rois), jnp.asarray(rois_3d),
                              np.zeros(13, np.float32),
                              np.ones(13, np.float32))

    b, g, i = batch_size, 4, 2
    gts_2d = np.zeros((b, g, 4), np.float32)
    gts_3d = np.zeros((b, g, 16), np.float32)
    gt_valid = np.zeros((b, g), bool)
    for bi in range(b):
        for gi in range(2):
            x1, y1 = rng.uniform(0, 30), rng.uniform(0, 10)
            bw, bh = rng.uniform(15, 30), rng.uniform(12, 20)
            gts_2d[bi, gi] = [x1, y1, x1 + bw, y1 + bh]
            gts_3d[bi, gi] = [x1 + bw / 2, y1 + bh / 2, 20.0, 1.6, 1.5, 3.9,
                              0.2, 1.0, 1.5, 20.0, 0.3, 0.1, 0.2, -0.9, 0, 0]
            gt_valid[bi, gi] = True
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    batch = {
        "images": rng.normal(size=(b, h, w, 3)).astype(np.float32),
        "gts_2d": gts_2d, "gts_3d": gts_3d,
        "gt_labels": np.ones((b, g), np.float32), "gt_valid": gt_valid,
        "ign_2d": np.zeros((b, i, 4), np.float32),
        "ign_valid": np.zeros((b, i), bool),
        "p2": p2, "scale": np.ones((b,), np.float32),
    }
    return state, step_fn, batch


def test_sharded_step_matches_single_device():
    """The 8-way data-parallel step must reproduce the 1-device update.

    Loss terms are means over the whole batch's anchors; with the batch
    sharded and outputs forced replicated, XLA's all-reduce must reconcile
    to the same params (up to float association)."""
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs the virtual 8-device mesh")
    state1, step_fn, batch = _setup(batch_size=8)
    state8, _, _ = _setup(batch_size=8)

    mesh1 = create_mesh(jax.devices()[:1])
    mesh8 = create_mesh(jax.devices()[:8])
    step1 = shard_train_step(step_fn, mesh1)
    step8 = shard_train_step(step_fn, mesh8)

    with mesh1:
        b1 = shard_batch(mesh1, batch)
        s1, stats1 = step1(state1, b1)
    with mesh8:
        b8 = shard_batch(mesh8, batch)
        s8, stats8 = step8(state8, b8)

    np.testing.assert_allclose(float(stats1["total"]),
                               float(stats8["total"]), rtol=2e-4)
    # pull to host before comparing (the two trees live on different meshes)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s1.params)]
    p8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s8.params)]
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(p1, p8))
    assert worst < 5e-5, f"param divergence {worst}"


def test_sharded_inference_matches_single_device():
    """Batch-sharded im_detect_3d == single-device: per-image pipelines are
    chip-local, so sharding the batch over the mesh must not change any
    detection row (this is the deployment-serving layout: params
    replicated, images split over ICI-connected chips)."""
    from groomed_nms_tpu.inference import DetectConfig, im_detect_3d, \
        rpn_outputs_dict
    from groomed_nms_tpu.parallel import replicate

    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs the virtual 8-device mesh")

    rng = np.random.default_rng(4)
    a = 4
    cfg = RPNConfig(num_classes=4, num_anchors=a, prop_features=32,
                    predict_acceptance_prob=True,
                    backbone=tiny_densenet_config())
    model = RPN3D(cfg)
    h, w = 32, 64
    fh, fw = h // 16, w // 16
    templates = np.abs(rng.normal(size=(a, 4))).astype(np.float32)
    templates[:, 2:] += templates[:, :2] + 16.0
    priors = np.concatenate(
        [templates, np.abs(rng.normal(size=(a, 7))).astype(np.float32) + 1.0],
        axis=1)
    rois = jnp.asarray(np.asarray(locate_anchors(priors, (fh, fw), 16)))
    rois_3d = jnp.asarray(
        np.asarray(priors[np.asarray(rois)[:, 4].astype(np.int64), 4:]))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3)), train=False)
    b = 8
    images = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    p2_inv = np.linalg.inv(p2)
    scale = np.ones((b,), np.float32)
    dcfg = DetectConfig(nms_topN_pre=32, nms_topN_post=8)

    def infer(variables, images, p2, p2_inv, scale):
        out = model.apply(variables, images, train=False)
        return im_detect_3d(rpn_outputs_dict(out), rois, rois_3d, p2,
                            p2_inv, scale, np.zeros(13, np.float32),
                            np.ones(13, np.float32), dcfg)

    results = {}
    for n in (1, 8):
        mesh = create_mesh(jax.devices()[:n])
        rep, dat = replicate(mesh), batch_sharding(mesh)
        jfn = jax.jit(infer, in_shardings=(rep, dat, dat, dat, dat),
                      out_shardings=(dat, dat))
        with mesh:
            args = shard_batch(mesh, (images, p2, p2_inv, scale))
            v = jax.device_put(variables, rep)
            out, valid = jfn(v, *args)
            results[n] = (np.asarray(out), np.asarray(valid))

    np.testing.assert_array_equal(results[1][1], results[8][1])
    np.testing.assert_allclose(results[1][0], results[8][0], atol=1e-5)


def _video_setup(batch_size):
    """Tiny VideoRPN3D + has_vel loss + clip batch (kitti_3d_full stage)."""
    import dataclasses

    from groomed_nms_tpu.models.video import VideoConfig, VideoRPN3D
    from groomed_nms_tpu.training import make_video_train_step

    rng = np.random.default_rng(1)
    a = 4
    rpn_cfg = RPNConfig(num_classes=4, num_anchors=a, prop_features=32,
                        predict_velocity=True, predict_uncertainty=True,
                        backbone=tiny_densenet_config())
    model = VideoRPN3D(VideoConfig(rpn=rpn_cfg))
    h, w, f = 32, 64, 2
    fh, fw = h // 16, w // 16
    templates = np.abs(rng.normal(size=(a, 4))).astype(np.float32)
    templates[:, 2:] += templates[:, :2] + 16.0
    priors = np.concatenate(
        [templates,
         np.abs(rng.normal(size=(a, 8))).astype(np.float32) + 1.0], axis=1)
    rois = np.asarray(locate_anchors(priors, (fh, fw), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
    lcfg = LossConfig(has_vel=True, has_un=True, bbox_un_dynamic=True,
                      max_nms_boxes=16, max_ap_boxes=32)
    tx = build_optimizer("sgd", build_lr_schedule(0.01, 100), batch_skip=1)
    state = create_train_state(model, (1, f, h, w, 3), tx)
    step_fn = make_video_train_step(
        lcfg, jnp.asarray(rois), jnp.asarray(rois_3d),
        np.zeros(14, np.float32), np.ones(14, np.float32))

    b, g, i = batch_size, 4, 2
    gts_2d = np.zeros((b, g, 4), np.float32)
    gts_3d = np.full((b, g, 17), 0.0, np.float32)
    gt_valid = np.zeros((b, g), bool)
    for bi in range(b):
        for gi in range(2):
            x1, y1 = rng.uniform(0, 30), rng.uniform(0, 10)
            bw, bh = rng.uniform(15, 30), rng.uniform(12, 20)
            gts_2d[bi, gi] = [x1, y1, x1 + bw, y1 + bh]
            gts_3d[bi, gi, :16] = [x1 + bw / 2, y1 + bh / 2, 20.0, 1.6, 1.5,
                                   3.9, 0.2, 1.0, 1.5, 20.0, 0.3, 0.1, 0.2,
                                   -0.9, 0, 0]
            # mix: one GT with a real velocity, one with the -inf sentinel
            gts_3d[bi, gi, 16] = 0.8 if gi == 0 else -np.inf
            gt_valid[bi, gi] = True
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    batch = {
        "images": rng.normal(size=(b, f, h, w, 3)).astype(np.float32),
        "gts_2d": gts_2d, "gts_3d": gts_3d,
        "gt_labels": np.ones((b, g), np.float32), "gt_valid": gt_valid,
        "ign_2d": np.zeros((b, i, 4), np.float32),
        "ign_valid": np.zeros((b, i), bool),
        "p2": p2, "scale": np.ones((b,), np.float32),
    }
    return state, step_fn, batch


def test_sharded_video_step_matches_single_device():
    """8-way data-parallel VIDEO train step (clips + velocity loss) must
    reproduce the 1-device update -- the kitti_3d_full stage's multi-chip
    story, mirrored by __graft_entry__.dryrun_multichip's second phase."""
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs the virtual 8-device mesh")
    state1, step_fn, batch = _video_setup(batch_size=8)
    state8, _, _ = _video_setup(batch_size=8)

    mesh1 = create_mesh(jax.devices()[:1])
    mesh8 = create_mesh(jax.devices()[:8])
    step1 = shard_train_step(step_fn, mesh1)
    step8 = shard_train_step(step_fn, mesh8)

    with mesh1:
        s1, stats1 = step1(state1, shard_batch(mesh1, batch))
    with mesh8:
        s8, stats8 = step8(state8, shard_batch(mesh8, batch))

    assert np.isfinite(float(stats1["total"]))
    np.testing.assert_allclose(float(stats1["total"]),
                               float(stats8["total"]), rtol=2e-4)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s1.params)]
    p8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s8.params)]
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(p1, p8))
    assert worst < 5e-5, f"param divergence {worst}"
