"""Video model: shared trunk, pose head, measurement extraction, tracking."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groomed_nms_tpu.anchors import locate_anchors
from groomed_nms_tpu.models.densenet import tiny_densenet_config
from groomed_nms_tpu.models.rpn_3d import RPNConfig
from groomed_nms_tpu.models.video import (VideoConfig, VideoRPN3D,
                                          extract_measurements, video_track)


@pytest.fixture(scope="module")
def video_setup():
    rng = np.random.default_rng(0)
    rpn_cfg = RPNConfig(num_classes=4, num_anchors=4, prop_features=32,
                        predict_uncertainty=True,
                        backbone=tiny_densenet_config())
    cfg = VideoConfig(rpn=rpn_cfg, max_measurements=16, max_tracks=32)
    model = VideoRPN3D(cfg)
    b, f, h, w = 1, 3, 32, 64
    images = jnp.asarray(rng.normal(size=(b, f, h, w, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    out = model.apply(variables, images, train=False)
    return dict(cfg=cfg, model=model, images=images, variables=variables,
                out=out, b=b, f=f, rng=rng)


def test_video_forward_shapes(video_setup):
    out = video_setup["out"]
    b, f = video_setup["b"], video_setup["f"]
    assert out.poses.shape == (b, f - 1, 6)
    assert out.trunk_feats.shape[0] == b and out.trunk_feats.shape[1] == f
    fo = out.frame_outputs
    assert fo.cls.shape[0] == b * f
    assert fo.uncertainty is not None


def test_video_shares_trunk_params(video_setup):
    """One backbone for all frames (the whole point of the shared design)."""
    params = video_setup["variables"]["params"]
    assert "rpn" in params and "pose_net" in params
    assert "backbone" in params["rpn"]
    # exactly one backbone tree, no per-frame copies
    backbone_keys = [k for k in params if "backbone" in k]
    assert backbone_keys == []


def test_extract_measurements_and_track(video_setup):
    cfg = video_setup["cfg"]
    out = video_setup["out"]
    rng = video_setup["rng"]
    b, f = video_setup["b"], video_setup["f"]
    fo = out.frame_outputs
    fh, fw = fo.feat_hw
    a = cfg.rpn.num_anchors
    r = fh * fw * a

    priors = np.abs(rng.normal(size=(a, 11))).astype(np.float32) + 1.0
    priors[:, 4] = 20.0
    rois = np.asarray(locate_anchors(priors, (fh, fw), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b * f, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0

    # force a permissive score threshold so some anchors pass
    cfg_low = VideoConfig(rpn=cfg.rpn, max_measurements=16, max_tracks=32,
                          score_thres=0.0)
    meas, valid = extract_measurements(
        fo, jnp.asarray(rois), jnp.asarray(rois_3d), jnp.asarray(p2),
        jnp.ones((b * f,)),
        np.zeros(13, np.float32), np.ones(13, np.float32), cfg_low)
    assert meas.shape == (b * f, 16, 16)
    assert bool(valid.any())
    assert np.isfinite(np.asarray(meas)).all()

    # track over the clip
    meas_frames = meas.reshape(b, f, 16, 16)[0]
    valid_frames = valid.reshape(b, f, 16)[0]
    poses = jnp.zeros((f, 6))
    final, snaps = video_track(meas_frames, valid_frames, poses,
                               jnp.asarray(p2[0]), cfg_low)
    assert snaps.valid.shape == (f, cfg.max_tracks)
    assert int(final.valid.sum()) >= 0  # runs; health depends on randomness


def test_video_track_jits(video_setup):
    cfg = video_setup["cfg"]
    f, m = 3, cfg.max_measurements
    meas = jnp.zeros((f, m, 16))
    valid = jnp.zeros((f, m), bool)
    p2 = jnp.asarray(np.eye(4, dtype=np.float32))
    fn = jax.jit(lambda me, va, po: video_track(me, va, po, p2, cfg))
    final, snaps = fn(meas, valid, jnp.zeros((f, 6)))
    assert int(final.valid.sum()) == 0


def test_assemble_video_variables(video_setup):
    """RPN subtree transplanted from a single-frame state; pose from npz."""
    import numpy as np
    from groomed_nms_tpu.models.rpn_3d import RPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state)
    from groomed_nms_tpu.utils.torch_weights import assemble_video_variables

    cfg = video_setup["cfg"]
    sf_model = RPN3D(cfg.rpn)
    sf_state = create_train_state(
        sf_model, (1, 32, 64, 3),
        build_optimizer("sgd", build_lr_schedule(0.01, 10)))
    model = video_setup["model"]
    variables = assemble_video_variables(model, sf_state)
    # transplanted leaves identical to the single-frame state
    a = jax.tree_util.tree_leaves(variables["params"]["rpn"])[0]
    b = jax.tree_util.tree_leaves(sf_state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the assembled tree runs
    out = model.apply(variables, video_setup["images"], train=False)
    assert np.isfinite(np.asarray(out.poses)).all()


def test_video_train_step_has_vel():
    """kitti_3d_full-style training: VideoRPN3D + has_vel loss on synthetic
    clips trains end-to-end; the vel loss moves the vel channel and invalid
    (-inf) velocity targets poison nothing."""
    from groomed_nms_tpu.losses import LossConfig
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state,
                                          make_video_train_step)

    rng = np.random.default_rng(1)
    a = 4
    rpn_cfg = RPNConfig(num_classes=4, num_anchors=a, prop_features=32,
                        predict_uncertainty=True, predict_velocity=True,
                        backbone=tiny_densenet_config())
    cfg = VideoConfig(rpn=rpn_cfg, max_measurements=16, max_tracks=32)
    model = VideoRPN3D(cfg)
    b, f, h, w = 2, 2, 32, 64
    fh, fw = h // 16, w // 16

    # anchors with a velocity prior column (z w h l rot sin cos vel)
    priors = np.abs(rng.normal(size=(a, 12))).astype(np.float32) + 1.0
    priors[:, 2:] += np.array([10.0, 10.0] + [0.0] * 8, np.float32)[None]
    priors[:, :2] = np.array([[0, 0]], np.float32)
    priors[:, 2] = 24.0
    priors[:, 3] = 24.0
    priors[:, 4] = 20.0
    rois = np.asarray(locate_anchors(priors, (fh, fw), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
    assert rois_3d.shape[1] == 8

    g = 3
    gts_2d = np.zeros((b, g, 4), np.float32)
    gts_3d = np.zeros((b, g, 17), np.float32)   # velocity column 16
    gt_valid = np.zeros((b, g), bool)
    for bi in range(b):
        for gi in range(2):
            x1, y1 = rng.uniform(0, 30), rng.uniform(0, 10)
            bw, bh = rng.uniform(15, 30), rng.uniform(12, 20)
            gts_2d[bi, gi] = [x1, y1, x1 + bw, y1 + bh]
            gts_3d[bi, gi, :16] = [
                x1 + bw / 2, y1 + bh / 2, 20.0, 1.6, 1.5, 3.9, 0.2, 1.0,
                1.5, 20.0, 0.3, 0.1, 0.2, -0.9, 0, 0]
            # one GT per image has no velocity (first frame of its track)
            gts_3d[bi, gi, 16] = rng.uniform(0, 3) if gi == 0 else -np.inf
            gt_valid[bi, gi] = True
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    batch = {
        "images": rng.normal(size=(b, f, h, w, 3)).astype(np.float32),
        "gts_2d": gts_2d, "gts_3d": gts_3d,
        "gt_labels": np.ones((b, g), np.float32), "gt_valid": gt_valid,
        "ign_2d": np.zeros((b, 1, 4), np.float32),
        "ign_valid": np.zeros((b, 1), bool),
        "p2": p2, "scale": np.ones((b,), np.float32),
    }

    lcfg = LossConfig(has_vel=True, has_un=True, bbox_un_dynamic=True,
                      max_nms_boxes=32, max_ap_boxes=64)
    tx = build_optimizer("sgd", build_lr_schedule(0.01, 100), batch_skip=1)
    state = create_train_state(model, (1, f, h, w, 3), tx)
    # 14-col stats: col 13 normalises the dvel target
    step = jax.jit(make_video_train_step(
        lcfg, jnp.asarray(rois), jnp.asarray(rois_3d),
        np.zeros(14, np.float32), np.ones(14, np.float32)))

    vel_kernel_before = np.asarray(jax.tree_util.tree_leaves(
        state.params["rpn"]["head"])[1]).copy()
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["total"]))
    assert all(np.isfinite(l) for l in losses), losses
    # params must be NaN-free (the -inf dvel rows are masked out safely)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    vel_kernel_after = np.asarray(jax.tree_util.tree_leaves(
        state.params["rpn"]["head"])[1])
    assert not np.array_equal(vel_kernel_before, vel_kernel_after)

    # tracker-consumable outputs: decode the current frame's measurements
    # (velocity channel included) and run the tracker over the clip
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(batch["images"]), train=False)
    fo = out.frame_outputs
    p2f = np.tile(np.eye(4, dtype=np.float32)[None], (b * f, 1, 1))
    p2f[:, 0, 0] = 700.0
    p2f[:, 1, 1] = 700.0
    cfg_low = VideoConfig(rpn=rpn_cfg, max_measurements=16, max_tracks=32,
                          score_thres=0.0)
    meas, valid = extract_measurements(
        fo, jnp.asarray(rois), jnp.asarray(rois_3d), jnp.asarray(p2f),
        jnp.ones((b * f,)),
        np.zeros(14, np.float32), np.ones(14, np.float32), cfg_low)
    assert np.isfinite(np.asarray(meas)).all()
    # velocity column populated and clamped >= 0
    assert (np.asarray(meas)[..., 15] >= 0).all()
    assert (np.asarray(meas)[..., 15] > 0).any()
    final, snaps = video_track(meas.reshape(b, f, 16, 16)[0],
                               valid.reshape(b, f, 16)[0],
                               jnp.zeros((f, 6)), jnp.asarray(p2f[0]),
                               cfg_low)
    assert snaps.valid.shape == (f, 32)


def test_fused_track_loss_differentiable_to_pose():
    """The reference-intent video scheme (pose trained THROUGH the fused
    tracker, losses/fused_track.py): finite loss, nonzero pose gradient,
    and a correct pose must score better than a wrong one."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from groomed_nms_tpu.losses.fused_track import fused_track_loss
    from groomed_nms_tpu.models.video import VideoConfig

    cfg = VideoConfig(max_tracks=8)
    p2 = np.eye(4, dtype=np.float32)
    p2[0, 0] = p2[1, 1] = 200.0
    p2[0, 2], p2[1, 2] = 96.0, 32.0

    f, m = 3, 2
    tz = 1.0
    meas = np.zeros((f, m, 16), np.float32)
    centers0 = np.array([[1.0, 0.5, 20.0], [-2.0, 0.5, 15.0]], np.float32)
    for fi in range(f):
        c = centers0.copy()
        c[:, 2] -= tz * fi
        for gi in range(m):
            x, y, z = c[gi]
            u, v = 200 * x / z + 96, 200 * y / z + 32
            bw = 200 * 1.7 / z
            meas[fi, gi, :6] = [u - bw / 2, v - bw / 2, u + bw / 2,
                                v + bw / 2, 0.9, 1.0]
            meas[fi, gi, 6:14] = [x, y, z, 1.7, 1.5, 4.0, 0.1, 0.0]
            meas[fi, gi, 14] = 0.9
    valid = np.ones((f, m), bool)
    gts = centers0.copy()
    gts[:, 2] -= tz * (f - 1)

    def loss_of(pose_tz):
        poses = jnp.zeros((f, 6)).at[1:, 2].set(pose_tz)
        l, n = fused_track_loss(poses, jnp.asarray(meas), jnp.asarray(valid),
                                jnp.asarray(gts), jnp.ones(m, bool),
                                jnp.asarray(p2), cfg)
        return l

    l_true = float(loss_of(0.0))
    assert np.isfinite(l_true)
    g = jax.grad(lambda t: loss_of(t))(jnp.asarray(2.0))
    assert np.isfinite(float(g)) and float(g) != 0.0, \
        "gradient must flow through project_ego into the pose"
    # note: ego translation here is already encoded in the measurements, so
    # a ZERO pose aligns; a large wrong pose must be measurably worse
    assert float(loss_of(5.0)) > l_true


def test_video_scheme_comparison_harness_runs():
    """The divergence-measurement harness (VERDICT r2 task 4) trains both
    schemes end-to-end at micro scale and reports all three metrics."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from analysis.compare_video_training_schemes import run
    # fused only: the direct scheme is already covered by the pose-loss
    # unit tests, and each scheme costs a full video-model vjp compile
    results = run(iters=2, batch=1, log=lambda *a: None,
                  schemes=("fused",), n_eval=3)
    for scheme in ("fused", "untrained"):
        for key in ("pose_tz_mae", "track_center_rmse", "track_vel_mae"):
            assert np.isfinite(results[scheme][key])
