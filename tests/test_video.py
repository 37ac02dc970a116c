"""Video model: shared trunk, pose head, measurement extraction, tracking."""

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
        jnp.asarray(np.linalg.inv(p2)), jnp.ones((b * f,)),
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
