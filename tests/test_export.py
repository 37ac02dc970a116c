"""AOT export: the serialized serving artifact reproduces the live pipeline.

Covers groomed_nms_tpu/export.py: build_serving_fn closes the full
uint8-in/detections-out program over weights + anchors, export_serving
serializes it via jax.export, and load_serving round-trips it --
detections, validity masks, and jit-compatibility all preserved.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_pipeline():
    import jax
    import jax.numpy as jnp

    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.inference import DetectConfig
    from groomed_nms_tpu.models import RPN3D, RPNConfig
    from groomed_nms_tpu.models.densenet import tiny_densenet_config

    num_anchors = 6
    cfg = RPNConfig(num_classes=4, num_anchors=num_anchors, prop_features=64,
                    backbone=tiny_densenet_config())
    model = RPN3D(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 128, 3)), train=False)

    rs = np.random.default_rng(0)
    templates = np.abs(rs.normal(size=(num_anchors, 4))).astype(np.float32)
    templates[:, 2:] += templates[:, :2] + 16.0
    priors = np.concatenate(
        [templates,
         np.abs(rs.normal(size=(num_anchors, 7))).astype(np.float32) + 1.0],
        axis=1)
    priors[:, 4] = 30.0
    rois = np.asarray(locate_anchors(priors, (4, 8), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
    dcfg = DetectConfig(nms_topN_pre=64, nms_topN_post=8)
    return model, variables, rois, rois_3d, dcfg


def _example_inputs(batch, src_h, src_w):
    rs = np.random.default_rng(1)
    imgs = rs.integers(0, 256, (batch, src_h, src_w, 3), dtype=np.uint8)
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (batch, 1, 1))
    p2[:, 0, 0] = p2[:, 1, 1] = 700.0
    p2[:, 0, 2], p2[:, 1, 2] = 60.0, 18.0
    p2_inv = np.linalg.inv(p2)
    scale = np.full((batch,), 64.0 / src_h, np.float32)
    return imgs, p2, p2_inv, scale


def test_export_roundtrip_matches_live(tiny_pipeline, tmp_path):
    import jax

    from groomed_nms_tpu.export import (build_serving_fn, export_serving,
                                        load_serving)

    model, variables, rois, rois_3d, dcfg = tiny_pipeline
    serve = build_serving_fn(
        model, variables, rois, rois_3d, np.zeros(13, np.float32),
        np.ones(13, np.float32), np.array([0.485, 0.456, 0.406]),
        np.array([0.229, 0.224, 0.225]), dcfg, target_h=64, crop_w=128,
        bf16_input=False)

    batch, src_h, src_w = 2, 48, 96
    blob = export_serving(serve, batch=batch, src_h=src_h, src_w=src_w)
    assert len(blob) > 1000
    path = tmp_path / "model.ghlo"
    path.write_bytes(blob)

    imgs, p2, p2_inv, scale = _example_inputs(batch, src_h, src_w)
    # jit the live baseline: the artifact is a compiled program, and on TPU
    # eager-vs-fused dispatch legitimately differs in f32 reduction order
    want_d, want_v = jax.block_until_ready(
        jax.jit(serve)(imgs, p2, p2_inv, scale))
    loaded = load_serving(path.read_bytes())
    got_d, got_v = jax.block_until_ready(loaded(imgs, p2, p2_inv, scale))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               atol=1e-5)
    # the artifact is a self-contained program: also callable under jit
    got_d2, got_v2 = jax.jit(loaded)(imgs, p2, p2_inv, scale)
    np.testing.assert_array_equal(np.asarray(got_v2), np.asarray(want_v))
    np.testing.assert_allclose(np.asarray(got_d2), np.asarray(want_d),
                               atol=1e-5)


def test_serve_script_runs_artifact_without_model_code(tiny_pipeline,
                                                       tmp_path):
    """scripts/serve.py: artifact + images -> KITTI txt, via subprocess."""
    import json
    import os
    import subprocess
    import sys

    from PIL import Image

    from groomed_nms_tpu.export import build_serving_fn, export_serving
    from test_scripts_e2e import _subprocess_env

    model, variables, rois, rois_3d, dcfg = tiny_pipeline
    serve = build_serving_fn(
        model, variables, rois, rois_3d, np.zeros(13, np.float32),
        np.ones(13, np.float32), np.array([0.485, 0.456, 0.406]),
        np.array([0.229, 0.224, 0.225]), dcfg, target_h=64, crop_w=128,
        bf16_input=False)
    batch, src_h, src_w = 2, 48, 96
    art = tmp_path / "model.ghlo"
    art.write_bytes(export_serving(serve, batch=batch, src_h=src_h,
                                   src_w=src_w))
    (tmp_path / "model.ghlo.json").write_text(json.dumps({
        "batch": batch, "src_hw": [src_h, src_w], "crop_size": [64, 128],
        "class_names": ["Car", "Pedestrian", "Cyclist"],
        "score_thres": 0.0}))

    img_dir = tmp_path / "images"
    cal_dir = tmp_path / "calib"
    img_dir.mkdir(), cal_dir.mkdir()
    rs = np.random.default_rng(0)
    for i in range(3):   # 3 images -> exercises a ragged final batch
        Image.fromarray(rs.integers(0, 256, (src_h, src_w, 3),
                                    dtype=np.uint8)).save(
            img_dir / f"{i:06d}.png")
        (cal_dir / f"{i:06d}.txt").write_text(
            "P2: 300.0 0.0 48.0 0.0 0.0 300.0 24.0 0.0 0.0 0.0 1.0 0.0\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = tmp_path / "results"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "serve.py"),
         "--artifact", str(art), "--images", str(img_dir),
         "--calib", str(cal_dir), "--out", str(out_dir)],
        env=_subprocess_env(1), capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    txts = sorted(os.listdir(out_dir))
    assert txts == ["000000.txt", "000001.txt", "000002.txt"]
    for t in txts:
        for line in (out_dir / t).read_text().splitlines():
            f = line.split()
            assert len(f) == 16 and f[0] in ("Car", "Pedestrian", "Cyclist")


def test_video_export_roundtrip_matches_live(tmp_path):
    """Clip-in/tracks-out video serving artifact reproduces the live jit."""
    import jax
    import jax.numpy as jnp

    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.export import (build_video_serving_fn,
                                        export_video_serving, load_serving)
    from groomed_nms_tpu.models.densenet import tiny_densenet_config
    from groomed_nms_tpu.models.rpn_3d import RPNConfig
    from groomed_nms_tpu.models.video import VideoConfig, VideoRPN3D

    rpn_cfg = RPNConfig(num_classes=4, num_anchors=4, prop_features=32,
                        predict_uncertainty=True,
                        backbone=tiny_densenet_config())
    vcfg = VideoConfig(rpn=rpn_cfg, max_measurements=16, max_tracks=32,
                       score_thres=0.1)
    model = VideoRPN3D(vcfg)
    f, th, tw = 3, 64, 128
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, f, th, tw, 3)), train=False)

    rs = np.random.default_rng(0)
    templates = np.abs(rs.normal(size=(4, 4))).astype(np.float32)
    templates[:, 2:] += templates[:, :2] + 16.0
    priors = np.concatenate(
        [templates, np.abs(rs.normal(size=(4, 7))).astype(np.float32) + 1.0],
        axis=1)
    priors[:, 4] = 30.0
    rois = np.asarray(locate_anchors(priors, (4, 8), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]

    serve = build_video_serving_fn(
        model, variables, rois, rois_3d, np.zeros(13, np.float32),
        np.ones(13, np.float32), np.array([0.485, 0.456, 0.406]),
        np.array([0.229, 0.224, 0.225]), vcfg, np.zeros(6), np.ones(6),
        target_h=th, crop_w=tw, bf16_input=False)

    src_h, src_w = 48, 96
    blob = export_video_serving(serve, n_frames=f, src_h=src_h, src_w=src_w)
    path = tmp_path / "video.ghlo"
    path.write_bytes(blob)

    clip = rs.integers(0, 256, (f, src_h, src_w, 3), dtype=np.uint8)
    p2 = np.eye(4, dtype=np.float32)
    p2[0, 0] = p2[1, 1] = 700.0
    p2[0, 2], p2[1, 2] = 60.0, 18.0
    p2_inv = np.linalg.inv(p2)
    scale = np.full((f,), th / src_h, np.float32)
    want = jax.block_until_ready(jax.jit(serve)(clip, p2, p2_inv, scale))
    loaded = load_serving(path.read_bytes())
    got = jax.block_until_ready(loaded(clip, p2, p2_inv, scale))
    # Tracks NamedTuple round-trips as a pytree with identical leaves
    assert type(got).__name__ == type(want).__name__
    for name, g, w in zip(want._fields, got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5,
                                   err_msg=name)
    assert int(np.asarray(want.valid).sum()) > 0  # tracker produced tracks


def test_export_rejects_wrong_shape(tiny_pipeline):
    from groomed_nms_tpu.export import (build_serving_fn, export_serving,
                                        load_serving)

    model, variables, rois, rois_3d, dcfg = tiny_pipeline
    serve = build_serving_fn(
        model, variables, rois, rois_3d, np.zeros(13, np.float32),
        np.ones(13, np.float32), np.array([0.485, 0.456, 0.406]),
        np.array([0.229, 0.224, 0.225]), dcfg, target_h=64, crop_w=128,
        bf16_input=False)
    blob = export_serving(serve, batch=2, src_h=48, src_w=96)
    loaded = load_serving(blob)
    imgs, p2, p2_inv, scale = _example_inputs(4, 48, 96)  # wrong batch
    with pytest.raises(ValueError):
        loaded(imgs, p2, p2_inv, scale)
