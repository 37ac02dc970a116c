"""Parity of the weight-folded fast-eval engine vs the flax module."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from groomed_nms_tpu.models import RPN3D, RPNConfig
from groomed_nms_tpu.models.densenet import DenseNetBackbone, \
    tiny_densenet_config
from groomed_nms_tpu.models.fast_eval import backbone_eval, rpn_eval


def test_backbone_eval_matches_flax_f32():
    bcfg = tiny_densenet_config()
    model = DenseNetBackbone(bcfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # make running stats non-trivial so BN folding is actually exercised
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.1 * jnp.cos(jnp.arange(v.size, dtype=v.dtype)
                                       ).reshape(v.shape)
        if "batch_stats" in str(p[0]) else v, variables)
    ref = model.apply(variables, x, train=False)
    got = backbone_eval(variables["params"], variables["batch_stats"],
                        bcfg, x, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_backbone_eval_matches_flax_bf16():
    bcfg = tiny_densenet_config(dtype=jnp.bfloat16)
    model = DenseNetBackbone(bcfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False), np.float32)
    got = np.asarray(backbone_eval(variables["params"],
                                   variables["batch_stats"], bcfg, x,
                                   interpret=True), np.float32)
    # bf16 accumulation orders differ; demand close agreement, not bits
    scale = np.abs(ref).mean() + 1e-3
    assert np.abs(got - ref).mean() / scale < 0.02
    np.testing.assert_allclose(got, ref, atol=0.15 * scale + 0.05)


def test_rpn_eval_matches_flax_and_detects_identically():
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.inference import (DetectConfig, im_detect_3d,
                                           rpn_outputs_dict)

    a = 6
    cfg = RPNConfig(num_classes=4, num_anchors=a, prop_features=32,
                    predict_acceptance_prob=True,
                    backbone=tiny_densenet_config())
    model = RPN3D(cfg)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), images, train=False)

    ref = model.apply(variables, images, train=False)
    got = rpn_eval(variables, images, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got.prob), np.asarray(ref.prob),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.bbox_3d),
                               np.asarray(ref.bbox_3d), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.accept_prob),
                               np.asarray(ref.accept_prob), atol=5e-4)

    # end-to-end: detections from both forwards agree
    priors = np.abs(rng.normal(size=(a, 11))).astype(np.float32) + 1.0
    priors[:, 2:4] += priors[:, 0:2] + 16.0
    rois = np.asarray(locate_anchors(priors, (4, 6), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    args = (jnp.asarray(rois), jnp.asarray(rois_3d), jnp.asarray(p2),
            jnp.asarray(np.linalg.inv(p2)), jnp.ones((2,), jnp.float32),
            np.zeros(13, np.float32), np.ones(13, np.float32))
    dcfg = DetectConfig(nms_topN_pre=64, nms_topN_post=8)
    o1, v1 = im_detect_3d(rpn_outputs_dict(ref), *args, dcfg)
    o2, v2 = im_detect_3d(rpn_outputs_dict(got), *args, dcfg)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-3)
