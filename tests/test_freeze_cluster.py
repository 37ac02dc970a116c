"""Freeze masks + anchor clustering."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from groomed_nms_tpu.anchors import anchor_center, cluster_anchors
from groomed_nms_tpu.training.freeze import (freeze_bn_mask, freeze_mask,
                                             wrap_with_freeze)


def _params():
    return {
        "backbone": {
            "conv0": {"kernel": jnp.ones((3, 3))},
            "norm0": {"scale": jnp.ones((3,)), "bias": jnp.zeros((3,))},
        },
        "head": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros((2,))},
    }


def test_freeze_blacklist():
    params = _params()
    labels = freeze_mask(params, frozen_substrings=("backbone",))
    assert labels["backbone"]["conv0"]["kernel"] == "freeze"
    assert labels["head"]["kernel"] == "train"


def test_freeze_whitelist():
    params = _params()
    labels = freeze_mask(params, trainable_substrings=("head",))
    assert labels["backbone"]["norm0"]["scale"] == "freeze"
    assert labels["head"]["bias"] == "train"


def test_freeze_bn():
    labels = freeze_bn_mask(_params())
    assert labels["backbone"]["norm0"]["scale"] == "freeze"
    assert labels["backbone"]["conv0"]["kernel"] == "train"


def test_wrapped_optimizer_zeroes_frozen():
    params = _params()
    labels = freeze_mask(params, frozen_substrings=("backbone",))
    tx = wrap_with_freeze(optax.sgd(0.1), labels)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["conv0"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["head"]["kernel"]).sum()) > 0


def test_cluster_anchors():
    """Two clear GT size modes pull two seed anchors onto the mode means,
    and the 3D prior columns get the per-cluster means of cols 6..10."""
    rng = np.random.default_rng(0)
    stride = 16
    rows = []
    for mode_wh, mode_z in (((40, 30), 20.0), ((200, 120), 5.0)):
        for _ in range(100):
            w, h = rng.normal(mode_wh, (2, 2))
            b3 = np.zeros(16)
            b3[2] = rng.normal(mode_z, 0.5)         # cz2d (prior col z)
            b3[3:6] = rng.normal([1.6, 1.5, 3.9], 0.1)
            b3[6] = rng.uniform(-0.5, 0.5)          # alpha
            rows.append(np.concatenate([anchor_center(w, h, stride), b3]))
    gts = np.stack(rows)
    anchors = np.zeros((2, 9))
    anchors[0, :4] = anchor_center(50, 35, stride)
    anchors[1, :4] = anchor_center(180, 110, stride)
    out = cluster_anchors(anchors, gts, stride)
    assert out.shape == (2, 9)
    w_out = out[:, 2] - out[:, 0]
    h_out = out[:, 3] - out[:, 1]
    np.testing.assert_allclose([w_out[0], h_out[0]], [40, 30], atol=6)
    np.testing.assert_allclose([w_out[1], h_out[1]], [200, 120], atol=12)
    np.testing.assert_allclose(out[:, 4], [20.0, 5.0], atol=0.5)

    # an anchor no GT prefers raises (reference lib/rpn_util.py:392)
    far = np.zeros((3, 9))
    far[:2] = anchors
    far[2, :4] = anchor_center(1000, 900, stride)
    with np.testing.assert_raises(ValueError):
        cluster_anchors(far, gts, stride)
