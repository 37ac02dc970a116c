"""Freeze masks + anchor clustering."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from groomed_nms_tpu.anchors import cluster_anchors
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
    rng = np.random.default_rng(0)
    # two clear size modes
    wh = np.concatenate([
        rng.normal([40, 30], 2, size=(100, 2)),
        rng.normal([200, 120], 5, size=(100, 2)),
    ])
    centers = cluster_anchors(wh, 2, seed=1)
    assert centers.shape == (2, 2)
    np.testing.assert_allclose(centers[0], [40, 30], atol=6)
    np.testing.assert_allclose(centers[1], [200, 120], atol=12)
