"""Pallas fused IoU+prune kernel vs the reference jnp implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.ops.iou import pairwise_iou
from groomed_nms_tpu.ops.groomed_nms import pruning_function
from groomed_nms_tpu.ops.pallas_kernels import fused_iou_prune


def _boxes(rng, n):
    x1 = rng.uniform(0, 800, n)
    y1 = rng.uniform(0, 400, n)
    w = rng.uniform(20, 200, n)
    h = rng.uniform(20, 150, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


@pytest.mark.parametrize("n", [64, 256, 500])
@pytest.mark.parametrize("method", ["linear", "sigmoidal", "soft_nms"])
def test_fused_matches_reference(rng, n, method):
    boxes = _boxes(rng, n)
    iou_k, prune_k = fused_iou_prune(
        jnp.asarray(boxes), pruning_method=method, temperature=0.1,
        interpret=True)
    iou_ref = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    p_ref = np.asarray(pruning_function(iou_ref, temperature=0.1,
                                        pruning_method=method))
    p_ref = np.tril(p_ref, -1)
    np.testing.assert_allclose(np.asarray(iou_k), iou_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(prune_k), p_ref, atol=2e-5)


def test_fused_valid_mask(rng):
    n = 100
    boxes = _boxes(rng, n)
    valid = rng.uniform(0, 1, n) > 0.3
    iou_k, prune_k = fused_iou_prune(jnp.asarray(boxes),
                                     valid_mask=jnp.asarray(valid),
                                     interpret=True)
    iou_k = np.asarray(iou_k)
    assert (iou_k[~valid, :] == 0).all()
    assert (iou_k[:, ~valid] == 0).all()
    assert (np.asarray(prune_k)[~valid, :] == 0).all()


def test_fused_head_scores_matches_softmax():
    import jax
    from groomed_nms_tpu.ops.pallas_kernels import fused_head_scores
    rng = np.random.default_rng(2)
    for b, r, per, c in ((2, 640, 18, 4), (1, 100, 19, 4), (3, 1300, 9, 2)):
        fused = jnp.asarray(rng.normal(size=(b, r, per)) * 3, jnp.float32)
        accept = jnp.asarray(rng.uniform(0.1, 1, (b, r)), jnp.float32)
        ref = jnp.max(jax.nn.softmax(fused[..., :c], axis=-1)[..., 1:],
                      axis=-1)
        got = fused_head_scores(fused, None, num_classes=c, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
        got_a = fused_head_scores(fused, accept, num_classes=c,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(got_a),
                                   np.asarray(ref * accept), atol=1e-6)
    # bf16 input path (the production dtype)
    fused16 = jnp.asarray(rng.normal(size=(2, 256, 18)), jnp.bfloat16)
    ref = jnp.max(jax.nn.softmax(fused16.astype(jnp.float32)[..., :4],
                                 axis=-1)[..., 1:], axis=-1)
    got = fused_head_scores(fused16, None, num_classes=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_greedy_nms_pallas_matches_blocked():
    from groomed_nms_tpu.ops.nms import greedy_nms_blocked, greedy_nms_numpy
    from groomed_nms_tpu.ops.pallas_kernels import greedy_nms_pallas
    rng = np.random.default_rng(7)
    for b, n in ((2, 300), (3, 700)):
        boxes = np.zeros((b, n, 4), np.float32)
        boxes[..., 0] = rng.uniform(0, 800, (b, n))
        boxes[..., 1] = rng.uniform(0, 300, (b, n))
        boxes[..., 2] = boxes[..., 0] + rng.uniform(10, 200, (b, n))
        boxes[..., 3] = boxes[..., 1] + rng.uniform(10, 150, (b, n))
        scores = np.sort(rng.uniform(0.01, 1, (b, n)))[:, ::-1].copy()
        scores[:, -40:] = 0.0   # padded rows
        keep = np.asarray(greedy_nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), nms_threshold=0.4,
            shift=1.0, interpret=True))
        for i in range(b):
            ref = np.asarray(greedy_nms_blocked(
                jnp.asarray(boxes[i]), jnp.asarray(scores[i]),
                valid_mask=jnp.asarray(scores[i] > 0), nms_threshold=0.4,
                shift=1.0))
            np.testing.assert_array_equal(keep[i], ref)
            # and against the numpy oracle (kept indices, already sorted)
            dets = np.concatenate([boxes[i], scores[i][:, None]], axis=1)
            live = dets[scores[i] > 0]
            oracle = greedy_nms_numpy(live, 0.4, shift=1.0)
            np.testing.assert_array_equal(np.flatnonzero(keep[i]),
                                          np.sort(oracle))
