"""Classical / soft NMS parity tests vs the numpy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from groomed_nms_tpu.ops.nms import (
    greedy_nms,
    greedy_nms_numpy,
    soft_nms,
    top_k_after_nms,
)


def _random_dets(rng, n=60, span=60.0):
    boxes = np.zeros((n, 4), np.float32)
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(2, 25, (n, 2))
    boxes[:, :2] = xy
    boxes[:, 2:] = xy + wh
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_greedy_nms_matches_numpy_oracle():
    for seed in range(8):
        rng = np.random.default_rng(seed)
        boxes, scores = _random_dets(rng)
        keep = np.asarray(greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                     nms_threshold=0.4, shift=1.0))
        dets = np.hstack([boxes, scores[:, None]])
        expect = set(greedy_nms_numpy(dets, 0.4, shift=1.0).tolist())
        assert set(np.flatnonzero(keep).tolist()) == expect


def test_greedy_nms_with_padding():
    rng = np.random.default_rng(3)
    boxes, scores = _random_dets(rng, n=30)
    pad_boxes = np.zeros((50, 4), np.float32)
    pad_boxes[:30] = boxes
    pad_scores = np.zeros(50, np.float32)
    pad_scores[:30] = scores
    mask = np.zeros(50, bool)
    mask[:30] = True
    keep_pad = np.asarray(greedy_nms(jnp.asarray(pad_boxes), jnp.asarray(pad_scores),
                                     jnp.asarray(mask), nms_threshold=0.4))
    keep = np.asarray(greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                 nms_threshold=0.4))
    np.testing.assert_array_equal(keep_pad[:30], keep)
    assert not keep_pad[30:].any()


def test_soft_nms_hard_method_matches_greedy():
    """With method='hard', decay-to-zero == classical suppression."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        boxes, scores = _random_dets(rng, n=40)
        _, keep_soft = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                nms_threshold=0.4, method="hard",
                                score_threshold=0.001)
        keep_hard = np.asarray(greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                          nms_threshold=0.4))
        np.testing.assert_array_equal(np.asarray(keep_soft), keep_hard)


def test_soft_nms_gaussian_decays_scores():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    new_scores, keep = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                method="gaussian", sigma=0.5)
    ns = np.asarray(new_scores)
    assert ns[0] == 0.9          # top box untouched
    assert ns[1] < 0.8           # overlapping box decayed
    assert abs(ns[2] - 0.7) < 1e-5  # disjoint box barely touched
    assert np.asarray(keep).all()


def test_top_k_after_nms():
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [20, 20, 30, 30, 0.8],
        [40, 40, 50, 50, 0.3],
    ], np.float32)
    keep = np.array([True, True, True])
    out = top_k_after_nms(dets, keep, top_n=2)
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out[:, 4], [0.9, 0.8])
    out2 = top_k_after_nms(dets, keep, top_n=3, score_threshold=0.5)
    np.testing.assert_allclose(out2[:, 4], [0.9, 0.8])


def test_blocked_nms_matches_sweep_and_oracle(rng):
    """greedy_nms_blocked must agree exactly with the sequential sweep and
    the numpy oracle, across tile boundaries and padding."""
    import jax.numpy as jnp
    from groomed_nms_tpu.ops.nms import (greedy_nms, greedy_nms_blocked,
                                         greedy_nms_numpy)

    for n, tile in [(50, 16), (300, 64), (513, 128)]:
        x1 = rng.uniform(0, 800, n)
        y1 = rng.uniform(0, 400, n)
        w = rng.uniform(20, 200, n)
        h = rng.uniform(20, 150, n)
        boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) > 0.1

        keep_seq = np.asarray(greedy_nms(jnp.asarray(boxes),
                                         jnp.asarray(scores),
                                         jnp.asarray(valid),
                                         nms_threshold=0.4))
        keep_blk = np.asarray(greedy_nms_blocked(jnp.asarray(boxes),
                                                 jnp.asarray(scores),
                                                 jnp.asarray(valid),
                                                 nms_threshold=0.4,
                                                 tile=tile))
        np.testing.assert_array_equal(keep_blk, keep_seq), (n, tile)

        dets = np.hstack([boxes[valid], scores[valid, None]])
        oracle = greedy_nms_numpy(dets, 0.4)
        idx_valid = np.flatnonzero(valid)
        np.testing.assert_array_equal(sorted(idx_valid[oracle]),
                                      np.flatnonzero(keep_blk))


def test_blocked_nms_suppression_chain(rng):
    """Chain case: 0 suppresses 1, 1 would suppress 2 -> 2 must survive."""
    import jax.numpy as jnp
    from groomed_nms_tpu.ops.nms import greedy_nms_blocked

    boxes = np.array([
        [0, 0, 100, 100],
        [40, 0, 140, 100],    # overlaps box 0 heavily
        [80, 0, 180, 100],    # overlaps box 1 heavily, box 0 barely
        [300, 0, 400, 100],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    keep = np.asarray(greedy_nms_blocked(jnp.asarray(boxes),
                                         jnp.asarray(scores),
                                         nms_threshold=0.4, tile=2))
    np.testing.assert_array_equal(keep, [True, False, True, True])


def test_cpp_oracle_matches_numpy(rng):
    """C++ ctypes oracle == numpy oracle == device kernels."""
    import shutil
    if shutil.which("make") is None:
        pytest.skip("no C++ toolchain")
    import jax.numpy as jnp
    from groomed_nms_tpu.ops.nms import (greedy_nms_blocked, greedy_nms_cpp,
                                         greedy_nms_numpy)

    n = 200
    x1 = rng.uniform(0, 800, n)
    y1 = rng.uniform(0, 400, n)
    w = rng.uniform(20, 200, n)
    h = rng.uniform(20, 150, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    dets = np.hstack([boxes, scores[:, None]])

    keep_cpp = greedy_nms_cpp(dets, 0.4)
    keep_np = greedy_nms_numpy(dets, 0.4)
    np.testing.assert_array_equal(keep_cpp, keep_np)

    keep_dev = np.asarray(greedy_nms_blocked(jnp.asarray(boxes),
                                             jnp.asarray(scores),
                                             nms_threshold=0.4))
    np.testing.assert_array_equal(np.flatnonzero(keep_dev),
                                  np.sort(keep_cpp))
