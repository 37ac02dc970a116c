"""Parity tests for the GrooMeD-NMS operator.

Golden expectations come from the reference's manual test scripts
(test/test_differentiable_nms_forward.py:124-140, expected outputs embedded
in comments) and from independent numpy oracles implemented here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.ops.groomed_nms import (
    differentiable_nms,
    differentiable_nms_indices,
    group_leaders,
    pruning_function,
    soft_sort,
)
from groomed_nms_tpu.ops.iou import pairwise_iou
from groomed_nms_tpu.ops.nms import greedy_nms_numpy


def test_golden_case_4boxes():
    # reference test/test_differentiable_nms_forward.py:127-132
    # "Out id=[0.990, 0.980, 0.000, 0.700]"
    iou = np.array([
        [1.00, 0.00, 0.00, 0.00],
        [0.00, 1.00, 0.00, 0.00],
        [0.90, 0.90, 1.00, 0.00],
        [0.00, 0.00, 0.00, 1.00],
    ], dtype=np.float32)
    scores = np.array([0.99, 0.98, 0.8, 0.7], dtype=np.float32)
    res = differentiable_nms(scores, iou, nms_threshold=0.4, temperature=0.1,
                             valid_box_prob_threshold=0.3)
    np.testing.assert_allclose(res.rescored, [0.99, 0.98, 0.0, 0.7], atol=1e-6)
    np.testing.assert_array_equal(res.keep, [True, True, False, True])


def test_golden_case_5boxes():
    # reference test/test_differentiable_nms_forward.py:135-140
    # "Out id=[0.990, 0.980, 0.000, 0.000, 0.600]"
    iou = np.array([
        [1.00, 0.00, 0.00, 0.00, 0.00],
        [0.00, 1.00, 0.00, 0.00, 0.00],
        [0.90, 0.90, 1.00, 0.00, 0.00],
        [0.90, 0.90, 0.00, 1.00, 0.00],
        [0.00, 0.00, 0.90, 0.90, 1.00],
    ], dtype=np.float32)
    scores = np.array([0.99, 0.98, 0.8, 0.7, 0.6], dtype=np.float32)
    res = differentiable_nms(scores, iou, nms_threshold=0.4, temperature=0.1)
    np.testing.assert_allclose(res.rescored, [0.99, 0.98, 0.0, 0.0, 0.6], atol=1e-6)
    # boxes 2, 3 group under leader 0; box 4 overlaps only suppressed boxes so
    # it leads its own group and survives (the "grouped" in GrooMeD).
    np.testing.assert_array_equal(res.leader, [0, 1, 0, 0, 4])


def test_masked_rescore_closed_form_random(rng):
    """Masked group mode must equal the explicit block-matrix construction."""
    n = 64
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    iou = rng.uniform(0.0, 1.0, (n, n)).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)

    res = differentiable_nms(scores, iou, nms_threshold=0.4)

    # independent oracle: sort, group greedily, build I - P_masked, matmul
    order = np.argsort(-scores, kind="stable")
    s, m = scores[order], iou[order][:, order]
    p = np.tril(m, k=-1)
    alive = np.ones(n, bool)
    leader = np.full(n, -1)
    while alive.any():
        top = int(np.argmax(alive))
        members = alive & (m[:, top] > 0.4)
        members[top] = True
        take = np.flatnonzero(members)[:101]
        leader[take] = top
        alive &= ~members
    inv = np.zeros((n, n), np.float32)
    for i in range(n):
        if leader[i] >= 0:
            inv[i, i] = 1.0
            if leader[i] != i:
                inv[i, leader[i]] = -p[i, leader[i]]
    expect_sorted = np.clip(inv @ s, 0, 1)
    expect = np.zeros(n, np.float32)
    expect[order] = expect_sorted
    np.testing.assert_allclose(res.rescored, expect, atol=1e-5)


def test_ungrouped_matches_dense_inverse(rng):
    """No-group mode must equal (I + P)^{-1} s computed by dense inverse."""
    n = 32
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    iou = rng.uniform(0.0, 1.0, (n, n)).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)

    res = differentiable_nms(scores, iou, nms_threshold=0.4, group_boxes=False)

    order = np.argsort(-scores, kind="stable")
    s, m = scores[order], iou[order][:, order]
    p = np.tril(m, k=-1)
    expect_sorted = np.clip(np.linalg.inv(np.eye(n) + p) @ s, 0, 1)
    expect_sorted[expect_sorted < 0.3] = 0.0
    expect = np.zeros(n, np.float32)
    expect[order] = expect_sorted
    np.testing.assert_allclose(res.rescored, expect, atol=1e-4)


def test_unmasked_group_matches_blockwise_inverse(rng):
    """Unmasked group mode: per-group (I + P_block)^{-1} blocks."""
    n = 48
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    iou = rng.uniform(0.0, 0.9, (n, n)).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)

    res = differentiable_nms(scores, iou, nms_threshold=0.4,
                             mask_group_boxes=False)

    order = np.argsort(-scores, kind="stable")
    s, m = scores[order], iou[order][:, order]
    p = np.tril(m, k=-1)
    alive = np.ones(n, bool)
    groups = []
    while alive.any():
        top = int(np.argmax(alive))
        members = alive & (m[:, top] > 0.4)
        members[top] = True
        groups.append(np.flatnonzero(members)[:101])
        alive &= ~members
    inv = np.zeros((n, n), np.float32)
    for g in groups:
        blk = np.eye(len(g)) + p[np.ix_(g, g)]
        inv[np.ix_(g, g)] = np.linalg.inv(blk)
    expect_sorted = np.clip(inv @ s, 0, 1)
    expect = np.zeros(n, np.float32)
    expect[order] = expect_sorted
    np.testing.assert_allclose(res.rescored, expect, atol=1e-4)


def test_keep_set_matches_classical_nms_exactly(rng):
    """Exact keep-set equality: GrooMeD == greedy NMS == soft-NMS(hard).

    The reference cross-checks differentiable_nms against gpu_nms,
    girshick_nms and navneeth_soft_nms on the same boxes
    (test/test_differentiable_nms_forward.py:83-122). GrooMeD's keep rule
    (rescored >= 0.3 with linear pruning) provably coincides with classical
    suppression whenever overlaps are polarized -- every pair is either
    clearly suppressing (IoU high enough that score*(1-IoU) < 0.3) or
    clearly disjoint (IoU <= threshold) -- so clustered boxes give an exact
    cross-oracle regime over random scores/cluster structure.
    """
    from groomed_nms_tpu.ops.nms import soft_nms

    for seed in range(8):
        r = np.random.default_rng(seed)
        n_clusters = int(r.integers(2, 7))
        boxes_list, cluster_of = [], []
        for ci in range(n_clusters):
            cx, cy = 200.0 * ci, 150.0 * (ci % 2)
            size = float(r.uniform(30, 60))
            for _ in range(int(r.integers(1, 6))):
                jx, jy = r.uniform(-1, 1), r.uniform(-1, 1)
                boxes_list.append([cx + jx, cy + jy,
                                   cx + size + jx, cy + size + jy])
                cluster_of.append(ci)
        boxes = np.asarray(boxes_list, np.float32)
        n = boxes.shape[0]
        scores = r.uniform(0.4, 1.0, n).astype(np.float32)
        iou = np.asarray(pairwise_iou(boxes, boxes, shift=1.0))
        # the regime premise: polarized overlaps. IoU > 0.72 guarantees
        # suppression under linear pruning (score <= 1.0 -> rescored
        # <= 0.28 < 0.3); IoU <= 0.4 guarantees independence.
        off = iou[~np.eye(n, dtype=bool)]
        assert ((off <= 0.4) | (off > 0.72)).all()

        dets = np.hstack([boxes, scores[:, None]])
        keep_greedy = set(greedy_nms_numpy(dets, 0.4, shift=1.0).tolist())
        _, keep_soft = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                nms_threshold=0.4, method="hard",
                                score_threshold=0.3, shift=1.0)
        keep_soft = set(np.flatnonzero(np.asarray(keep_soft)).tolist())

        for grouped, masked in ((True, True), (True, False), (False, False)):
            res = differentiable_nms(
                scores, iou, nms_threshold=0.4,
                valid_box_prob_threshold=0.3, pruning_method="linear",
                group_boxes=grouped, mask_group_boxes=masked)
            kept = set(np.flatnonzero(np.asarray(res.keep)).tolist())
            assert kept == keep_greedy == keep_soft, (
                seed, grouped, masked, kept, keep_greedy, keep_soft)
        # structural check: exactly the top-scored box of each cluster
        expect = {int(max(np.flatnonzero(np.array(cluster_of) == ci),
                          key=lambda i: scores[i]))
                  for ci in range(n_clusters)}
        assert keep_greedy == expect


def test_valid_mask_padding_equivalence(rng):
    """Padding with valid_mask must not change results for real boxes."""
    n, pad = 24, 40
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    iou = rng.uniform(0, 1, (n, n)).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)

    res_small = differentiable_nms(scores, iou)

    scores_p = np.zeros(pad, np.float32)
    scores_p[:n] = scores
    iou_p = np.zeros((pad, pad), np.float32)
    iou_p[:n, :n] = iou
    np.fill_diagonal(iou_p, 1.0)
    mask = np.zeros(pad, bool)
    mask[:n] = True
    res_pad = differentiable_nms(scores_p, iou_p, valid_mask=mask)

    np.testing.assert_allclose(res_pad.rescored[:n], res_small.rescored, atol=1e-6)
    np.testing.assert_array_equal(res_pad.keep[:n], res_small.keep)
    assert not res_pad.keep[n:].any()
    np.testing.assert_allclose(res_pad.rescored[n:], 0.0)


def test_gradients_flow_and_sign(rng):
    """Backprop through the operator: suppressed boxes get gradients.

    Mirrors test/test_differentiable_nms_backprop_on_subset.py: under an MSE
    pull toward 1 for all boxes, leaders get positive pull and dominated
    boxes' gradients couple to their leader's score.
    """
    iou = np.array([
        [1.00, 0.00, 0.00, 0.00],
        [0.00, 1.00, 0.00, 0.00],
        [0.90, 0.90, 1.00, 0.00],
        [0.00, 0.00, 0.00, 1.00],
    ], dtype=np.float32)
    scores = jnp.array([0.99, 0.98, 0.8, 0.7])

    def loss_fn(s):
        res = differentiable_nms(s, iou, nms_threshold=0.4)
        return jnp.sum((res.rescored - 1.0) ** 2)

    g = jax.grad(loss_fn)(scores)
    assert np.all(np.isfinite(np.asarray(g)))
    # box 2 is fully suppressed (rescore clamps to 0) -> clamp kills its grad,
    # but leaders see d(loss)/ds = 2(s-1) < 0
    assert g[0] < 0 and g[1] < 0 and g[3] < 0


def test_grad_couples_suppressed_to_leader():
    iou = np.array([
        [1.00, 0.60],
        [0.60, 1.00],
    ], dtype=np.float32)
    scores = jnp.array([0.9, 0.8])

    def rescored_1(s):
        return differentiable_nms(s, iou, nms_threshold=0.4).rescored[1]

    g = jax.grad(rescored_1)(scores)
    # r_1 = s_1 - iou * s_0  ->  dr1/ds0 = -0.6, dr1/ds1 = 1
    np.testing.assert_allclose(g, [-0.6, 1.0], atol=1e-6)


def test_pruning_functions():
    o = jnp.array([0.0, 0.4, 0.8])
    np.testing.assert_allclose(pruning_function(o, pruning_method="linear"), o)
    sig = pruning_function(o, nms_threshold=0.4, temperature=0.1,
                           pruning_method="sigmoidal")
    np.testing.assert_allclose(sig, 1 / (1 + np.exp(-(np.asarray(o) - 0.4) / 0.1)),
                               atol=1e-6)
    soft = pruning_function(o, temperature=0.5, pruning_method="soft_nms")
    np.testing.assert_allclose(soft, 1 - np.exp(-np.asarray(o) ** 2 / 0.5), atol=1e-5)


def test_soft_sort_permutes_toward_sorted(rng):
    s = jnp.array([0.1, 0.9, 0.5])
    soft_scores, w = soft_sort(s, temperature=1e-4)
    np.testing.assert_allclose(soft_scores, [0.9, 0.5, 0.1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(w).sum(1), 1.0, atol=1e-2)


def test_soft_sorting_method_runs():
    iou = np.eye(8, dtype=np.float32)
    scores = np.linspace(0.9, 0.4, 8).astype(np.float32)
    res = differentiable_nms(scores, iou, sorting_method="soft",
                             sorting_temperature=0.01)
    assert np.all(np.asarray(res.keep))


def test_group_size_cap():
    """Boxes beyond group_size+1 members fall out of every group -> rescore 0."""
    n = 6
    iou = np.full((n, n), 0.9, dtype=np.float32)
    np.fill_diagonal(iou, 1.0)
    scores = np.linspace(0.99, 0.5, n).astype(np.float32)
    res = differentiable_nms(scores, iou, nms_threshold=0.4, group_size=2)
    # group = first 3 boxes (leader + 2), boxes 3..5 capped out -> leader -1
    np.testing.assert_array_equal(res.leader, [0, 0, 0, -1, -1, -1])
    np.testing.assert_allclose(res.rescored[3:], 0.0)


def test_indices_wrapper_matches_reference_contract():
    iou = np.array([
        [1.00, 0.00, 0.00, 0.00],
        [0.00, 1.00, 0.00, 0.00],
        [0.90, 0.90, 1.00, 0.00],
        [0.00, 0.00, 0.00, 1.00],
    ], dtype=np.float32)
    scores = np.array([0.99, 0.98, 0.8, 0.7], dtype=np.float32)
    valid_idx, invalid_idx, rescored = differentiable_nms_indices(scores, iou)
    assert set(valid_idx.tolist()) == {0, 1, 3}
    assert set(invalid_idx.tolist()) == {2}
    np.testing.assert_allclose(rescored, [0.99, 0.98, 0.0, 0.7], atol=1e-6)


def test_group_leaders_standalone(rng):
    """get_groups parity (reference test/test_get_groups.py)."""
    n = 16
    iou = rng.uniform(0, 1, (n, n)).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)
    scores_sorted = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
    leader = np.asarray(group_leaders(jnp.asarray(iou), jnp.asarray(scores_sorted),
                                      jnp.ones(n, bool), 0.4, 100))
    # oracle: greedy shrinking-array grouping
    alive = np.ones(n, bool)
    expect = np.full(n, -1)
    while alive.any():
        top = int(np.argmax(alive))
        members = alive & (iou[:, top] > 0.4)
        members[top] = True
        take = np.flatnonzero(members)[:101]
        expect[take] = top
        alive &= ~members
    np.testing.assert_array_equal(leader, expect)


def test_jit_and_vmap_batch():
    """The operator must vmap over a batch of images."""
    b, n = 3, 16
    r = np.random.default_rng(1)
    scores = r.uniform(0.3, 1, (b, n)).astype(np.float32)
    iou = r.uniform(0, 1, (b, n, n)).astype(np.float32)
    iou = (iou + np.swapaxes(iou, 1, 2)) / 2
    for i in range(b):
        np.fill_diagonal(iou[i], 1.0)
    batched = jax.vmap(lambda s, m: differentiable_nms(s, m).rescored)
    out = batched(jnp.asarray(scores), jnp.asarray(iou))
    assert out.shape == (b, n)
    for i in range(b):
        ref = differentiable_nms(scores[i], iou[i]).rescored
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


@pytest.mark.parametrize("loss_name", ["ce", "mse", "ap", "ranknet"])
def test_backprop_through_nms_under_each_loss(loss_name, rng):
    """Gradients through GrooMeD-NMS under CE / MSE / AP / RankNet heads.

    Mirrors the reference's backprop-on-subset script
    (test/test_differentiable_nms_backprop_on_subset.py:19-332): rescore a
    box subset with the differentiable NMS, apply each loss against
    relevance targets, and check the score gradient is finite, nonzero,
    and pushes at least one relevant box's score UP (negative gradient),
    which is the property the reference prints and eyeballs (L81)."""
    from groomed_nms_tpu.losses.aploss import ap_loss
    from groomed_nms_tpu.losses.custom_loss import custom_mse
    from groomed_nms_tpu.losses.ranknet import ranknet_loss

    n = 24
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 300, n)
    boxes[:, 1] = rng.uniform(0, 100, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(20, 80, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(20, 60, n)
    iou = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    scores = jnp.asarray(rng.uniform(0.05, 0.95, n), jnp.float32)
    relevance = jnp.asarray((rng.uniform(size=n) > 0.5), jnp.float32)

    def objective(s):
        res = differentiable_nms(s, jnp.asarray(iou), nms_threshold=0.4)
        r = res.rescored
        if loss_name == "ce":
            p = jnp.clip(r, 1e-6, 1 - 1e-6)
            return -jnp.mean(relevance * jnp.log(p) +
                             (1 - relevance) * jnp.log1p(-p))
        if loss_name == "mse":
            return custom_mse(r, relevance)
        if loss_name == "ap":
            return ap_loss(r, relevance)
        return ranknet_loss(r, relevance)

    g = np.asarray(jax.grad(objective)(scores))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    rel = np.asarray(relevance) > 0
    assert (g[rel] < 0).any(), "no relevant box is pushed up"
