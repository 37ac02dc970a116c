"""AP-loss parity: vectorized custom_vjp vs a direct loop transcription.

Oracle = the published AP-loss algorithm (Chen et al. CVPR'19) implemented
as an explicit python loop, the same algorithm the reference packages in
lib/loss/aploss.py (its test/test_aploss.py compares against the inlined
original in the same way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.losses import ap_loss
from groomed_nms_tpu.losses.ranknet import ranknet_loss


def ap_loss_oracle(logits, targets, delta=1.0):
    """Direct loop transcription of the AP-loss forward + hand gradient."""
    logits = np.asarray(logits, np.float64)
    targets = np.asarray(targets)
    grad = np.zeros_like(logits)
    if (targets == 1).sum() == 0:
        return 0.0, grad
    labels_p = targets == 1
    fg_logits = logits[labels_p]
    threshold = fg_logits.min() - delta
    valid_n = (targets == 0) & (logits >= threshold)
    bg_logits = logits[valid_n]
    bg_grad = np.zeros(len(bg_logits))
    fg_num = len(fg_logits)
    prec = np.zeros(fg_num)
    order = np.argsort(fg_logits)
    max_prec = 0.0
    for ii in order:
        t1 = np.clip((fg_logits - fg_logits[ii]) / (2 * delta) + 0.5, 0, 1)
        t2 = np.clip((bg_logits - fg_logits[ii]) / (2 * delta) + 0.5, 0, 1)
        a = t1.sum() + 0.5
        b = t2.sum()
        t2 = t2 / (a + b)
        cur = a / (a + b)
        if max_prec <= cur:
            max_prec = cur
        else:
            t2 = t2 * ((1 - max_prec) / (1 - cur))
        bg_grad += t2
        prec[ii] = max_prec
    grad[valid_n] = bg_grad
    grad[labels_p] = -(1 - prec)
    grad /= max(fg_num, 1)
    return 1.0 - prec.sum() / max(fg_num, 1), grad


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ap_loss_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 64
    logits = rng.uniform(0, 1, n).astype(np.float32)
    targets = rng.choice([1.0, 0.0, -1.0], size=n, p=[0.2, 0.6, 0.2])
    want, want_grad = ap_loss_oracle(logits, targets)

    got = float(ap_loss(jnp.asarray(logits), jnp.asarray(targets)))
    got_grad = np.asarray(jax.grad(
        lambda l: ap_loss(l, jnp.asarray(targets)))(jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got_grad, want_grad, atol=1e-5)


def test_ap_loss_no_positives_is_zero():
    logits = jnp.asarray(np.linspace(0, 1, 16), jnp.float32)
    targets = jnp.zeros(16)
    assert float(ap_loss(logits, targets)) == 0.0
    g = jax.grad(lambda l: ap_loss(l, targets))(logits)
    assert float(jnp.abs(g).sum()) == 0.0


def test_ap_loss_perfect_ranking_near_zero():
    # positives all scored above negatives -> precision 1 at every positive
    logits = jnp.asarray([0.9, 0.8, 0.2, 0.1], jnp.float32)
    targets = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    loss = float(ap_loss(logits, targets))
    want, _ = ap_loss_oracle(np.asarray(logits), np.asarray(targets))
    np.testing.assert_allclose(loss, want, atol=1e-6)
    # ...and strictly better than the inverted ranking
    inv = float(ap_loss(logits[::-1], targets))
    assert loss < inv


def test_ap_loss_under_vmap():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.uniform(0, 1, (4, 32)), jnp.float32)
    targets = jnp.asarray(rng.choice([1.0, 0.0], size=(4, 32)))
    vals = jax.vmap(ap_loss)(logits, targets)
    singles = [float(ap_loss(logits[i], targets[i])) for i in range(4)]
    np.testing.assert_allclose(np.asarray(vals), singles, atol=1e-6)


def test_ranknet_prefers_correct_order():
    scores_good = jnp.asarray([2.0, 1.0, 0.0])
    scores_bad = jnp.asarray([0.0, 1.0, 2.0])
    rel = jnp.asarray([2.0, 1.0, 0.0])
    assert float(ranknet_loss(scores_good, rel)) < \
        float(ranknet_loss(scores_bad, rel))
    # padded entries don't change the loss
    padded = float(ranknet_loss(
        jnp.asarray([2.0, 1.0, 0.0, 9.0]), jnp.asarray([2.0, 1.0, 0.0, 5.0]),
        valid_mask=jnp.asarray([True, True, True, False])))
    np.testing.assert_allclose(padded, float(ranknet_loss(scores_good, rel)),
                               atol=1e-6)


def test_custom_mse_matches_autodiff():
    """custom_vjp hand gradient == autodiff MSE (reference
    test/test_custom_loss.py parity check), incl. loss-weight scaling."""
    from groomed_nms_tpu.losses.custom_loss import custom_mse
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    tar = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    for w in (1.0, 2.5):
        got = float(custom_mse(pred, tar, w))
        want = float(w * jnp.mean((pred - tar) ** 2))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        g_got = jax.grad(lambda p: custom_mse(p, tar, w))(pred)
        g_want = jax.grad(lambda p: w * jnp.mean((p - tar) ** 2))(pred)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-6)
