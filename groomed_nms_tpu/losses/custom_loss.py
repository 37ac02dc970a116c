"""Hand-gradient MSE: the custom-gradient pattern sanity check.

Capability match for the reference's CustomLoss (lib/loss/custom_loss.py:
4-23), a torch autograd.Function with an explicit backward used as the
template/sanity-baseline for hand-written-gradient losses (the AP-loss
follows the same pattern).  Here the analog is ``jax.custom_vjp``; the test
suite checks it against autodiff MSE exactly like the reference's
test_custom_loss.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def custom_mse(pred, target, loss_weight=1.0):
    return loss_weight * jnp.mean((pred - target) ** 2)


def _fwd(pred, target, loss_weight):
    return custom_mse(pred, target, loss_weight), (pred, target, loss_weight)


def _bwd(res, g):
    pred, target, loss_weight = res
    n = pred.size
    grad = loss_weight * 2.0 * (pred - target) / n
    return grad * g, None, None


custom_mse.defvjp(_fwd, _bwd)
