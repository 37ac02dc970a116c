"""AP-loss (Chen et al., CVPR 2019) with a hand-specified gradient.

Capability match for the reference's lib/loss/aploss.py:14-97, which ports
the official AP-loss implementation as a torch ``autograd.Function`` whose
backward returns a gradient stored during forward.  That maps directly onto
``jax.custom_vjp``.

TPU re-design: the reference iterates positives one at a time in ascending
score order (an O(F) python loop of O(F+N) tensor ops).  The only sequential
dependency in that loop is the running ``max_prec`` clamp, so here the whole
computation is batched into two [N, N] matrix ops plus a cumulative max --
MXU/VPU friendly and O(N^2) work with no host loop:

  rank terms    H_ij = clamp((s_j - s_i) / (2 delta) + 0.5, 0, 1)
  a_i = sum_{j in P} H_ij + 0.5,  b_i = sum_{j in valid N} H_ij
  prec_i = cummax over positives ascending of a_i / (a_i + b_i)
  scale_i = 1 if current >= running max else (1 - max) / (1 - current)
  d/ds_j = sum_i H_ij * scale_i / (a_i + b_i) / F   (negatives)
  d/ds_i = -(1 - prec_i) / F                        (positives)

Targets: 1 = positive, 0 = negative, anything else (-1) = ignored, matching
the reference's convention.  Returns ``1 - mean interpolated precision``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DELTA = 1.0


def _ap_forward(logits, targets):
    logits = logits.astype(jnp.float32)
    pos = targets == 1
    neg = targets == 0
    n = logits.shape[0]
    fg_num = jnp.sum(pos)
    any_pos = fg_num > 0

    min_fg = jnp.min(jnp.where(pos, logits, jnp.inf))
    threshold = min_fg - _DELTA
    valid_neg = neg & (logits >= threshold)

    # pairwise rank terms: rows = reference positive i, cols = other box j
    h = jnp.clip((logits[None, :] - logits[:, None]) / (2 * _DELTA) + 0.5,
                 0.0, 1.0)
    a = jnp.where(pos, jnp.sum(h * pos[None, :], axis=1), 0.0) + 0.5
    b = jnp.sum(h * valid_neg[None, :], axis=1)
    current = a / (a + b)

    # running max of precision in ascending positive-score order
    order = jnp.argsort(jnp.where(pos, logits, jnp.inf), stable=True)
    cur_sorted = jnp.where(pos[order], current[order], -jnp.inf)
    running = jax.lax.associative_scan(jnp.maximum, cur_sorted)
    prev = jnp.concatenate([jnp.array([-jnp.inf]), running[:-1]])
    scale_sorted = jnp.where(
        cur_sorted >= prev, 1.0,
        (1.0 - running) / jnp.maximum(1.0 - cur_sorted, 1e-12))

    prec = jnp.zeros((n,), jnp.float32).at[order].set(
        jnp.where(pos[order], running, 0.0))
    scale = jnp.zeros((n,), jnp.float32).at[order].set(
        jnp.where(pos[order], scale_sorted, 0.0))

    fg_den = jnp.maximum(fg_num, 1).astype(jnp.float32)
    w = jnp.where(pos, scale / (a + b), 0.0)
    grad_neg = jnp.where(valid_neg, w @ h, 0.0)
    grad_pos = jnp.where(pos, -(1.0 - prec), 0.0)
    grad = jnp.where(any_pos, (grad_neg + grad_pos) / fg_den, 0.0)

    metric = jnp.where(any_pos, 1.0 - jnp.sum(prec) / fg_den, 0.0)
    return metric, grad


@jax.custom_vjp
def ap_loss(logits, targets):
    """AP ranking loss. logits [N] scores, targets [N] in {1, 0, -1}."""
    metric, _ = _ap_forward(logits, targets)
    return metric


def _ap_fwd(logits, targets):
    metric, grad = _ap_forward(logits, targets)
    return metric, grad


def _ap_bwd(grad_stored, g):
    return grad_stored * g, None


ap_loss.defvjp(_ap_fwd, _ap_bwd)
