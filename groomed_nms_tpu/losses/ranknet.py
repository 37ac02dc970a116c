"""RankNet pairwise ranking loss (Burges et al., 2005).

Capability match for the reference's lib/loss/ranknetloss.py:16-78 (an
allRank port): pairwise binary cross-entropy with logits over all ordered
pairs whose ground-truth relevance differs, masking padded entries.
"""

from __future__ import annotations

import jax.numpy as jnp


def ranknet_loss(scores, relevance, valid_mask=None, weight_by_diff=False):
    """Pairwise BCE-with-logits rank loss.

    Args:
      scores: [N] predicted scores (logits).
      relevance: [N] ground-truth relevance.
      valid_mask: optional [N] bool; padded entries join no pairs.

    Returns scalar mean over valid pairs (i, j) with rel_i != rel_j of
    BCE(sigmoid(s_i - s_j), 1[rel_i > rel_j]).
    """
    scores = scores.astype(jnp.float32)
    relevance = relevance.astype(jnp.float32)
    if valid_mask is None:
        valid_mask = jnp.ones(scores.shape, bool)

    s_diff = scores[:, None] - scores[None, :]
    r_diff = relevance[:, None] - relevance[None, :]
    pair_valid = valid_mask[:, None] & valid_mask[None, :] & (r_diff != 0)
    label = (r_diff > 0).astype(jnp.float32)

    # numerically stable BCE with logits
    bce = jnp.maximum(s_diff, 0) - s_diff * label + jnp.log1p(
        jnp.exp(-jnp.abs(s_diff)))
    if weight_by_diff:
        bce = bce * jnp.abs(r_diff)
    count = jnp.maximum(jnp.sum(pair_valid), 1)
    return jnp.sum(jnp.where(pair_valid, bce, 0.0)) / count
