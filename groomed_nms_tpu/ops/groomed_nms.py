"""GrooMeD-NMS: grouped, mathematically differentiable NMS (TPU-native).

Re-derivation of the reference operator (lib/groomed_nms.py:10-337) as a
fixed-shape, fully jittable JAX function.  The reference materialises an
N x N "inversion matrix" via per-group ``torch.inverse`` calls and python
loops over ragged group lists; on TPU we exploit the operator's structure
instead:

* **Grouping** (reference ``get_groups``, lib/groomed_nms.py:208-270) is a
  ``lax.while_loop`` over a boolean alive-mask that assigns every box a
  *group leader* index -- no ragged lists, at most N iterations, O(N) work
  per iteration on the VPU.

* **Masked group mode** (the shipped config, lib/groomed_nms.py:105): after
  masking, the block matrix is ``I - P`` with P nonzero only in the leader
  column, so the rescore has the closed form
  ``r_i = clamp(s_i - p(iou(i, leader_i)) * s_leader_i, 0, 1)`` -- a pure
  gather + FMA, no solve at all.

* **Unmasked / ungrouped modes** (lib/groomed_nms.py:107, 110): ``I + P``
  is *unit lower triangular* in score-sorted order (P is strictly lower
  triangular), so ``(I + P)^{-1} s`` is a single triangular solve -- no
  explicit inverse, better conditioned, and differentiable.

Inputs may be padded: pass ``valid_mask`` to mark real boxes.  Padded
entries never join groups, rescore to 0, and are never kept.

Gradients flow through the scores and (optionally) the overlap matrix; the
grouping itself is integer-valued and gradient-free, exactly like the
reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GroomedNMSResult(NamedTuple):
    """All fields are aligned with the *input* box order."""

    rescored: jnp.ndarray   # [N] float; updated scores after NMS
    keep: jnp.ndarray       # [N] bool; rescored >= valid_box_prob_threshold
    leader: jnp.ndarray     # [N] int32; input-order index of each box's group
    #                         leader, or -1 (capped out of a group / padding)


def pruning_function(overlap, nms_threshold=0.4, temperature=0.01,
                     pruning_method="linear"):
    """p(o): probability that an overlap o prunes a lower-scored box.

    Reference lib/groomed_nms.py:167-189.  ``linear`` = identity,
    ``sigmoidal`` = sigma((o - t) / T), ``soft_nms`` = 1 - exp(-o^2 / T).
    """
    overlap = jnp.asarray(overlap)
    if pruning_method == "linear":
        return overlap
    if pruning_method == "sigmoidal":
        return jax.nn.sigmoid((overlap - nms_threshold) / temperature)
    if pruning_method == "soft_nms":
        return 1.0 - jnp.exp(-jnp.square(overlap) / temperature)
    raise NotImplementedError(f"pruning method {pruning_method!r}")


def soft_sort(scores, full_matrix=None, temperature=0.01,
              reference_norm=False):
    """SoftSort (Prillo et al., ICML 2020) continuous argsort.

    Row-softmax of ``-|s - sort(s)^T| / T``; also soft-permutes
    ``full_matrix`` rows.  Reference lib/groomed_nms.py:131-165.

    The reference's final normalisation divides entry (i, j) by *row j's*
    sum instead of row i's -- a torch ``[N, N] / [N]`` broadcasting accident
    (lib/groomed_nms.py:155-156 broadcasts the row-sum vector along dim 0,
    i.e. per column).  By default we use the standard row normalisation
    (same ``+1e-3`` stabiliser); pass ``reference_norm=True`` to reproduce
    the quirk bit-for-bit for ablation parity.
    """
    hard_sorted = jnp.sort(scores)[::-1]
    logits = -jnp.abs(scores[None, :] - hard_sorted[:, None]) / temperature
    logits = logits - logits.max(axis=1, keepdims=True)
    weights = jnp.exp(logits)
    denom = weights.sum(axis=1) + 1e-3
    weights = weights / (denom[None, :] if reference_norm else denom[:, None])
    soft_scores = weights @ scores
    if full_matrix is None:
        return soft_scores, weights
    return soft_scores, weights, weights @ full_matrix


def group_leaders(iou_sorted, scores_sorted, valid_sorted, nms_threshold,
                  group_size):
    """Assign each (score-sorted) box a group-leader index.

    Greedy grouping from the reference (lib/groomed_nms.py:242-262): the
    highest-scored alive box leads a new group containing every alive box
    whose overlap with it exceeds ``nms_threshold``; only the first
    ``group_size + 1`` members (in score order) stay in the group, but *all*
    high-overlap boxes leave the alive set -- capped-out boxes end up in no
    group (leader = -1) and will rescore to 0, matching the reference where
    their inversion-matrix rows stay zero.

    Returns ``leader`` [N] int32 in sorted coordinates.
    """
    n = scores_sorted.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        alive, _ = state
        return jnp.any(alive)

    def body(state):
        alive, leader = state
        top = jnp.argmax(alive).astype(jnp.int32)  # first alive = best score
        overlap = iou_sorted[:, top]
        overlap = jnp.where(idx == top, 1.0, overlap)  # leader joins its group
        members = alive & (overlap > nms_threshold)
        rank = jnp.cumsum(members) - 1               # membership rank in score order
        capped = members & (rank < group_size + 1)
        leader = jnp.where(capped, top, leader)
        return alive & ~members, leader

    leader0 = jnp.full((n,), -1, dtype=jnp.int32)
    _, leader = jax.lax.while_loop(cond, body, (valid_sorted, leader0))
    return leader


@functools.partial(
    jax.jit,
    static_argnames=(
        "nms_threshold", "pruning_method", "temperature",
        "valid_box_prob_threshold", "sorting_method", "sorting_temperature",
        "group_boxes", "mask_group_boxes", "group_size",
        "reference_soft_sort",
    ),
)
def differentiable_nms(scores, overlaps, valid_mask=None, *,
                       nms_threshold=0.4, pruning_method="linear",
                       temperature=0.01, valid_box_prob_threshold=0.3,
                       sorting_method="hard", sorting_temperature=None,
                       group_boxes=True, mask_group_boxes=True,
                       group_size=100, reference_soft_sort=False):
    """GrooMeD-NMS forward. See module docstring.

    Args:
      scores: [N] unsorted box scores in [0, 1].
      overlaps: [N, N] overlap matrix (2D IoU, mapped 3D GIoU, or product);
        diagonal is assumed ~1 for real boxes.
      valid_mask: optional [N] bool marking real (non-padding) boxes.
      reference_soft_sort: reproduce the reference's soft-sort path
        bit-for-bit (only meaningful with ``sorting_method="soft"``).  The
        reference path has TWO quirks (lib/groomed_nms.py:42-48, 155-156):
        the SoftSort weights are column-sum normalised (a torch broadcasting
        accident), and the overlap matrix is soft-permuted along ROWS ONLY
        (``W @ iou_unsorted`` -- its columns stay in input order), so the
        subsequent ``tril`` acts in mixed coordinates.  Default False uses
        the cleaner hard-presort + row-normalised formulation.  Quirk mode
        is for ablation parity; use it with all-valid (unpadded) inputs.

    Returns a :class:`GroomedNMSResult` in the input box order.  Matching
    the reference's return quirk (lib/groomed_nms.py:114-127), sub-threshold
    rescores are zeroed only when ``group_boxes=False``.
    """
    scores = jnp.asarray(scores, jnp.float32)
    overlaps = jnp.asarray(overlaps, jnp.float32)
    n = scores.shape[0]
    if overlaps.shape != (n, n):
        raise ValueError(
            f"overlaps must be [N, N] with N == len(scores) = {n}, "
            f"got {overlaps.shape}"
        )
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)
    valid_mask = jnp.asarray(valid_mask, bool)

    # -- sort by score descending, padding last ---------------------------
    sort_key = jnp.where(valid_mask, scores, -jnp.inf)
    order = jnp.argsort(-sort_key, stable=True).astype(jnp.int32)
    v = valid_mask[order]

    if sorting_method == "soft" and reference_soft_sort:
        st = temperature if sorting_temperature is None else sorting_temperature
        # quirk-exact: weights from the RAW scores, column-normalised;
        # overlap rows soft-permuted, columns left in input order
        s, _, m = soft_sort(jnp.where(valid_mask, scores, 0.0),
                            full_matrix=overlaps, temperature=st,
                            reference_norm=True)
        g_order = jnp.argsort(-jnp.where(v, s, -jnp.inf),
                              stable=True).astype(jnp.int32)
        # rows are (softly) score-sorted, columns are input-order
        vv = v[:, None] & valid_mask[None, :]
    else:
        s = scores[order]
        m = overlaps[order][:, order]
        s = jnp.where(v, s, 0.0)
        if sorting_method == "soft":
            st = temperature if sorting_temperature is None \
                else sorting_temperature
            s, _, m = soft_sort(s, full_matrix=m, temperature=st)
            # soft-sorted scores may not be monotone; grouping re-sorts hard,
            # as get_groups does on its inputs (lib/groomed_nms.py:213-214).
            g_order = jnp.argsort(-jnp.where(v, s, -jnp.inf),
                                  stable=True).astype(jnp.int32)
        else:
            g_order = jnp.arange(n, dtype=jnp.int32)
        vv = v[:, None] & v[None, :]

    # zero padded rows/cols so they can never prune or join anything
    m = jnp.where(vv, m, 0.0)

    # -- prune matrix: strictly lower triangular in sorted order ----------
    prune = pruning_function(m, nms_threshold, temperature, pruning_method)
    prune = jnp.tril(prune, k=-1)
    prune = jnp.where(vv, prune, 0.0)

    idx = jnp.arange(n, dtype=jnp.int32)
    if group_boxes:
        mg = m[g_order][:, g_order]
        sg = s[g_order]
        leader_g = group_leaders(mg, sg, v[g_order], nms_threshold, group_size)
        # map leaders back from grouping coords to sorted coords
        leader_sorted = jnp.full((n,), -1, jnp.int32).at[g_order].set(
            jnp.where(leader_g >= 0, g_order[leader_g.clip(0)], -1)
        )
        grouped = leader_sorted >= 0
        lead_safe = leader_sorted.clip(0)

        if mask_group_boxes:
            # closed form: r_i = s_i - P[i, leader_i] * s_leader_i
            p_lead = prune[idx, lead_safe]
            rescored_sorted = jnp.where(
                grouped, s - jnp.where(leader_sorted == idx, 0.0, p_lead * s[lead_safe]), 0.0
            )
        else:
            # block-diagonal (I + P)^{-1} s as one unit-lower-triangular solve
            same_group = grouped[:, None] & (leader_sorted[:, None] == leader_sorted[None, :])
            a = jnp.eye(n) + jnp.where(same_group, prune, 0.0)
            x = jax.scipy.linalg.solve_triangular(a, s, lower=True, unit_diagonal=True)
            rescored_sorted = jnp.where(grouped, x, 0.0)
    else:
        leader_sorted = jnp.where(v, idx, -1)
        a = jnp.eye(n) + prune
        rescored_sorted = jax.scipy.linalg.solve_triangular(
            a, s, lower=True, unit_diagonal=True
        )
        rescored_sorted = jnp.where(v, rescored_sorted, 0.0)

    rescored_sorted = jnp.clip(rescored_sorted, 0.0, 1.0)
    keep_sorted = v & (rescored_sorted >= valid_box_prob_threshold)
    if not group_boxes:
        rescored_sorted = jnp.where(keep_sorted, rescored_sorted, 0.0)

    # -- scatter back to input order --------------------------------------
    rescored = jnp.zeros((n,), rescored_sorted.dtype).at[order].set(rescored_sorted)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    leader_orig_vals = jnp.where(leader_sorted >= 0, order[leader_sorted.clip(0)], -1)
    leader = jnp.full((n,), -1, jnp.int32).at[order].set(leader_orig_vals)
    return GroomedNMSResult(rescored=rescored, keep=keep, leader=leader)


def differentiable_nms_indices(scores, overlaps, **kwargs):
    """Reference-style convenience wrapper (host-side, not jittable).

    Returns ``(valid_idx, invalid_idx, rescored)`` with the index arrays
    ordered by descending rescored value, mirroring the return contract of
    lib/groomed_nms.py:114-129.
    """
    import numpy as np

    res = differentiable_nms(jnp.asarray(scores), jnp.asarray(overlaps), **kwargs)
    rescored = np.asarray(res.rescored)
    keep = np.asarray(res.keep)
    order = np.argsort(-np.where(keep, rescored, 0.0), kind="stable")
    valid_idx = order[keep[order]]
    invalid_idx = order[~keep[order]]
    return valid_idx, invalid_idx, rescored
