"""Layer freezing: parameter masks by name substring.

Capability match for the reference's freeze utilities (lib/core.py:578-622):
``freeze_layers`` (blacklist/whitelist substring match on parameter paths),
``freeze_bn`` / ``slow_bn`` (BatchNorm param freezing; statistics freezing is
the ``train_bn`` flag on the train step).  Functional re-design: instead of
mutating ``requires_grad``, build an optax ``multi_transform`` mask that
zeroes updates for frozen parameters.
"""

from __future__ import annotations

import optax


def _path_str(path):
    return "/".join(str(getattr(k, "key", k)) for k in path)


def freeze_mask(params, frozen_substrings=(), trainable_substrings=None):
    """Label tree: 'freeze' / 'train' per parameter.

    * If ``trainable_substrings`` is given (whitelist mode), ONLY matching
      paths train (reference freeze_layers whitelist, lib/core.py:599-609).
    * Else paths matching ``frozen_substrings`` freeze (blacklist mode).
    """
    import jax

    def label(path, _):
        p = _path_str(path)
        if trainable_substrings is not None:
            return "train" if any(s in p for s in trainable_substrings) \
                else "freeze"
        return "freeze" if any(s in p for s in frozen_substrings) else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def freeze_bn_mask(params):
    """Freeze every BatchNorm scale/bias (reference freeze_bn)."""
    import jax

    def label(path, _):
        p = _path_str(path)
        return "freeze" if ("norm" in p and ("scale" in p or "bias" in p)) \
            else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def wrap_with_freeze(tx, labels, slow_factor=None):
    """Apply ``tx`` to 'train' params; zero (or scale) 'freeze' params.

    ``slow_factor`` turns freezing into update-scaling instead of zeroing
    (a generic capability; note the reference's ``slow_bn`` is NOT an lr
    scale -- it changes BN running-stat momentum, which here is the
    ``bn_momentum`` knob on DenseNetConfig).
    """
    if slow_factor:
        frozen_tx = optax.chain(tx, optax.scale(slow_factor))
    else:
        frozen_tx = optax.set_to_zero()
    return optax.multi_transform({"train": tx, "freeze": frozen_tx},
                                 lambda params: labels)


def build_freeze_labels(params, freeze_blacklist=None, freeze_whitelist=None,
                        freeze_bn=False):
    """Param labels from the reference's (inverted!) config knobs.

    The reference's ``freeze_layers`` (lib/core.py:588-622) reads:

    * ``freeze_blacklist`` -- params NOT matching any entry are frozen, i.e.
      it is a *train whitelist* (kitti_3d_full.py:37 passes
      ['pose', 'conf'] to train only those heads);
    * ``freeze_whitelist`` -- params matching any entry are frozen;
    * ``freeze_bn`` (lib/core.py:578-581) -- BatchNorm affines freeze too.

    We keep the reference's knob names and semantics so configs transfer.
    """
    import jax

    def label(path, _):
        p = _path_str(path)
        if freeze_bn and "norm" in p and ("scale" in p or "bias" in p):
            return "freeze"
        if freeze_blacklist is not None and \
                not any(s in p for s in freeze_blacklist):
            return "freeze"
        if freeze_whitelist is not None and \
                any(s in p for s in freeze_whitelist):
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def frozen_stats_mask(batch_stats, freeze_blacklist=None,
                      freeze_whitelist=None, freeze_bn=False):
    """True per batch_stats leaf whose BN module the reference puts in eval().

    ``freeze_layers`` calls ``module.eval()`` on every BatchNorm2d whose
    module path is frozen by the blacklist/whitelist rules, and
    ``freeze_bn`` does it for all of them (lib/core.py:578-581,600-621);
    eval-mode BN stops updating its running statistics. The train step uses
    this mask to keep those leaves at their old values.
    """
    import jax

    def label(path, _):
        p = _path_str(path)
        if freeze_bn:
            return True
        if freeze_blacklist is not None and \
                not any(s in p for s in freeze_blacklist):
            return True
        if freeze_whitelist is not None and \
                any(s in p for s in freeze_whitelist):
            return True
        return False

    return jax.tree_util.tree_map_with_path(label, batch_stats)


def all_stats_frozen(mask) -> bool:
    """True if every batch_stats leaf is frozen (-> run BN fully in eval
    mode, the exact reference semantics for global freezes)."""
    import jax
    leaves = jax.tree_util.tree_leaves(mask)
    return bool(leaves) and all(bool(m) for m in leaves)
