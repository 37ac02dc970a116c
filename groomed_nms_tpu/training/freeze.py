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

    ``slow_factor`` turns freezing into slowing (reference slow_bn applies a
    reduced lr to BN params instead of zero, lib/core.py:583-587).
    """
    if slow_factor:
        frozen_tx = optax.chain(tx, optax.scale(slow_factor))
    else:
        frozen_tx = optax.set_to_zero()
    return optax.multi_transform({"train": tx, "freeze": frozen_tx},
                                 lambda params: labels)
