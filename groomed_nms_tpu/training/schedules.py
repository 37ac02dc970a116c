"""Learning-rate policies: poly (power 0.9), step decay, optional warmup.

Capability match for the reference's ``adjust_lr`` (lib/core.py:116-170),
expressed as an optax-style schedule (a pure function of the step index)
instead of in-place mutation of optimizer param groups.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_lr_schedule(lr, max_iter, policy="poly", lr_target=None,
                      lr_steps=None, power=0.9, warmup_iters=0,
                      warmup_factor=0.1):
    """Returns schedule(step) -> lr.

    poly: lr_target + (lr - lr_target) * (1 - step/max_iter)^power
    step: lr * 0.1^(number of lr_steps fractions passed)
    Warmup ramps linearly from warmup_factor*lr over warmup_iters.
    """
    if lr_target is None:
        lr_target = lr * 1e-5

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if policy == "poly":
            frac = jnp.clip(step / max_iter, 0.0, 1.0)
            base = lr_target + (lr - lr_target) * (1.0 - frac) ** power
        elif policy == "step":
            drops = jnp.zeros(())
            for s in (lr_steps or []):
                drops = drops + (step >= s * max_iter)
            base = lr * (0.1 ** drops)
        else:
            raise NotImplementedError(policy)
        if warmup_iters > 0:
            ramp = jnp.clip(step / warmup_iters, 0.0, 1.0)
            scale = warmup_factor + (1.0 - warmup_factor) * ramp
            base = base * jnp.where(step < warmup_iters, scale, 1.0)
        return base

    return schedule
