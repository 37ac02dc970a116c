"""Orbax-backed checkpoint save / auto-resume.

Capability match for the reference's save_checkpoint / resume_checkpoint /
checkpoint_names (lib/core.py:925-978): model + optimizer snapshots every
``snapshot_iter``, restore by iteration number or latest, tolerant of a
missing optimizer (reference lib/core.py:936-940 swallows optimizer-load
failures when warm-starting across configs).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(output_dir, step):
    return os.path.join(os.path.abspath(output_dir), "weights",
                        f"checkpoint_{step}")


def save_checkpoint(output_dir, state, step=None, max_keep=None):
    step = int(state.step) if step is None else int(step)
    path = _ckpt_dir(output_dir, step)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": np.asarray(step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "un_state": {
            "lam": jax.device_get(state.un_state.lam),
            "n": jax.device_get(state.un_state.n),
        },
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if max_keep:
        import shutil
        wdir = os.path.join(output_dir, "weights")
        steps = sorted(
            int(m.group(1)) for name in os.listdir(wdir)
            for m in [re.fullmatch(r"checkpoint_(\d+)", name)] if m)
        for old in steps[:-max_keep]:
            shutil.rmtree(_ckpt_dir(output_dir, old), ignore_errors=True)
    return path


def latest_checkpoint(output_dir):
    wdir = os.path.join(output_dir, "weights")
    if not os.path.isdir(wdir):
        return None
    steps = []
    for name in os.listdir(wdir):
        m = re.fullmatch(r"checkpoint_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(output_dir, state, step=None, restore_optimizer=True):
    """Restore into an existing TrainState template. Returns the new state.

    Optimizer tolerance (reference lib/core.py:936-940 swallows
    optimizer-load failures when warm-starting across configs): if the
    on-disk opt_state tree does not structurally match this run's
    optimizer (e.g. the checkpoint came from a differently-wrapped /
    freeze-masked run), the model weights still restore and the optimizer
    keeps its fresh init, with a warning.
    """
    import logging

    from ..losses.rpn_3d import UncertaintyState

    log = logging.getLogger(__name__)
    if step is None:
        step = latest_checkpoint(output_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {output_dir}")
    path = _ckpt_dir(output_dir, step)
    ckptr = ocp.StandardCheckpointer()

    def _template(opt_template):
        return {
            "step": np.asarray(0),
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": opt_template,
            "un_state": {"lam": np.zeros(()), "n": np.zeros((), np.int32)},
        }

    def _meta_opt_template():
        # orbax requires a structurally matching template even for
        # subtrees we discard, so synthesize opt_state's template from the
        # checkpoint's own metadata
        meta = ckptr.metadata(path)
        meta = getattr(meta, "item_metadata", meta).tree
        return jax.tree_util.tree_map(
            lambda m: np.zeros(m.shape, m.dtype), meta["opt_state"])

    restored_opt = None
    if restore_optimizer:
        try:
            payload = ckptr.restore(path, _template(
                jax.device_get(state.opt_state)))
            restored_opt = payload["opt_state"]
        except Exception as e:
            log.warning("opt_state in %s does not match this run's "
                        "optimizer (%s); restoring weights only, optimizer "
                        "starts fresh", path, type(e).__name__)
            payload = ckptr.restore(path, _template(_meta_opt_template()))
    else:
        try:
            opt_template = _meta_opt_template()
        except Exception:
            # older orbax: fall back to the state's own opt tree
            opt_template = jax.device_get(state.opt_state)
        payload = ckptr.restore(path, _template(opt_template))

    new = state.replace(
        step=jax.numpy.asarray(payload["step"], jax.numpy.int32),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        un_state=UncertaintyState(lam=payload["un_state"]["lam"],
                                  n=payload["un_state"]["n"]))
    if restored_opt is not None:
        new = new.replace(opt_state=restored_opt)
    return new
