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


def _path_key(path):
    return tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def _intersect_restore(dst_tree, src_tree, what, log):
    """Key-intersection merge: src values where the path exists in dst with
    a matching shape, dst's fresh values elsewhere.

    Reproduces the reference's warm-start semantics (lib/core.py:641-668
    ``load_weights`` drops src-only keys and keeps dst init for dst-only
    keys), which is how the shipped recipe loads the acceptance-branch-less
    warmup checkpoint into the groomed model."""
    src_flat = {_path_key(p): v for p, v
                in jax.tree_util.tree_flatten_with_path(src_tree)[0]}
    fresh, mismatched, used = [], [], set()

    def pick(path, v):
        key = _path_key(path)
        s = src_flat.get(key)
        if s is None:
            fresh.append("/".join(key))
            return v
        used.add(key)
        if np.shape(s) != np.shape(v):
            mismatched.append(f"{'/'.join(key)} {np.shape(s)}->{np.shape(v)}")
            return v
        return s

    merged = jax.tree_util.tree_map_with_path(pick, dst_tree)
    dropped = [("/".join(k)) for k in src_flat if k not in used]
    if fresh:
        log.warning("%s: %d tensors absent from the checkpoint keep their "
                    "fresh init (e.g. %s)", what, len(fresh), fresh[0])
    if mismatched:
        log.warning("%s: %d tensors kept fresh due to shape mismatch: %s",
                    what, len(mismatched), mismatched[:3])
    if dropped:
        log.warning("%s: %d checkpoint tensors have no counterpart here "
                    "and were dropped (e.g. %s)", what, len(dropped),
                    dropped[0])
    return merged


def restore_checkpoint(output_dir, state, step=None, restore_optimizer=True):
    """Restore into an existing TrainState template. Returns the new state.

    Cross-config tolerance (reference lib/core.py:936-940 +
    ``load_weights`` 641-668): if the on-disk opt_state tree does not
    structurally match this run's optimizer (differently-wrapped /
    freeze-masked run), the model weights still restore and the optimizer
    keeps its fresh init; if the PARAMS trees differ too (a warm start
    across configs with different heads, e.g. warmup -> groomed adds the
    acceptance branch), the restore falls back to a key-intersection merge
    exactly like the reference's load_weights. Every skipped/fresh tensor
    is logged.
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

    def _meta_tree():
        meta = ckptr.metadata(path)
        return getattr(meta, "item_metadata", meta).tree

    def _meta_template(name):
        # orbax requires a structurally matching template even for
        # subtrees we discard/merge, so synthesize it from the
        # checkpoint's own metadata
        return jax.tree_util.tree_map(
            lambda m: np.zeros(m.shape, m.dtype), _meta_tree()[name])

    def _restore_partial():
        # on-disk params/batch_stats are a different tree than this run's
        # model: restore THE CHECKPOINT's trees, then key-intersect
        payload = ckptr.restore(path, {
            "step": np.asarray(0),
            "params": _meta_template("params"),
            "batch_stats": _meta_template("batch_stats"),
            "opt_state": _meta_template("opt_state"),
            "un_state": {"lam": np.zeros(()), "n": np.zeros((), np.int32)},
        })
        payload["params"] = _intersect_restore(
            jax.device_get(state.params), payload["params"], "params", log)
        payload["batch_stats"] = _intersect_restore(
            jax.device_get(state.batch_stats), payload["batch_stats"],
            "batch_stats", log)
        return payload

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
            try:
                payload = ckptr.restore(path,
                                        _template(_meta_template("opt_state")))
            except Exception:
                log.warning("params/batch_stats trees differ from the "
                            "checkpoint too; key-intersection warm start "
                            "(reference load_weights semantics)")
                payload = _restore_partial()
    else:
        try:
            opt_template = _meta_template("opt_state")
        except Exception:
            # older orbax: fall back to the state's own opt tree
            opt_template = jax.device_get(state.opt_state)
        try:
            payload = ckptr.restore(path, _template(opt_template))
        except Exception:
            log.warning("params/batch_stats trees differ from the "
                        "checkpoint; key-intersection warm start "
                        "(reference load_weights semantics)")
            payload = _restore_partial()

    new = state.replace(
        step=jax.numpy.asarray(payload["step"], jax.numpy.int32),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        un_state=UncertaintyState(lam=payload["un_state"]["lam"],
                                  n=payload["un_state"]["n"]))
    if restored_opt is not None:
        new = new.replace(opt_state=restored_opt)
    return new
