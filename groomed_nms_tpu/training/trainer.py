"""TrainState + jitted train step with gradient accumulation.

Capability match for the reference's init_training_model / loss_backprop
(lib/core.py:48-113):

* SGD(momentum, weight-decay) / Adam / Adamax via optax, with the
  reference's gradient clip-by-value 1.0 applied *before* weight decay,
  matching torch's ``clip_grad_value_`` + SGD weight-decay ordering;
* ``batch_skip`` gradient accumulation (reference lib/core.py:108-113)
  with the reference's exact torch semantics (clipped running SUM, LR
  policy on the global iteration count -- see
  :func:`_clipped_sum_multisteps`), inside the same jitted step;
* BatchNorm statistics updated functionally through ``mutable`` collections;
  ``freeze_bn`` becomes a static flag that routes BN through running stats.

The step function is built once per config by :func:`make_train_step` and is
mesh-shardable via :func:`~groomed_nms_tpu.parallel.shard_train_step`.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses.rpn_3d import LossConfig, UncertaintyState, rpn_3d_loss


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    un_state: UncertaintyState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)


class _AccumulateState(NamedTuple):
    mini_step: jnp.ndarray
    acc_grads: Any
    inner_state: Any


def _clipped_sum_multisteps(inner, every_k, clip_value):
    """torch-parity gradient accumulation (reference lib/core.py:99-113).

    ``optax.MultiSteps`` averages the k micro-gradients and runs the inner
    chain (clip included) once on the mean.  The reference instead
    accumulates the SUM in ``.grad`` across backwards and value-clips the
    *running sum* after every backward (``clip_grad_value_`` mutates
    ``.grad`` in place); the optimizer then steps on that clipped sum every
    k-th iteration.  This wrapper reproduces those semantics: clip is
    applied here per micro-iteration, NOT inside ``inner``.
    """
    def init(params):
        return _AccumulateState(
            mini_step=jnp.zeros((), jnp.int32),
            acc_grads=jax.tree_util.tree_map(jnp.zeros_like, params),
            inner_state=inner.init(params))

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(lambda a, g: a + g,
                                     state.acc_grads, grads)
        if clip_value:
            acc = jax.tree_util.tree_map(
                lambda a: jnp.clip(a, -clip_value, clip_value), acc)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)

        def apply_step(_):
            updates, inner_state = inner.update(acc, state.inner_state,
                                                params)
            return updates, inner_state, zeros

        def skip_step(_):
            return zeros, state.inner_state, acc

        updates, inner_state, new_acc = jax.lax.cond(
            (state.mini_step + 1) % every_k == 0, apply_step, skip_step,
            None)
        return updates, _AccumulateState(state.mini_step + 1, new_acc,
                                         inner_state)

    return optax.GradientTransformation(init, update)


def build_optimizer(solver_type="sgd", lr_schedule=None, momentum=0.9,
                    weight_decay=0.0005, clip_value=1.0, batch_skip=1):
    """Reference lib/core.py:71-93 optimizer menu + grad accumulation.

    With ``batch_skip > 1`` this reproduces the reference's
    loss_backprop/adjust_lr pair exactly (lib/core.py:99-127): gradients
    accumulate as a clipped SUM (see :func:`_clipped_sum_multisteps`) and
    the LR policy is evaluated at the GLOBAL iteration count -- adjust_lr
    changes the LR only on step iterations, reading ``iteration``, so the
    applied step ``a`` uses ``schedule(a*k + k - 1)`` -- not at the
    applied-step count as ``optax.MultiSteps`` would.
    """
    k = int(batch_skip) if batch_skip else 1
    schedule = lr_schedule
    if k > 1 and callable(lr_schedule):
        schedule = lambda count: lr_schedule(count * k + (k - 1))
    parts = []
    if clip_value and k == 1:
        parts.append(optax.clip(clip_value))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if solver_type == "sgd":
        parts.append(optax.trace(decay=momentum, nesterov=False))
    elif solver_type == "adam":
        parts.append(optax.scale_by_adam())
    elif solver_type == "adamax":
        parts.append(optax.scale_by_adamax())
    else:
        raise NotImplementedError(solver_type)
    parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)
    if k > 1:
        tx = _clipped_sum_multisteps(tx, k, clip_value)
    return tx


def create_train_state(model, images_shape, tx, rng=None):
    """Initialise model variables + optimizer state.

    Model init AND optimizer init are jitted as ONE graph: flax's
    ``Module.init`` and optax's ``tx.init`` otherwise execute every
    parameter/momentum initializer eagerly -- hundreds of tiny dispatches
    that cost a round trip each on remote-dispatch platforms (measured
    265 s per process start on the axon tunnel vs ~12 s for the single
    jitted + persistently-cached graph).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def _init(rng):
        variables = model.init(rng, jnp.zeros(images_shape, jnp.float32),
                               train=False)
        return variables, tx.init(variables["params"])

    variables, opt_state = jax.jit(_init)(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        un_state=UncertaintyState.init(),
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(loss_cfg: LossConfig, rois, rois_3d, bbox_means,
                    bbox_stds, train_bn=True, frozen_stats_mask=None):
    """Build the (state, batch) -> (state, metrics) step function.

    ``batch`` is a dict with 'images' [B, H, W, 3] plus the GTBatch fields
    (see :class:`~groomed_nms_tpu.losses.rpn_3d.GTBatch`).

    ``frozen_stats_mask`` (a pytree of Python bools shaped like batch_stats,
    from :func:`~groomed_nms_tpu.training.freeze.frozen_stats_mask`) pins the
    marked BN running statistics -- the reference's per-module
    ``module.eval()`` freezing (lib/core.py:600-621). When EVERY leaf is
    frozen, pass ``train_bn=False`` instead: that also normalizes by the
    running stats in the forward pass, the exact eval-mode semantics.
    """
    def extract(out, batch):
        return {"cls": out.cls, "prob": out.prob,
                "bbox_2d": out.bbox_2d, "bbox_3d": out.bbox_3d,
                "accept_prob": out.accept_prob,
                "accept_cls": out.accept_cls,
                "uncertainty": out.uncertainty}

    return _make_step(loss_cfg, rois, rois_3d, bbox_means, bbox_stds,
                      train_bn, frozen_stats_mask, extract)


def make_video_train_step(loss_cfg: LossConfig, rois, rois_3d, bbox_means,
                          bbox_stds, train_bn=True, frozen_stats_mask=None):
    """Train step for :class:`~groomed_nms_tpu.models.video.VideoRPN3D`.

    ``batch['images']`` is a clip [B, F, H, W, 3] (frame F-1 = current); the
    GTBatch fields label the CURRENT frame, whose ``gts_3d`` rows may carry
    the velocity column 16 for the has_vel loss term. Matches the
    reference's video training, which runs the detection loss on the current
    frame only (train_rpn_3d.py:131-141 with the kalman model; the pose head
    is trained by scripts/train_pose.py as in the reference's train_pose).
    """

    def extract(out, batch):
        b, f = batch["images"].shape[:2]

        def last_frame(x):
            return None if x is None else \
                x.reshape(b, f, *x.shape[1:])[:, -1]

        fo = out.frame_outputs  # leading dim B*F
        return {"cls": last_frame(fo.cls), "prob": last_frame(fo.prob),
                "bbox_2d": last_frame(fo.bbox_2d),
                "bbox_3d": last_frame(fo.bbox_3d),
                "accept_prob": last_frame(fo.accept_prob),
                "accept_cls": last_frame(fo.accept_cls),
                "uncertainty": last_frame(fo.uncertainty)}

    return _make_step(loss_cfg, rois, rois_3d, bbox_means, bbox_stds,
                      train_bn, frozen_stats_mask, extract)


def fuse_preprocess(step_fn, image_means, image_stds, *, target_h, crop_w,
                    distort_prob=0.0, rng_seed=0, video=False):
    """Fold the on-device image preprocess into the jitted train step.

    The training loop then issues exactly TWO runtime calls per iteration
    (one whole-tree ``device_put`` of the raw host batch + one jitted step)
    instead of the put / preprocess-dispatch / reshard / step chain.  On
    remote-dispatch platforms (the axon TPU tunnel) every extra
    per-iteration call costs milliseconds of round-trip latency that the
    async queue cannot hide because the chain is data-dependent through
    host-side Python; measured 400 ms/iter wall vs a 55 ms device step on
    the round-4 rehearsal before this change.

    Raw batch contract: ``{'images_u8': [B, H0, W0, 3] uint8 (or
    [B, F, H0, W0, 3] for video clips), 'mirror': [B] bool,
    **GTBatch fields}`` -- exactly what the train loaders emit, so the
    loop transfers the loader output verbatim.

    Photometric distortion derives its key from ``state.step`` (fold_in on
    a seeded base key), making the jitter stream deterministic AND
    resume-consistent -- the reference re-rolls torch RNG from whatever
    state load time leaves (lib/augmentations.py:339-352).
    """
    from ..data.augment import preprocess_images, preprocess_images_train

    means = jnp.asarray(image_means)
    stds = jnp.asarray(image_stds)
    base_key = jax.random.PRNGKey(rng_seed + 1)

    def fused(state, raw):
        u8, mirror = raw["images_u8"], raw["mirror"]
        gt = {k: v for k, v in raw.items()
              if k not in ("images_u8", "mirror")}
        if video:
            # clip [B, F, H0, W0, 3]: preprocess frames flat (mirror flag
            # repeated per frame so a mirrored sample flips the whole clip)
            b, f = u8.shape[:2]
            flat = preprocess_images(
                u8.reshape((b * f,) + u8.shape[2:]),
                jnp.repeat(mirror, f), means, stds,
                target_h=target_h, crop_w=crop_w)
            images = flat.reshape(b, f, target_h, crop_w, 3)
        elif distort_prob > 0:
            key = jax.random.fold_in(base_key, state.step)
            images = preprocess_images_train(
                u8, mirror, means, stds, key, target_h=target_h,
                crop_w=crop_w, distort_prob=distort_prob)
        else:
            images = preprocess_images(u8, mirror, means, stds,
                                       target_h=target_h, crop_w=crop_w)
        return step_fn(state, dict(images=images, **gt))

    return fused


def scan_steps(step_fn):
    """Run K train steps in ONE jitted call via ``lax.scan`` over a
    stacked batch (every leaf gains a leading [K] axis).

    Each runtime call costs a dispatch round trip and returns the full
    state tree (~10^3 array handles). With a deep async dispatch queue
    (display-window-sized, the default loop) most of that latency is
    already pipelined away -- measured 68.2 -> 66.9 ms/iter (K=10,
    batch 2, real TPU; docs/BENCHMARKS.md) -- so the value of K>1 is
    robustness: it keeps wall = device-step when the queue CANNOT run
    deep (short display windows, synchronous stats pulls, callbacks
    between steps). Semantics are EXACTLY K sequential steps --
    state threads through the scan, ``state.step`` advances per inner
    step (so LR schedules and the fused preprocess's fold_in jitter key
    see the same values) -- and stats come back stacked [K] per key.
    """
    def multi(state, stacked_batch):
        def body(s, b):
            s2, stats = step_fn(s, b)
            return s2, stats
        return jax.lax.scan(body, state, stacked_batch)

    return multi


def _make_step(loss_cfg, rois, rois_3d, bbox_means, bbox_stds, train_bn,
               frozen_stats_mask, extract_outputs):
    """Shared step body: forward (+BN mutation/freezing) -> loss -> update.

    ``extract_outputs(out, batch)`` maps the model's return value to the
    outputs dict the loss consumes -- the only difference between the
    still-image and video steps."""
    from ..losses.rpn_3d import GTBatch

    def train_step(state: TrainState, batch):
        gt = GTBatch(
            gts_2d=batch["gts_2d"], gts_3d=batch["gts_3d"],
            gt_labels=batch["gt_labels"], gt_valid=batch["gt_valid"],
            ign_2d=batch["ign_2d"], ign_valid=batch["ign_valid"],
            p2=batch["p2"], scale=batch["scale"])

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if train_bn:
                out, mutated = state.apply_fn(
                    variables, batch["images"], train=True,
                    mutable=["batch_stats"])
                new_bs = mutated["batch_stats"]
                if frozen_stats_mask is not None:
                    new_bs = jax.tree_util.tree_map(
                        lambda frozen, old, new: old if frozen else new,
                        frozen_stats_mask, state.batch_stats, new_bs)
            else:
                out = state.apply_fn(variables, batch["images"], train=False)
                new_bs = state.batch_stats
            loss, stats, new_un = rpn_3d_loss(
                extract_outputs(out, batch), rois, rois_3d, gt, bbox_means,
                bbox_stds, state.un_state, loss_cfg)
            return loss, (stats, new_un, new_bs)

        (loss, (stats, new_un, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, un_state=new_un)
        return new_state, stats

    return train_step
