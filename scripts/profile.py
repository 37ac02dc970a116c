"""Capture a jax.profiler trace of the train step or inference pipeline.

Capability match (and upgrade) for the reference's ad-hoc wall-clock timing
(lib/util.py:144-165, per-NMS timers in test/): produces a TensorBoard-
loadable XPlane trace of device execution.

Usage:
  python scripts/profile.py --mode infer --out /tmp/trace [--batch 8]
  python scripts/profile.py --mode train --out /tmp/trace
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("infer", "train"), default="infer")
    ap.add_argument("--out", default="/tmp/jax_trace")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    # completion barriers are forced host readouts: block_until_ready does
    # not await remote execution on the axon runtime (platform.readout), so
    # a trace closed behind it would miss the device work it was opened for
    from groomed_nms_tpu.platform import readout

    if args.mode == "infer":
        from __graft_entry__ import _flagship
        fn, (images, params, batch_stats) = _flagship(batch=args.batch)
        jfn = jax.jit(fn)
        out = jfn(images, params, batch_stats)
        readout(out)
        with jax.profiler.trace(args.out):
            for _ in range(args.iters):
                out = jfn(images, params, batch_stats)
            readout(out)
    else:
        import jax.numpy as jnp
        from groomed_nms_tpu.anchors import locate_anchors
        from groomed_nms_tpu.config import load_config
        from groomed_nms_tpu.models import RPN3D
        from groomed_nms_tpu.training import (build_lr_schedule,
                                              build_optimizer,
                                              create_train_state,
                                              make_train_step)

        cfg = load_config("groomed_nms").replace(compute_dtype="bfloat16")
        from groomed_nms_tpu.anchors import generate_anchor_templates
        rs = np.random.default_rng(0)
        a = 36
        templates = generate_anchor_templates(
            np.exp(np.linspace(np.log(32), np.log(384), 12)),
            (0.5, 1.0, 1.5), 16)
        priors = np.concatenate(
            [templates, np.abs(rs.normal(size=(a, 7))).astype(np.float32)
             + 1.0], 1)
        priors[:, 4] = 30.0
        rois = np.asarray(locate_anchors(priors, (32, 110), 16))
        rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
        model = RPN3D(cfg.rpn_config(a))
        tx = build_optimizer(cfg.solver_type,
                             build_lr_schedule(cfg.lr, cfg.max_iter))
        state = create_train_state(model, (1, 64, 64, 3), tx)
        step = jax.jit(make_train_step(cfg.loss_config(), jnp.asarray(rois),
                                       jnp.asarray(rois_3d),
                                       np.zeros(13, np.float32),
                                       np.ones(13, np.float32)))
        b, g, ign = args.batch, cfg.max_gts, cfg.max_igns
        batch = jax.device_put({
            "images": rs.normal(size=(b, 512, 1760, 3)).astype(np.float32),
            "gts_2d": np.zeros((b, g, 4), np.float32),
            "gts_3d": np.zeros((b, g, 16), np.float32),
            "gt_labels": np.ones((b, g), np.float32),
            "gt_valid": np.zeros((b, g), bool),
            "ign_2d": np.zeros((b, ign, 4), np.float32),
            "ign_valid": np.zeros((b, ign), bool),
            "p2": np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1)),
            "scale": np.ones((b,), np.float32),
        })
        state, stats = step(state, batch)
        readout(stats["total"])
        with jax.profiler.trace(args.out):
            for _ in range(args.iters):
                state, stats = step(state, batch)
            readout(stats["total"])
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
