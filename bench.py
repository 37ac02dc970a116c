"""Headline benchmark: end-to-end KITTI-resolution inference images/sec/chip.

Runs the flagship pipeline (DenseNet-121 dilated RPN at 512x1760, 36 anchors
~ 126k rois -> decode -> classical NMS -> top-40) fully on-device, batched,
and reports images/sec on one chip.

Baseline: the reference runs batch-1 inference on a GTX 1080 Ti with host
round-trips between backbone, decode, and CUDA NMS (lib/rpn_util.py:1052-
1356).  The repo records no throughput number; M3D-RPN-lineage detectors
run ~5 img/s on a 1080 Ti at this resolution, and BASELINE.md's target is
>10x that (= 50 img/s) on one v5e chip.  vs_baseline is measured against
the 5 img/s reference estimate; every json line carries
``baseline_estimated: true`` because those baselines are lore, not
measurements (the reference repo records no throughput at all).

Timing discipline (round-5 fix): ``jax.block_until_ready`` is NOT a
completion barrier on the remote-dispatch axon runtime -- round 4 recorded
a physically impossible 15,483 img/s (≈930 TFLOP/s on a 197 TFLOP/s chip)
because the loop timed dispatch, not compute.  Every timed window here ends
with a forced host readout of the final outputs (platform.readout), and a
plausibility guard refuses to print any number whose implied FLOP rate
exceeds the chip peak (platform.check_physical_rate, FLOPs from the
compiled program's XLA cost analysis).  The reference's timing is
readout-true by construction (results come back to numpy each image,
lib/rpn_util.py:1483-1485); ours must be by discipline.

Prints one json line per metric: the device train step, then the
host-in-the-loop sustained train wall rate (device_put of raw loader
bytes + fused step + windowed stats pull -- the number a real training
run sees), then e2e inference LAST -- the driver records the final line
as the round's headline metric: {"metric", "value", "unit",
"vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_1080TI_IMG_PER_SEC = 5.0
# the reference trains batch 2 on one 1080 Ti; M3D-RPN-lineage training at
# 512x1760 runs ~0.5 s/iter there (~4 img/s).  Like the inference estimate
# above, the repo records no number, so this is the comparison basis.
REFERENCE_1080TI_TRAIN_IMG_PER_SEC = 4.0


def _bench_train():
    import jax
    from __graft_entry__ import _flagship_train
    from groomed_nms_tpu.platform import (check_physical_rate, cost_flops,
                                          readout)

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "30"))
    step_fn, state, host_batch = _flagship_train(batch=batch)
    jstep = jax.jit(step_fn, donate_argnums=(0,))
    dev_batch = jax.device_put(host_batch)
    flops = cost_flops(jstep.lower(state, dev_batch).compile())
    state, stats = jstep(state, dev_batch)       # warmup / compile
    readout(stats["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = jstep(state, dev_batch)
    # forced host readout: the loss scalar depends on the final step, and
    # steps chain through `state`, so this awaits the whole window
    readout(stats["total"])
    dt = time.perf_counter() - t0
    check_physical_rate(flops, iters, dt, label="train step bench")
    rate = batch * iters / dt
    print(json.dumps({
        "metric": "kitti_512x1760_train_step",
        "value": round(rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / REFERENCE_1080TI_TRAIN_IMG_PER_SEC, 2),
        "baseline_estimated": True,
        "batch": batch,
        "ms_per_step": round(1000 * dt / iters, 2),
    }), flush=True)


def _bench_train_wall():
    """Host-in-the-loop sustained training rate (the wall number).

    Audits what a real run sees: one whole-tree device_put of the raw uint8
    loader batch + one fused (preprocess+step) call per iteration, stats
    stashed per-iter and pulled with ONE bulk device_get per display window
    -- scripts/train.py's exact loop structure at the production batch 2.
    """
    import jax
    from __graft_entry__ import _flagship_train
    from groomed_nms_tpu.platform import readout

    batch = int(os.environ.get("BENCH_WALL_BATCH", "2"))
    iters = int(os.environ.get("BENCH_WALL_ITERS", "100"))
    display = int(os.environ.get("BENCH_WALL_DISPLAY", "25"))
    fused, state, raw = _flagship_train(batch=batch, raw_uint8=True)
    jstep = jax.jit(fused, donate_argnums=(0,))
    state, stats = jstep(state, jax.device_put(raw))   # warmup / compile
    readout(stats["total"])
    stash = []
    t0 = time.perf_counter()
    for i in range(iters):
        dev = jax.device_put(raw)
        state, stats = jstep(state, dev)
        stash.append(stats)
        if (i + 1) % display == 0:
            readout(stash)          # the per-window bulk stats pull
            stash = []
    if stash:
        readout(stash)
    dt = time.perf_counter() - t0
    rate = batch * iters / dt
    print(json.dumps({
        "metric": "kitti_512x1760_train_wall",
        "value": round(rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / REFERENCE_1080TI_TRAIN_IMG_PER_SEC, 2),
        "baseline_estimated": True,
        "batch": batch,
        "ms_per_iter": round(1000 * dt / iters, 2),
    }), flush=True)


def main():
    import jax
    from __graft_entry__ import _flagship
    from groomed_nms_tpu.platform import (check_physical_rate, cost_flops,
                                          enable_compilation_cache, readout)

    enable_compilation_cache()   # full-size graphs: reuse across rounds

    # train metrics first; the headline e2e inference line prints LAST so
    # the driver's last-line parse records it as the round's metric
    if os.environ.get("BENCH_SKIP_TRAIN", "0") != "1":
        _bench_train()
        _bench_train_wall()

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    # steady-state rate: per-call dispatch latency through the remote TPU
    # tunnel only amortizes with a deep async queue (measured 69.5 ms at
    # 1 iter -> 32.2 ms/call at 40 -> 31.4 at 160, device-busy floor
    # 31.1 ms; the queue-ramp bias shrinks with the window, so measure a
    # long window; docs/BENCHMARKS.md r3)
    iters = int(os.environ.get("BENCH_ITERS", "160"))

    fn, (images, params, batch_stats) = _flagship(batch=batch)
    # AOT-compile once: the executable serves both the timing loop and the
    # cost analysis feeding the plausibility guard.  With AUTO input
    # layouts the compiler picks the trunk's preferred tiling for the
    # image tensor and device_put stages inputs directly into it, deleting
    # the per-call input retile copy (1.3 ms of the 31 ms batch-8 window,
    # round-4 profile); production serving stages host batches the same
    # way.  Fall back to default layouts if the runtime can't (env
    # BENCH_AUTO_LAYOUT=0 forces the fallback).
    compiled = None
    if os.environ.get("BENCH_AUTO_LAYOUT", "0") == "1":   # opt-in
        try:
            from jax.experimental.layout import Format, Layout
            auto = jax.jit(fn, in_shardings=Format(Layout.AUTO))
            print("# compiling with AUTO input layouts...", file=sys.stderr,
                  flush=True)
            compiled = auto.lower(images, params, batch_stats).compile()
            fmts = compiled.input_formats[0]
            print(f"# staging inputs into {fmts[0]}", file=sys.stderr,
                  flush=True)
            images, params, batch_stats = jax.device_put(
                (images, params, batch_stats), fmts)
        except Exception as e:
            print(f"# auto-layout unavailable ({type(e).__name__}: {e}); "
                  "falling back to default input layouts", file=sys.stderr)
            compiled = None
    if compiled is None:
        compiled = jax.jit(fn).lower(images, params, batch_stats).compile()
    flops = cost_flops(compiled)

    out, valid = compiled(images, params, batch_stats)   # warmup
    readout(valid)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            out, valid = compiled(images, params, batch_stats)
            readout(valid)

    t0 = time.perf_counter()
    for _ in range(iters):
        out, valid = compiled(images, params, batch_stats)
    # forced host readout of the final outputs ends the window: execution
    # is in-order, so this proves all `iters` dispatches actually ran
    readout((out, valid))
    dt = time.perf_counter() - t0
    check_physical_rate(flops, iters, dt, label="inference bench")

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "kitti_512x1760_e2e_inference",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_1080TI_IMG_PER_SEC, 2),
        "baseline_estimated": True,
    }), flush=True)


if __name__ == "__main__":
    main()
