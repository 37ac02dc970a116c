"""Headline benchmark: end-to-end KITTI-resolution inference images/sec/chip.

Runs the flagship pipeline (DenseNet-121 dilated RPN at 512x1760, 36 anchors
~ 126k rois -> decode -> classical NMS -> top-40) fully on-device, batched,
and reports images/sec on one chip.

Baseline: the reference runs batch-1 inference on a GTX 1080 Ti with host
round-trips between backbone, decode, and CUDA NMS (lib/rpn_util.py:1052-
1356).  The repo records no throughput number; M3D-RPN-lineage detectors
run ~5 img/s on a 1080 Ti at this resolution, and BASELINE.md's target is
>10x that (= 50 img/s) on one v5e chip.  vs_baseline is measured against
the 5 img/s reference estimate.

Prints one json line per metric (inference first -- the headline -- then
the full train step): {"metric", "value", "unit", "vs_baseline"}.
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

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "30"))
    step_fn, state, host_batch = _flagship_train(batch=batch)
    jstep = jax.jit(step_fn, donate_argnums=(0,))
    dev_batch = jax.device_put(host_batch)
    state, stats = jstep(state, dev_batch)       # warmup / compile
    jax.block_until_ready(stats["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = jstep(state, dev_batch)
    jax.block_until_ready(stats["total"])
    dt = time.perf_counter() - t0
    rate = batch * iters / dt
    print(json.dumps({
        "metric": "kitti_512x1760_train_step",
        "value": round(rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / REFERENCE_1080TI_TRAIN_IMG_PER_SEC, 2),
        "batch": batch,
        "ms_per_step": round(1000 * dt / iters, 2),
    }))


def main():
    import jax
    from __graft_entry__ import _flagship
    from groomed_nms_tpu.platform import enable_compilation_cache

    enable_compilation_cache()   # full-size graphs: reuse across rounds

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    # steady-state rate: per-call dispatch latency through the remote TPU
    # tunnel only amortizes with a deep async queue (measured 69.5 ms at
    # 1 iter -> 32.2 ms/call at 40 -> 31.4 at 160, device-busy floor
    # 31.1 ms; the queue-ramp bias shrinks with the window, so measure a
    # long window; docs/BENCHMARKS.md r3)
    iters = int(os.environ.get("BENCH_ITERS", "160"))

    fn, (images, params, batch_stats) = _flagship(batch=batch)
    jfn = jax.jit(fn)

    # warmup / compile
    out, valid = jfn(images, params, batch_stats)
    jax.block_until_ready((out, valid))

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            out, valid = jfn(images, params, batch_stats)
            jax.block_until_ready((out, valid))

    t0 = time.perf_counter()
    for _ in range(iters):
        out, valid = jfn(images, params, batch_stats)
    jax.block_until_ready((out, valid))
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "kitti_512x1760_e2e_inference",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_1080TI_IMG_PER_SEC, 2),
    }), flush=True)

    if os.environ.get("BENCH_SKIP_TRAIN", "0") != "1":
        _bench_train()


if __name__ == "__main__":
    main()
