"""Roofline closure for the full-size train step (and inference, for
cross-checking against docs/BENCHMARKS.md round 3).

Method (same as the round-3 inference closure): XLA cost analysis of the
COMPILED program gives logical FLOPs and tensor traffic per call; steady-
state timing gives the device window; comparing achieved FLOP/s against the
MXU peak and the implied HBM traffic against what the memory system can
physically move in that window states which resource binds.

v5e peaks used: 197 TFLOP/s bf16, 819 GB/s HBM (public TPU v5e specs).

Usage (on the TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python analysis/roofline_train.py \
      [--mode train|infer] [--batch 8] [--iters 30] [--trace /tmp/trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("train", "infer"), default="train")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", default=None,
                    help="also capture a profiler trace into this dir")
    ap.add_argument("--remat", choices=("none", "layer", "epilogue"),
                    default="none",
                    help="train mode: rematerialize whole dense layers "
                         "(remat_layers) or just the BN2/ReLU/conv2 tails "
                         "(remat_epilogue)")
    args = ap.parse_args()

    import jax

    from groomed_nms_tpu.platform import enable_compilation_cache, readout
    enable_compilation_cache()

    if args.mode == "train":
        from __graft_entry__ import _flagship_train
        step_fn, state, host_batch = _flagship_train(batch=args.batch,
                                                     remat=args.remat)
        jfn = jax.jit(step_fn)
        dev_batch = jax.device_put(host_batch)
        lowered = jfn.lower(state, dev_batch)

        def run():
            s, stats = jfn(state, dev_batch)
            return stats["total"]
    else:
        from __graft_entry__ import _flagship
        fn, (images, params, batch_stats) = _flagship(batch=args.batch)
        jfn = jax.jit(fn)
        lowered = jfn.lower(images, params, batch_stats)

        def run():
            out, valid = jfn(images, params, batch_stats)
            return valid

    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    # timing barriers are forced host readouts: block_until_ready does not
    # await remote execution on the axon runtime (see platform.readout);
    # run() returns a small scalar/bool tensor, so the readout is ~free
    readout(run())                      # warmup
    if args.trace:
        with jax.profiler.trace(args.trace):
            readout(run())
        print(f"trace -> {args.trace}")
    t0 = time.perf_counter()
    last = None
    for _ in range(args.iters):
        last = run()
    readout(last)
    dt = (time.perf_counter() - t0) / args.iters

    if jax.default_backend() == "tpu" and flops / dt / 1e12 > V5E_BF16_TFLOPS:
        raise SystemExit(
            f"implied {flops / dt / 1e12:.1f} TFLOP/s exceeds the "
            f"{V5E_BF16_TFLOPS:.0f} TFLOP/s peak: timing did not await "
            "device execution -- refusing to print a roofline from it")
    tflops_logical = flops / 1e12
    gb_logical = bytes_accessed / 1e9
    achieved_tflops = tflops_logical / dt
    hbm_window_gb = V5E_HBM_GBPS * dt
    result = {
        "mode": args.mode, "batch": args.batch,
        "ms_per_call": round(1000 * dt, 2),
        "img_per_sec": round(args.batch / dt, 2),
        "logical_tflop_per_call": round(tflops_logical, 3),
        "logical_traffic_gb_per_call": round(gb_logical, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "pct_of_mxu_peak": round(100 * achieved_tflops / V5E_BF16_TFLOPS, 1),
        "hbm_movable_in_window_gb": round(hbm_window_gb, 2),
        "traffic_elision_needed_pct": round(
            100 * max(0.0, 1.0 - hbm_window_gb / gb_logical), 1)
        if gb_logical else 0.0,
    }
    # verdict: if the logical traffic exceeds what HBM can move in the
    # window, fusion is already eliding the difference and the program is
    # at (or pressed against) the MEMORY roofline; a high MXU fraction
    # with headroom in traffic would instead say FLOP-bound.
    result["binding_resource"] = (
        "memory (logical traffic > HBM window: fusion elides the rest)"
        if gb_logical > hbm_window_gb else
        ("mxu" if result["pct_of_mxu_peak"] > 50 else
         "neither saturated (dispatch/serial latency bound)"))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
