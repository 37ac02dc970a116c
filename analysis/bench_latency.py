"""Serving-latency benchmark: blocking per-call latency + small-batch rates.

Complements bench.py (steady-state pipelined throughput, the production
serving-loop number) with the latency-oriented view a deployment cares
about: per-request wall latency when each call blocks on its result
(queue depth 1), across batch sizes.

On the dev TPU these wall numbers include the remote-compile tunnel's
per-dispatch RTT (tens of ms -- docs/BENCHMARKS.md r3 measured 69.5 ms at
queue depth 1 vs a 31.1 ms device floor at batch 8); on locally-attached
TPU hardware the dispatch overhead is sub-ms, so the device-time floor
(throughput-mode ms/call) is the better latency estimate there.  Both are
printed.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python analysis/bench_latency.py \
      [--batches 1 2 8] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 8])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--queue", type=int, default=40,
                    help="dispatch-queue depth for the throughput column")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _flagship
    from groomed_nms_tpu.platform import readout

    # timing barriers are forced host readouts throughout: on the axon
    # runtime jax.block_until_ready returns before remote execution
    # completes (round-4 audit -- see platform.readout).  For the blocking
    # column that is also the honest serving semantics: a request isn't
    # served until its results are back on the host.
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    print(f"{'batch':>5} {'blocking ms/call':>17} {'ms/img':>7} "
          f"{'pipelined ms/call':>18} {'img/s':>7}")
    for batch in args.batches:
        fn, (images, params, batch_stats) = _flagship(batch=batch)
        jfn = jax.jit(fn)
        out = jfn(images, params, batch_stats)
        readout(out)

        # blocking latency: queue depth 1, each call waits for its result
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(images, params, batch_stats)
            readout(out)
        block_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # pipelined: deep dispatch queue (bench.py's measurement mode)
        t0 = time.perf_counter()
        for _ in range(args.queue):
            out = jfn(images, params, batch_stats)
        readout(out)
        pipe_ms = (time.perf_counter() - t0) / args.queue * 1e3

        print(f"{batch:>5} {block_ms:>17.1f} {block_ms / batch:>7.1f} "
              f"{pipe_ms:>18.1f} {batch / pipe_ms * 1e3:>7.1f}")


if __name__ == "__main__":
    main()
