"""Micro-benchmark: GrooMeD-NMS operator throughput at N boxes.

BASELINE.json config 2: "Pairwise 2D/3D IoU matrix + group formation +
rescoring at N=1k boxes".  Benches the full differentiable operator
(sort -> overlap matrix -> grouping while-loop -> masked rescore) and the
fused Pallas IoU+prune kernel.

Usage: python analysis/bench_groomed_nms.py [N] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def main(n=1000, iters=20):
    n, iters = int(n), int(iters)
    from groomed_nms_tpu.ops.groomed_nms import differentiable_nms
    from groomed_nms_tpu.ops.iou import pairwise_iou
    from groomed_nms_tpu.ops.pallas_kernels import fused_iou_prune

    # forced host readouts as timing barriers: block_until_ready is a no-op
    # for remote buffers on the axon runtime (see platform.readout)
    from groomed_nms_tpu.platform import readout

    rng = np.random.default_rng(0)
    x1 = rng.uniform(0, 1600, n)
    y1 = rng.uniform(0, 480, n)
    w = rng.uniform(30, 300, n)
    h = rng.uniform(30, 200, n)
    boxes = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], 1), jnp.float32)
    scores = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)

    on_tpu = jax.devices()[0].platform != "cpu"

    @jax.jit
    def full_op(boxes, scores):
        overlaps = pairwise_iou(boxes, boxes)
        return differentiable_nms(scores, overlaps).rescored

    r = full_op(boxes, scores)
    readout(r)
    t0 = time.time()
    for _ in range(iters):
        r = full_op(boxes, scores)
    readout(r)
    dt = (time.time() - t0) / iters
    print(f"groomed_nms N={n}: {dt*1000:.2f} ms "
          f"-> {n/dt/1e6:.2f} Mboxes/s", flush=True)

    @jax.jit
    def kernel_op(boxes):
        return fused_iou_prune(boxes, interpret=not on_tpu)

    o = kernel_op(boxes)
    readout(o)
    t0 = time.time()
    for _ in range(iters):
        o = kernel_op(boxes)
    readout(o)
    dt = (time.time() - t0) / iters
    print(f"fused_iou_prune N={n}: {dt*1000:.2f} ms "
          f"-> {n*n/dt/1e9:.2f} Gpairs/s", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
