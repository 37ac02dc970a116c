"""VMEM-resident DenseNet block for eval-mode inference (Pallas TPU).

A DenseNet block re-reads every prior feature map once per layer: with L
layers the trunk's HBM traffic is O(L^2) in the growth rate, and the XLA
virtual-concat path (models/densenet.py) pays it in full -- profiled at
9.2 ms/batch-8 for block 1 alone at 512x1760.  This kernel keeps the whole
per-image feature stack in VMEM: one HBM read of the block input, one HBM
write of the concatenated output, and all L x (BN -> ReLU -> 1x1 conv ->
BN -> ReLU -> 3x3 conv) layer math on-chip.

Exact function match for eval-mode ``VDenseLayer`` chains (reference
torchvision DenseNet-121 features, models/densenet121_3d_dilate_decomp_
alpha.py:21-39): BatchNorm running statistics are folded into per-channel
(mul, add) vectors by the caller (models/fast_eval.py), the 1x1 bottleneck
conv is a chunked matmul over the in-VMEM feature stack, and the 3x3
(optionally dilated) growth conv is nine shifted matmuls against a
zero-padded bottleneck buffer, reproducing zero conv padding at the image
border.  Training mode keeps the flax path (running stats must update).

Weight layout (prepared by the caller, all channel-padded with zeros so
chunked matmuls need no per-layer bounds logic):
  mul1/add1 [L, Cmax]    folded norm1 affine, compute dtype
  w1        [L, Cmax, BW] 1x1 bottleneck kernels (BW = bn_size * growth)
  mul2/add2 [L, BW]      folded norm2 affine
  w2        [L, BW, 9*G] 3x3 kernels, taps stacked minor-to-major as
                         (ty*3 + tx) * G
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _make_block_kernel(L, c0, growth, dil, H, W, CH, dtype):
    cmax = c0 + L * growth

    def kernel(x0_ref, mul1_ref, add1_ref, w1_ref, mul2_ref, add2_ref,
               w2_ref, out_ref, hpad_ref):
        bw = w1_ref.shape[-1]
        # feature stack lives in out_ref: input channels + growth as written
        out_ref[0, :, :, :c0] = x0_ref[0]
        out_ref[0, :, :, c0:] = jnp.zeros((H, W, cmax - c0), dtype)
        # zero once: layers only ever write the center, so the ring keeps
        # providing the 3x3 conv's zero padding at the image border
        hpad_ref[:] = jnp.zeros_like(hpad_ref)

        # layers are a static python loop (each needs a static channel
        # offset for its growth write); the H-chunk loops are fori_loops so
        # the Mosaic IR holds L x (1 + 9) matmuls, not L x H/CH x 10
        for l in range(L):
            cin = c0 + growth * l

            def conv1_chunk(i, _, l=l):
                hc = i * CH
                # full-width 1x1 bottleneck: channels >= cin have
                # mul=add=0 and zeroed w1 rows, so they contribute exactly 0
                # (out_ref's unwritten growth channels are zero-filled)
                y = out_ref[0, pl.ds(hc, CH), :, :]
                y = jnp.maximum(y * mul1_ref[l] + add1_ref[l], 0)
                acc = jnp.dot(y.reshape(CH * W, cmax), w1_ref[l],
                              preferred_element_type=jnp.float32)
                h = jnp.maximum(
                    acc.astype(dtype) * mul2_ref[l] + add2_ref[l], 0)
                hpad_ref[pl.ds(dil + hc, CH), dil:dil + W, :] = \
                    h.reshape(CH, W, bw)
                return 0

            jax.lax.fori_loop(0, H // CH, conv1_chunk, 0)

            # 3x3 growth conv as ONE tap-stacked matmul per chunk
            # ([rows, bw] x [bw, 9*growth] -- 9*growth lanes keep the MXU
            # mostly full, vs 9 separate growth-wide dots at growth/128
            # lane utilization) followed by nine shifted VPU adds:
            # out(p, q) = sum_taps t[p + ty*d, q + tx*d, tap-slice]
            wp = 2 * dil + W
            c2 = CH
            while c2 > 1 and \
                    (c2 + 2 * dil) * wp * 9 * growth * 4 > 24 * 2 ** 20:
                c2 //= 2
            if (c2 + 2 * dil) * wp * 9 * growth * 4 > 24 * 2 ** 20:
                raise ValueError(
                    f"dense-block conv2 temp exceeds the 24MB VMEM budget "
                    f"even at one row per chunk (W={W}, dil={dil}, "
                    f"growth={growth}); input too wide for this kernel")

            def conv2_chunk(i, _, l=l, cin=cin, c2=c2):
                hc = i * c2
                win = hpad_ref[pl.ds(hc, c2 + 2 * dil), 0:wp, :]
                t = jnp.dot(win.reshape((c2 + 2 * dil) * wp, bw), w2_ref[l],
                            preferred_element_type=jnp.float32)
                t = t.reshape(c2 + 2 * dil, wp, 9 * growth)
                acc = jnp.zeros((c2, W, growth), jnp.float32)
                for ty in range(3):
                    for tx in range(3):
                        k = ty * 3 + tx
                        acc = acc + t[ty * dil:ty * dil + c2,
                                      tx * dil:tx * dil + W,
                                      k * growth:(k + 1) * growth]
                out_ref[0, pl.ds(hc, c2), :, cin:cin + growth] = \
                    acc.astype(dtype)
                return 0

            jax.lax.fori_loop(0, H // c2, conv2_chunk, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("growth", "dilation", "interpret"))
def dense_block_eval(x0, mul1, add1, w1, mul2, add2, w2, *, growth,
                     dilation=1, interpret=False):
    """Run one eval-mode dense block on-chip.

    x0 [B, H, W, c0] -> [B, H, W, c0 + L*growth] (the block's full
    concatenated feature stack, input channels first -- identical layout to
    the flax path's output).
    """
    b, h, w, c0 = x0.shape
    L, cmax = mul1.shape
    bw = w1.shape[-1]
    dtype = x0.dtype

    ch = h
    for cand in (32, 16, 8, 4, 2, 1):
        if h % cand == 0 and cand <= h:
            ch = cand
            break

    wpad = _round_up(w + 2 * dilation, 8)
    kernel = _make_block_kernel(L, c0, growth, dilation, h, w, ch, dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c0), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, cmax), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, cmax), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, cmax, bw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bw, 9 * growth), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cmax), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cmax), dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * dilation, wpad, bw), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x0, mul1, add1, w1, mul2, add2, w2)
