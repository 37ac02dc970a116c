"""Weight-folded eval-mode inference engine for the RPN3D model.

**NEGATIVE RESULT -- kept as an engineering record, NOT the production
path.**  Measured on v5e: 169.7 img/s vs 225.3 img/s for the flax/XLA
virtual-concat path (docs/BENCHMARKS.md "Pallas dense block"); the
hypothesis that a VMEM-resident dense block would beat XLA's fusion of the
virtual-concat trunk was falsified -- XLA's conv scheduling + layout
choices win.  Production inference uses ``RPN3D.apply`` (see
``__graft_entry__.py``); do not switch to this engine without re-measuring.

Consumes the flax parameter/batch-stats trees of ``RPN3D`` directly (plain
dict access -- no module tracing) and runs the forward pass with:

* BatchNorm running statistics folded into per-channel (mul, add) affine
  vectors at trace time,
* every dense block executed by the VMEM-resident Pallas kernel
  (ops/pallas_dense_block.py): one HBM read of the block input, one write
  of its output, all layer math on-chip,
* stem / transitions / norm5 / heads as plain lax ops (they are cheap and
  already fuse well).

Same function as ``RPN3D.apply(..., train=False)`` up to bf16 rounding
(accumulation orders differ); exercised by a parity test against the flax
path.  Training always uses the flax module (running stats must update).

Reference hot path being replaced: lib/rpn_util.py:1052-1356 (im_detect_3d
backbone forward) over torchvision densenet features.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.pallas_dense_block import dense_block_eval
from .densenet import stem_s2d_conv
from .rpn_3d import RPNConfig, RPNOutputs, _N_BOX2D


def _fold_bn(p, s, dtype, eps=1e-5):
    """Eval BatchNorm -> (mul, add) in compute dtype.

    Matches VirtualConcatBN (models/densenet.py): f32 fold, then cast.
    """
    inv = jax.lax.rsqrt(s["var"] + eps)
    mul = p["scale"] * inv
    add = p["bias"] - s["mean"] * mul
    return mul.astype(dtype), add.astype(dtype)


def _conv(x, kernel, dtype, *, stride=1, padding="SAME", dilation=1,
          bias=None):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _prep_dense_block(params, stats, prefix, L, c0, bcfg):
    """Stack + zero-pad one block's folded weights for the Pallas kernel."""
    g = bcfg.growth_rate
    bw = bcfg.bn_size * g
    cmax = c0 + L * g
    dt = bcfg.dtype
    mul1 = jnp.zeros((L, cmax), dt)
    add1 = jnp.zeros((L, cmax), dt)
    w1 = jnp.zeros((L, cmax, bw), dt)
    mul2 = jnp.zeros((L, bw), dt)
    add2 = jnp.zeros((L, bw), dt)
    w2 = jnp.zeros((L, bw, 9 * g), dt)
    for l in range(L):
        lp = params[f"{prefix}_layer{l + 1}"]
        ls = stats[f"{prefix}_layer{l + 1}"]
        cin = c0 + l * g
        m1, a1 = _fold_bn(lp["norm1"], ls["norm1"], dt)
        mul1 = mul1.at[l, :cin].set(m1)
        add1 = add1.at[l, :cin].set(a1)
        w1 = w1.at[l, :cin].set(lp["conv1"]["kernel"][0, 0].astype(dt))
        m2, a2 = _fold_bn(lp["norm2"], ls["norm2"], dt)
        mul2 = mul2.at[l].set(m2)
        add2 = add2.at[l].set(a2)
        k2 = lp["conv2"]["kernel"].astype(dt)          # [3, 3, bw, g]
        w2 = w2.at[l].set(k2.transpose(2, 0, 1, 3).reshape(bw, 9 * g))
    return mul1, add1, w1, mul2, add2, w2


def _dense_block_lax(x, params, stats, prefix, L, bcfg, dil):
    """Plain concat-chain dense block (used at low resolution, where the
    concat traffic is cheap and one giant Pallas kernel is not worth its
    compile cost)."""
    dt = bcfg.dtype
    for l in range(L):
        lp = params[f"{prefix}_layer{l + 1}"]
        ls = stats[f"{prefix}_layer{l + 1}"]
        m1, a1 = _fold_bn(lp["norm1"], ls["norm1"], dt)
        y = jnp.maximum(x * m1 + a1, 0)
        h = _conv(y, lp["conv1"]["kernel"], dt)
        m2, a2 = _fold_bn(lp["norm2"], ls["norm2"], dt)
        h = jnp.maximum(h * m2 + a2, 0)
        g = _conv(h, lp["conv2"]["kernel"], dt, dilation=dil)
        x = jnp.concatenate([x, g], axis=-1)
    return x


def backbone_eval(params, stats, bcfg, x, *, interpret=False,
                  pallas_blocks=(0, 1)):
    """Eval DenseNet trunk forward from raw param/stat dicts.

    ``pallas_blocks``: block indices run by the VMEM-resident kernel --
    default the two high-resolution blocks, where the O(L^2) HBM re-reads
    dominate; the dilated low-res blocks use a plain lax concat chain."""
    dt = bcfg.dtype
    x = x.astype(dt)
    from flax.linen import avg_pool, max_pool

    if bcfg.stem_space_to_depth and x.shape[2] % 2 == 0:
        x = stem_s2d_conv(x, params["conv0"]["kernel"], dt,
                          bcfg.stem_features)
    else:
        x = _conv(x, params["conv0"]["kernel"], dt, stride=2,
                  padding=((3, 3), (3, 3)))
    m, a = _fold_bn(params["norm0"], stats["norm0"], dt)
    x = jnp.maximum(x * m + a, 0)
    x = max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    feats = bcfg.stem_features
    for bi, L in enumerate(bcfg.block_layers):
        pre = f"denseblock{bi + 1}"
        if bi in pallas_blocks:
            weights = _prep_dense_block(params, stats, pre, L, feats, bcfg)
            x = dense_block_eval(x, *weights, growth=bcfg.growth_rate,
                                 dilation=bcfg.block_dilations[bi],
                                 interpret=interpret)
        else:
            x = _dense_block_lax(x, params, stats, pre, L, bcfg,
                                 bcfg.block_dilations[bi])
        feats += L * bcfg.growth_rate
        if bi < len(bcfg.block_layers) - 1:
            tp = params[f"transition{bi + 1}"]
            ts = stats[f"transition{bi + 1}"]
            m, a = _fold_bn(tp["norm"], ts["norm"], dt)
            x = jnp.maximum(x * m + a, 0)
            if bcfg.transition_pool[bi]:
                x = avg_pool(x, (2, 2), strides=(2, 2))
            feats //= 2
            x = _conv(x, tp["conv"]["kernel"], dt)
    m, a = _fold_bn(params["norm5"], stats["norm5"], dt)
    return x * m + a


def rpn_eval(variables, images, cfg: RPNConfig, *, interpret=False):
    """Eval forward of RPN3D from its variable dict; returns RPNOutputs.

    Same output contract as ``RPN3D.apply(variables, images, train=False)``
    (models/rpn_3d.py) -- the full-size f32 splits are computed lazily and
    dead-coded by XLA when the caller consumes only ``fused_raw``.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    a, c = cfg.num_anchors, cfg.num_classes
    dt = cfg.dtype

    feats = backbone_eval(params["backbone"], stats["backbone"],
                          cfg.backbone, images, interpret=interpret)
    h = _conv(feats, params["prop_feats"]["kernel"], dt,
              bias=params["prop_feats"]["bias"])
    h = jnp.maximum(h, 0)

    b, fh, fw, _ = h.shape
    r = fh * fw * a
    n3d = cfg.n_box3d
    per = c + _N_BOX2D + n3d + (1 if cfg.predict_uncertainty else 0)
    fused = _conv(h, params["head"]["kernel"], dt,
                  bias=params["head"]["bias"])
    fused_raw = fused.reshape(b, r, per)
    fused = fused_raw.astype(jnp.float32)

    cls = fused[..., :c]
    bbox_2d = fused[..., c:c + _N_BOX2D]
    bbox_3d = fused[..., c + _N_BOX2D:c + _N_BOX2D + n3d]
    bbox_3d = jnp.concatenate(
        [bbox_3d[..., :8], jax.nn.sigmoid(bbox_3d[..., 8:10]),
         bbox_3d[..., 10:]], axis=-1)
    uncertainty = None
    if cfg.predict_uncertainty:
        uncertainty = jax.nn.sigmoid(fused[..., c + _N_BOX2D + n3d])
    prob = jax.nn.softmax(cls, axis=-1)

    accept_prob = accept_cls = None
    if cfg.predict_acceptance_prob:
        ah = h
        for i in range(cfg.acceptance_prob_num_layers - 1):
            ah = jnp.maximum(
                _conv(ah, params[f"accept_{i}"]["kernel"], dt,
                      bias=params[f"accept_{i}"]["bias"]), 0)
        ap = _conv(ah, params["accept_out"]["kernel"], dt,
                   bias=params["accept_out"]["bias"])
        ap = ap.reshape(b, r, cfg.accept_channels).astype(jnp.float32)
        if cfg.acceptance_prob_mode == "classify":
            accept_cls = jax.nn.sigmoid(ap)
        else:
            accept_prob = jax.nn.sigmoid(ap[..., 0])

    return RPNOutputs(cls=cls, prob=prob, bbox_2d=bbox_2d, bbox_3d=bbox_3d,
                      feat_hw=(fh, fw), accept_prob=accept_prob,
                      accept_cls=accept_cls, uncertainty=uncertainty,
                      fused_raw=fused_raw)
