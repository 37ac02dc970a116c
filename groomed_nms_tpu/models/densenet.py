"""DenseNet backbone (dilated final block) in Flax, NHWC, TPU-first.

Capability match for the reference's torchvision DenseNet-121 ``features``
trunk with ``transition3.pool`` deleted and every ``denseblock4`` 3x3 conv
dilated x2, giving stride 16 (reference
models/densenet121_3d_dilate_decomp_alpha.py:21-39).  This is a fresh
implementation, not a port:

* **NHWC layout** -- the native TPU conv layout; torchvision is NCHW.
* **bf16 compute / f32 params** via the ``dtype`` knob: convs and concats in
  bf16 feed the MXU at full rate; BatchNorm statistics stay f32.
* **Dense connectivity without re-concat chains**: each layer concatenates
  once onto the running feature map; XLA fuses the BN+ReLU+1x1 bottleneck
  chains into the conv epilogues.
* Configurable depth/width so tests and the multi-chip dry-run can build
  tiny variants with identical topology.

Weight porting: torchvision DenseNet-121 checkpoints map 1:1 onto this
module (same conv/BN graph); see utils/torch_weights.py for the converter.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DenseNetConfig:
    """DenseNet-BC topology. Defaults = DenseNet-121, dilated stride-16."""

    growth_rate: int = 32
    block_layers: Sequence[int] = (6, 12, 24, 16)
    stem_features: int = 64
    bn_size: int = 4                     # bottleneck width multiplier
    # per-block dilation of the 3x3 convs; last block dilated x2 replaces the
    # stride the deleted transition3 pool would have added.
    block_dilations: Sequence[int] = (1, 1, 1, 2)
    # transitions after blocks 0..n-2; True = 2x2 avg-pool stride 2.
    # transition3 (index 2) keeps its 1x1 conv but loses the pool.
    transition_pool: Sequence[bool] = (True, True, False)
    dtype: jnp.dtype = jnp.float32       # compute dtype (bf16 for TPU speed)
    # running-stats EMA decay, flax convention (new = m*old + (1-m)*batch).
    # 0.9 == torch BatchNorm2d's default momentum=0.1, which the reference
    # trains with; the slow_bn knob (lib/core.py:583-586 sets
    # module.momentum, i.e. the *batch* weight) maps to 1 - slow_bn here.
    bn_momentum: float = 0.9
    # Virtual-concat dense connectivity (default): layer inputs stay a LIST
    # of prior feature tensors; the per-layer BN/ReLU/1x1-conv decompose
    # slice-wise over the list (BN is per-channel, conv1x1(concat(t_j), W) =
    # sum_j t_j @ W[slice_j]), so the running feature map is NEVER
    # materialized. Round-1 profiling showed the explicit concat chain cost
    # 17.1 of the 37.8 ms/batch-8 trunk device time (concatenate 14.3 ms +
    # copy 2.8 ms) -- XLA does NOT elide it. Param/batch_stats trees are
    # bit-identical between both paths (kernels sliced at apply time).
    # NOTE: a dynamic-update-slice variant (write growth channels into a
    # preallocated buffer) measured 2.7x SLOWER on v5e: DUS breaks fusion.
    virtual_concat: bool = True
    # Exact space-to-depth rewrite of the 7x7/s2 stem conv: a 3-channel
    # input uses 3/128 of the MXU's contraction lanes (profiled at 4.7 of
    # the 37.8 ms/batch-8 trunk). Width-only s2d -- a bitcast reshape
    # [H, W, 3] -> [H, W/2, 6], no transpose (a 2D s2d transpose cost 3.6
    # ms in layout copies, more than it saved) -- turns it into an
    # equivalent [7, 4, 6, 64] conv with strides (2, 1): same function,
    # same conv0/kernel param (scattered at apply time), 2x the MXU
    # contraction utilization with zero data movement.
    stem_space_to_depth: bool = True
    # width-fold factor for the s2d stem: 2 (one conv, 6 channels) or 4
    # (even/odd phase convs, 12 channels -- see stem_s2d4_conv)
    stem_fold: int = 2
    # Rematerialize each dense layer in the backward pass (training only;
    # no effect on inference graphs, which save nothing anyway).  The
    # batch-8 train step sits at the HBM roofline with the MXU at 15%
    # (docs/BENCHMARKS.md round-4 closure), so recomputing the per-layer
    # BN/ReLU/bottleneck-conv chain instead of saving its activations
    # trades idle MXU cycles for the binding resource.  Layer INPUTS are
    # the chunk tensors that exist across layers regardless, so remat
    # stores nothing extra.  Param/batch_stats trees are unchanged
    # (lifted transform preserves module names).
    # MEASURED NEGATIVE for step time (+8%: the recompute re-reads the
    # O(L^2) virtual-concat chunk bytes); kept as a peak-memory knob.
    remat_layers: bool = False
    # Finer-grained remat: recompute only each layer's BN2->ReLU->3x3-conv
    # epilogue in the backward pass.  Its input ``h`` (the 128-wide
    # bottleneck output) is saved either way as the conv2 residual, so
    # unlike remat_layers this re-reads NO chunk bytes -- it only drops the
    # second 128-wide saved tensor (relu(BN2(h))) per layer in exchange
    # for recomputing one cheap BN+ReLU chain and the 3x3 conv.
    remat_epilogue: bool = False

    @property
    def out_features(self) -> int:
        n = self.stem_features
        for i, layers in enumerate(self.block_layers):
            n += layers * self.growth_rate
            if i < len(self.block_layers) - 1:
                n //= 2
        return n


def tiny_densenet_config(dtype=jnp.float32) -> DenseNetConfig:
    """A toy topology for unit tests and the virtual-mesh dry-run."""
    return DenseNetConfig(growth_rate=8, block_layers=(2, 2, 2, 2),
                          stem_features=16, block_dilations=(1, 1, 1, 2),
                          transition_pool=(True, True, False), dtype=dtype)


class VirtualConcatBN(nn.Module):
    """BatchNorm over a virtual concatenation.

    Takes a LIST of tensors whose channel dims sum to ``total_features`` and
    normalizes each slice with the matching slice of full-width parameters.
    Per-channel statistics only ever involve one source tensor, so both
    eval-mode affine application and train-mode batch statistics decompose
    exactly -- no concatenated tensor is ever built. Parameter and
    batch_stats layout (scale/bias, mean/var of width ``total_features``)
    is identical to ``nn.BatchNorm``, so checkpoints and the torch-weight
    converter are oblivious to which path built them.
    """

    total_features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sources, train: bool):
        import jax

        c_total = self.total_features
        scale = self.param("scale", nn.initializers.ones, (c_total,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c_total,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (c_total,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (c_total,))

        offsets = []
        off = 0
        for t in sources:
            offsets.append(off)
            off += t.shape[-1]
        assert off == c_total, (off, c_total)

        outs = []
        new_means, new_vars = [], []
        for t, o in zip(sources, offsets):
            c = t.shape[-1]
            if train:
                xf = t.astype(jnp.promote_types(t.dtype, jnp.float32))
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) -                     jnp.square(mean)
                new_means.append(mean)
                new_vars.append(var)
            else:
                mean = jax.lax.dynamic_slice(ra_mean.value, (o,), (c,))
                var = jax.lax.dynamic_slice(ra_var.value, (o,), (c,))
            sl_scale = jax.lax.dynamic_slice(scale, (o,), (c,))
            sl_bias = jax.lax.dynamic_slice(bias, (o,), (c,))
            mul = (sl_scale * jax.lax.rsqrt(var + self.epsilon)).astype(
                self.dtype)
            add = (sl_bias - mean * sl_scale *
                   jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
            outs.append(t.astype(self.dtype) * mul + add)

        if train and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value +                 (1 - m) * jnp.concatenate(new_means)
            ra_var.value = m * ra_var.value +                 (1 - m) * jnp.concatenate(new_vars)
        return outs


class SlicedConv1x1(nn.Module):
    """Bias-free 1x1 conv over a virtual concatenation.

    ``conv1x1(concat(t_j), W) == sum_j t_j @ W[slice_j]``. Declares one
    full-width ``kernel`` param shaped like ``nn.Conv``'s [1, 1, Cin, Cout],
    sliced at apply time.
    """

    in_features: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sources):
        import jax

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.features),
                            jnp.float32)
        kernel = kernel.astype(self.dtype)
        out = None
        off = 0
        for t in sources:
            c = t.shape[-1]
            # a real 1x1 conv, not einsum: the dot emitter wants its lhs in
            # {3,1,2,0} while every trunk conv emits {3,0,2,1}, so einsum
            # forced a retile copy per growth tensor (~0.35 ms each at
            # block-1 size); convs consume conv-layout outputs natively.
            y = jax.lax.conv_general_dilated(
                t.astype(self.dtype), kernel[:, :, off:off + c, :],
                window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
            off += c
        assert off == self.in_features, (off, self.in_features)
        return out


class VDenseLayer(nn.Module):
    """Virtual-concat dense layer: same function (and param tree) as
    :class:`DenseLayer` without materializing the concatenated input."""

    total_features: int
    growth_rate: int
    bn_size: int
    dilation: int
    dtype: jnp.dtype
    momentum: float = 0.9
    remat_epilogue: bool = False

    @nn.compact
    def __call__(self, sources, train: bool):
        parts = VirtualConcatBN(self.total_features, self.momentum,
                                dtype=self.dtype, name="norm1")(sources,
                                                                train)
        parts = [nn.relu(p) for p in parts]
        h = SlicedConv1x1(self.total_features,
                          self.bn_size * self.growth_rate, self.dtype,
                          name="conv1")(parts)
        return _apply_epilogue(self, h, train, self.remat_epilogue)

    def _epilogue(self, h, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         momentum=self.momentum, name="norm2")(h)
        h = nn.relu(h)
        d = self.dilation
        h = nn.Conv(self.growth_rate, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        return h.astype(self.dtype)


class VTransition(nn.Module):
    """Virtual-concat transition: BN -> ReLU -> optional pool -> 1x1 conv,
    all decomposed over the source list; emits ONE tensor."""

    total_features: int
    out_features: int
    pool: bool
    dtype: jnp.dtype
    momentum: float = 0.9

    @nn.compact
    def __call__(self, sources, train: bool):
        parts = VirtualConcatBN(self.total_features, self.momentum,
                                dtype=self.dtype, name="norm")(sources,
                                                               train)
        parts = [nn.relu(p) for p in parts]
        if self.pool:
            parts = [nn.avg_pool(p, (2, 2), strides=(2, 2)) for p in parts]
        return SlicedConv1x1(self.total_features, self.out_features,
                             self.dtype, name="conv")(parts)


def _apply_epilogue(layer, h, train, remat):
    """Run a dense layer's BN2->ReLU->conv2 tail, optionally rematerialized.

    ``nn.remat`` on the BOUND method (module as first argument) keeps
    norm2/conv2 as direct children of the layer, so the param/batch_stats
    tree is bit-identical between both paths.
    """
    if remat:
        fn = nn.remat(type(layer)._epilogue, static_argnums=(2,),
                      policy=jax.checkpoint_policies.nothing_saveable)
        return fn(layer, h, train)
    return layer._epilogue(h, train)


class DenseLayer(nn.Module):
    """BN -> ReLU -> 1x1 conv -> BN -> ReLU -> 3x3 conv, concat onto input."""

    growth_rate: int
    bn_size: int
    dilation: int
    dtype: jnp.dtype
    momentum: float = 0.9
    remat_epilogue: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         momentum=self.momentum, name="norm1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        return _apply_epilogue(self, h, train, self.remat_epilogue)

    def _epilogue(self, h, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         momentum=self.momentum, name="norm2")(h)
        h = nn.relu(h)
        d = self.dilation
        h = nn.Conv(self.growth_rate, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        return h.astype(self.dtype)


class Transition(nn.Module):
    """BN -> ReLU -> 1x1 conv (halve channels) -> optional 2x2 avg pool."""

    out_features: int
    pool: bool
    dtype: jnp.dtype
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         momentum=self.momentum, name="norm")(x)
        h = nn.relu(h)
        # avg-pool BEFORE the bias-free 1x1 conv: mathematically identical
        # (linear ops commute) but quarters the conv work and output traffic
        if self.pool:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(h)
        return h


def stem_s2d_conv(x, k, dtype, stem_features):
    """7x7/s2 stem conv as a [7, 4, 6, 64] conv on a width-folded input.

    Exact identity: out(p, q) = sum_{u,v} K[u, v] x[2p+u-3, 2q+v-3]. Folding
    width pairs into channels (x'[i, j, dj*C+c] = x[i, 2j+dj, c] -- a pure
    reshape, contiguous in NHWC) regroups the width taps as v = 2b - 1 + dj
    for kernel offsets b in {0..3} (entries with v outside 0..6 are zero),
    giving strides (2, 1) and width padding (2, 1). ``k`` is the standard
    [7, 7, C, O] conv0/kernel -- checkpoints and the torch-weight converter
    see the standard layout.  Shared by the flax module and the fast-eval
    engine (models/fast_eval.py).
    """
    import jax

    b_, h, w, c = x.shape
    o = stem_features
    ks = jnp.zeros((7, 4, 2, c, o), k.dtype)
    for bq in range(4):
        for dj in range(2):
            v = 2 * bq - 1 + dj
            if 0 <= v <= 6:
                ks = ks.at[:, bq, dj].set(k[:, v])
    ks = ks.reshape(7, 4, 2 * c, o).astype(dtype)
    xs = x.reshape(b_, h, w // 2, 2 * c)
    return jax.lax.conv_general_dilated(
        xs.astype(dtype), ks, window_strides=(2, 1),
        padding=((3, 3), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem_s2d4_conv(x, k, dtype, stem_features):
    """7x7/s2 stem conv on a width-folded-by-4 input (two phase convs).

    Exact identity like :func:`stem_s2d_conv` but with 12 input channels
    (4 width phases x 3): even output columns q=2m come from a [7, 2, 12,
    O] conv over folded cells m-1..m, odd columns q=2m+1 from a [7, 3, 12,
    O] conv over m-1..m+1; the two outputs interleave with a free reshape.
    25% more MACs than the fold-2 form (zero-padded taps) but twice the
    MXU contraction-lane packing.
    """
    import jax

    b_, h, w, c = x.shape
    o = stem_features
    ke = jnp.zeros((7, 2, 4, c, o), k.dtype)
    ko = jnp.zeros((7, 3, 4, c, o), k.dtype)
    for t in range(1, 4):                     # even, cell m-1: v = t-1
        ke = ke.at[:, 0, t].set(k[:, t - 1])
    for t in range(4):                        # even, cell m:   v = t+3
        ke = ke.at[:, 1, t].set(k[:, t + 3])
    ko = ko.at[:, 0, 3].set(k[:, 0])          # odd, cell m-1:  v = 0
    for t in range(4):                        # odd, cell m:    v = t+1
        ko = ko.at[:, 1, t].set(k[:, t + 1])
    for t in range(2):                        # odd, cell m+1:  v = t+5
        ko = ko.at[:, 2, t].set(k[:, t + 5])
    ke = ke.reshape(7, 2, 4 * c, o).astype(dtype)
    ko = ko.reshape(7, 3, 4 * c, o).astype(dtype)
    xs = x.reshape(b_, h, w // 4, 4 * c).astype(dtype)
    even = jax.lax.conv_general_dilated(
        xs, ke, window_strides=(2, 1), padding=((3, 3), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    odd = jax.lax.conv_general_dilated(
        xs, ko, window_strides=(2, 1), padding=((3, 3), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    oh, ow = even.shape[1], even.shape[2]
    return jnp.stack([even, odd], axis=3).reshape(b_, oh, ow * 2, o)


def _stem_conv_s2d(parent, x, cfg):
    # declare the standard conv0/kernel param via a scoped child so the
    # tree path matches nn.Conv(name='conv0') exactly
    k = StemKernel(x.shape[-1], cfg.stem_features, name="conv0")()
    if cfg.stem_fold == 4 and x.shape[2] % 4 == 0:
        return stem_s2d4_conv(x, k, cfg.dtype, cfg.stem_features)
    return stem_s2d_conv(x, k, cfg.dtype, cfg.stem_features)


class StemKernel(nn.Module):
    """Declares the standard [7, 7, C, O] conv0 kernel parameter."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, self.in_features, self.features),
                          jnp.float32)


class DenseNetBackbone(nn.Module):
    """The trunk: stem -> 4 dense blocks with transitions -> final BN.

    Output is the final BatchNorm activation *without* ReLU, matching the
    reference's use of torchvision ``features`` (whose classifier applies the
    final ReLU; the RPN's prop_feats conv consumes the raw norm5 output).
    """

    config: DenseNetConfig = field(default_factory=DenseNetConfig)

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        x = x.astype(cfg.dtype)
        # stem: 7x7/2 conv, BN, ReLU, 3x3/2 max pool -> stride 4
        if cfg.stem_space_to_depth and x.shape[2] % 2 == 0:
            x = _stem_conv_s2d(self, x, cfg)
        else:
            x = nn.Conv(cfg.stem_features, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=cfg.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=cfg.dtype,
                         momentum=cfg.bn_momentum, name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = cfg.stem_features
        VLayer, Layer = VDenseLayer, DenseLayer
        if cfg.remat_layers:
            # static_argnums counts self: (sources/x, train) -> train is 2
            VLayer = nn.remat(
                VDenseLayer, static_argnums=(2,),
                policy=jax.checkpoint_policies.nothing_saveable)
            Layer = nn.remat(
                DenseLayer, static_argnums=(2,),
                policy=jax.checkpoint_policies.nothing_saveable)
        if cfg.virtual_concat:
            # parts = chunks + pending: new growth tensors collect in
            # `pending` and merge into a 128-channel chunk every 4 layers
            # (one cheap concat), so the per-layer sliced 1x1 convs contract
            # over full 128-wide MXU lanes instead of 32-wide slivers while
            # the full feature map is still never materialized.
            chunks, pending, pend_c = [x], [], 0
            for bi, num_layers in enumerate(cfg.block_layers):
                for li in range(num_layers):
                    new = VLayer(
                        features + li * cfg.growth_rate,
                        cfg.growth_rate, cfg.bn_size,
                        cfg.block_dilations[bi], cfg.dtype, cfg.bn_momentum,
                        remat_epilogue=cfg.remat_epilogue,
                        name=f"denseblock{bi + 1}_layer{li + 1}")(
                            chunks + pending, train)
                    pending.append(new)
                    pend_c += cfg.growth_rate
                    if pend_c >= 128:
                        chunks.append(jnp.concatenate(pending, axis=-1))
                        pending, pend_c = [], 0
                features += num_layers * cfg.growth_rate
                if bi < len(cfg.block_layers) - 1:
                    features //= 2
                    x = VTransition(
                        features * 2, features, cfg.transition_pool[bi],
                        cfg.dtype, cfg.bn_momentum,
                        name=f"transition{bi + 1}")(chunks + pending, train)
                    chunks, pending, pend_c = [x], [], 0
            parts = VirtualConcatBN(features, cfg.bn_momentum,
                                    dtype=cfg.dtype, name="norm5")(
                                        chunks + pending, train)
            # the ONLY full-width concat in the trunk
            return jnp.concatenate(parts, axis=-1)

        for bi, num_layers in enumerate(cfg.block_layers):
            for li in range(num_layers):
                new = Layer(
                    cfg.growth_rate, cfg.bn_size,
                    cfg.block_dilations[bi], cfg.dtype, cfg.bn_momentum,
                    remat_epilogue=cfg.remat_epilogue,
                    name=f"denseblock{bi + 1}_layer{li + 1}")(x, train)
                x = jnp.concatenate([x, new.astype(x.dtype)], axis=-1)
            features += num_layers * cfg.growth_rate
            if bi < len(cfg.block_layers) - 1:
                features //= 2
                x = Transition(features, cfg.transition_pool[bi], cfg.dtype,
                               cfg.bn_momentum,
                               name=f"transition{bi + 1}")(x, train)

        x = nn.BatchNorm(use_running_average=not train, dtype=cfg.dtype,
                         momentum=cfg.bn_momentum, name="norm5")(x)
        return x
