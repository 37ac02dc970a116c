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
    # NOTE: a dynamic-update-slice variant of the dense connectivity (write
    # growth channels into a preallocated block buffer instead of chaining
    # concats) measured 2.7x SLOWER on v5e (150.8 vs 55.8 ms/batch-8
    # forward): XLA already elides the concat-chain copies, and DUS breaks
    # its fusion. Keep the plain concat chain.

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


class DenseLayer(nn.Module):
    """BN -> ReLU -> 1x1 conv -> BN -> ReLU -> 3x3 conv, concat onto input."""

    growth_rate: int
    bn_size: int
    dilation: int
    dtype: jnp.dtype
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         momentum=self.momentum, name="norm1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
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
        x = nn.Conv(cfg.stem_features, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, dtype=cfg.dtype,
                    name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=cfg.dtype,
                         momentum=cfg.bn_momentum, name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = cfg.stem_features
        for bi, num_layers in enumerate(cfg.block_layers):
            for li in range(num_layers):
                new = DenseLayer(
                    cfg.growth_rate, cfg.bn_size,
                    cfg.block_dilations[bi], cfg.dtype, cfg.bn_momentum,
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
