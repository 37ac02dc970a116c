"""Single-stage anchor-based 3D RPN head (decomp-alpha) on a DenseNet trunk.

Capability match for the reference's RPN module
(models/densenet121_3d_dilate_decomp_alpha.py:13-250 and the ``_un`` variant)
re-designed for TPU:

* **One fused head matmul.** The reference runs 13+ separate 1x1 convs
  (cls, x, y, w, h, x3d..l3d, alpha, axis, head, accept); each is a skinny
  [512 -> A] matmul that underfills the MXU.  Here a single 1x1 conv emits
  every per-anchor channel at once -- one [H*W, 512] x [512, A*C_total]
  matmul -- and the outputs are split by static slicing (free in XLA).
* **NHWC + (h, w, a) anchor order.** Heads reshape to [B, H*W*A, C] in the
  natural NHWC unroll; anchors.locate_anchors uses the same order, so no
  permutes appear anywhere on the hot path.
* **No stateful rois caching.** The reference caches rois on the module
  (models/...alpha.py:224-238); here rois are a pure function of
  (anchors, feat_size, stride) computed by the caller -- jit-friendly and
  shardable.

Outputs (all [B, R, *] with R = H*W*A):
  cls     raw class logits            [B, R, num_classes]
  prob    softmax probabilities       [B, R, num_classes]
  bbox_2d [dx, dy, dw, dh]            [B, R, 4]
  bbox_3d [x, y, z, w, h, l, rsin, rcos, axis(sig), head(sig), (vel)]
          [B, R, 10 (+1)] -- the vel channel exists when predict_velocity
          (the kalman variant's 20th channel, reference
          ..._un_kalman.py:207-212)
  accept_prob  sigmoid acceptance     [B, R] or None
  accept_cls   ordinal-classify path  [B, R, bins-1] or None
  uncertainty  sigmoid confidence     [B, R] or None (the ``_un`` variant's
               self-balancing confidence, reference ..._un.py:68,111)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from .densenet import DenseNetBackbone, DenseNetConfig


class RPNOutputs(NamedTuple):
    cls: jnp.ndarray
    prob: jnp.ndarray
    bbox_2d: jnp.ndarray
    bbox_3d: jnp.ndarray
    feat_hw: tuple
    accept_prob: Optional[jnp.ndarray] = None
    accept_cls: Optional[jnp.ndarray] = None
    uncertainty: Optional[jnp.ndarray] = None
    # raw fused head output [B, R, per_anchor] in compute dtype (bf16).  The
    # inference fast path scores + top-k gathers from THIS tensor so the
    # full-resolution f32 splits (cls/prob/bbox_2d/bbox_3d above) become dead
    # code under jit -- materializing [B, 126k, 18] f32 with 18-wide minor
    # dims cost ~4.5 ms/batch-8 in layout copies on v5e.  Channel order:
    # [cls(C) | bbox_2d(4) | bbox_3d(n3d) | uncertainty(0/1)].
    fused_raw: Optional[jnp.ndarray] = None


@dataclass(frozen=True)
class RPNConfig:
    num_classes: int = 4                  # bg + Car/Pedestrian/Cyclist
    num_anchors: int = 36
    prop_features: int = 512
    feat_stride: int = 16
    # acceptance-probability branch (GrooMeD-NMS configs)
    predict_acceptance_prob: bool = False
    acceptance_prob_mode: str = "likelihood"   # regress|rank|likelihood|classify
    acceptance_prob_classify_bins: int = 2
    acceptance_prob_num_layers: int = 1
    acceptance_prob_num_channels: int = 128
    # self-balancing uncertainty head (the ``_un`` model variant)
    predict_uncertainty: bool = False
    # per-object velocity regression channel (the kalman/video variant;
    # reference ..._un_kalman.py:207 keys on bbox_3d.shape[2] == 20)
    predict_velocity: bool = False
    backbone: DenseNetConfig = field(default_factory=DenseNetConfig)

    @property
    def dtype(self):
        return self.backbone.dtype

    @property
    def n_box3d(self) -> int:
        return _N_BOX3D + (1 if self.predict_velocity else 0)

    @property
    def accept_channels(self) -> int:
        if not self.predict_acceptance_prob:
            return 0
        if self.acceptance_prob_mode == "classify":
            return self.acceptance_prob_classify_bins - 1
        return 1


# per-anchor channel counts in the fused head, in slice order
_N_BOX2D = 4
_N_BOX3D = 10  # x3d y3d z3d w3d h3d l3d rsin rcos axis head


class RPN3D(nn.Module):
    """Backbone + prop_feats conv + fused per-anchor prediction head."""

    config: RPNConfig = field(default_factory=RPNConfig)

    @nn.compact
    def __call__(self, images, train: bool = False, return_base: bool = False):
        cfg = self.config
        a, c = cfg.num_anchors, cfg.num_classes

        feats = DenseNetBackbone(cfg.backbone, name="backbone")(images, train)
        h = nn.Conv(cfg.prop_features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="prop_feats")(feats)
        h = nn.relu(h)

        b, fh, fw, _ = h.shape
        r = fh * fw * a

        # one matmul for every per-anchor output channel
        n3d = cfg.n_box3d
        per_anchor = c + _N_BOX2D + n3d + (1 if cfg.predict_uncertainty else 0)
        fused = nn.Conv(a * per_anchor, (1, 1), dtype=cfg.dtype,
                        name="head")(h)
        fused_raw = fused.reshape(b, r, per_anchor)
        fused = fused_raw.astype(jnp.float32)

        cls = fused[..., :c]
        bbox_2d = fused[..., c:c + _N_BOX2D]
        bbox_3d = fused[..., c + _N_BOX2D:c + _N_BOX2D + n3d]
        # axis/head channels pass through a sigmoid (reference ...alpha.py:
        # 162-163); the optional vel channel (10) stays linear
        bbox_3d = jnp.concatenate(
            [bbox_3d[..., :8], nn.sigmoid(bbox_3d[..., 8:10]),
             bbox_3d[..., 10:]], axis=-1)

        uncertainty = None
        if cfg.predict_uncertainty:
            uncertainty = nn.sigmoid(fused[..., c + _N_BOX2D + n3d])

        prob = nn.softmax(cls, axis=-1)

        accept_prob = accept_cls = None
        if cfg.predict_acceptance_prob:
            # small separate branch (128ch hidden stack), reference
            # ...alpha.py:108-124; kept unfused because it is optional per
            # config and tiny relative to the main head.
            ah = h
            for i in range(cfg.acceptance_prob_num_layers - 1):
                ah = nn.Conv(cfg.acceptance_prob_num_channels, (1, 1),
                             dtype=cfg.dtype, name=f"accept_{i}")(ah)
                ah = nn.relu(ah)
            out_ch = a * cfg.accept_channels
            ap = nn.Conv(out_ch, (1, 1), dtype=cfg.dtype,
                         name="accept_out")(ah)
            ap = ap.reshape(b, r, cfg.accept_channels).astype(jnp.float32)
            if cfg.acceptance_prob_mode == "classify":
                accept_cls = nn.sigmoid(ap)
            else:
                accept_prob = nn.sigmoid(ap[..., 0])

        outputs = RPNOutputs(cls=cls, prob=prob, bbox_2d=bbox_2d,
                             bbox_3d=bbox_3d, feat_hw=(fh, fw),
                             accept_prob=accept_prob, accept_cls=accept_cls,
                             uncertainty=uncertainty, fused_raw=fused_raw)
        if return_base:
            # trunk features for the video model's pose head (the
            # reference's return_base flag, models/...alpha.py:1082)
            return outputs, feats
        return outputs
