"""Experiment configuration: one typed dataclass, importable config modules.

Capability match for the reference's config system (scripts/config/*.py
python modules returning an edict, loaded by init_config at lib/core.py:35-45
and defaulted all over with ``X if 'k' not in conf else conf.k``).  Here a
single frozen dataclass holds every knob with its shipped default, and a
config module exports ``config() -> ExperimentConfig``; typed sub-configs
for the model / loss / detection layers are derived, so there is exactly one
source of truth and no stringly-typed defaulting.
"""

from __future__ import annotations

import dataclasses
import importlib
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

from .inference import DetectConfig
from .losses.rpn_3d import LossConfig
from .models.densenet import DenseNetConfig
from .models.rpn_3d import RPNConfig


@dataclass(frozen=True)
class ExperimentConfig:
    """Every knob of an experiment, defaults = the GrooMeD-NMS shipped run
    (scripts/config/groumd_nms.py)."""

    name: str = "groomed_nms"
    model: str = "rpn_3d"                     # rpn_3d | rpn_3d_un | kalman

    # solver (reference groumd_nms.py:13-28)
    solver_type: str = "sgd"
    momentum: float = 0.9
    weight_decay: float = 0.0005
    max_iter: int = 50000
    snapshot_iter: int = 10000
    display: int = 100
    do_test: bool = True
    fast_eval: bool = True
    lr: float = 0.004
    lr_policy: str = "poly"
    lr_steps: Optional[Sequence[float]] = None
    lr_target_factor: float = 1e-5
    warmup_iters: int = 0
    batch_skip: int = 1
    grad_clip_value: float = 1.0
    pretrained: Optional[str] = None
    copy_stats: bool = False

    # freezing (reference scripts/train_rpn_3d.py:112-116, lib/core.py:578-
    # 622). NOTE the reference's inverted naming, kept for config parity:
    # freeze_blacklist is a TRAIN whitelist (everything NOT matching
    # freezes, e.g. kitti_3d_full trains only ['pose', 'conf'] heads);
    # freeze_whitelist freezes matching params. slow_bn is the torch BN
    # momentum override (0.01 in the reference's usage; 0 = disabled).
    freeze_blacklist: Optional[Sequence[str]] = None
    freeze_whitelist: Optional[Sequence[str]] = None
    freeze_bn: bool = False
    slow_bn: float = 0.0

    # loss logic (groumd_nms.py:33-69)
    hard_negatives: bool = True
    focal_loss: float = 0.0
    cls_2d_lambda: float = 1.0
    iou_2d_lambda: float = 1.0
    bbox_2d_lambda: float = 0.0
    bbox_3d_lambda: float = 1.0
    bbox_axis_head_lambda: float = 0.35
    predict_acceptance_prob: bool = True
    acceptance_prob_lambda: float = 0.0
    use_nms_in_loss: bool = True
    diff_nms_temperature: float = 0.1
    diff_nms_pruning_method: str = "linear"
    diff_nms_valid_box_prob_threshold: float = 0.3
    diff_nms_group_boxes: bool = True
    diff_nms_mask_group_boxes: bool = True
    diff_nms_group_size: int = 100
    after_nms_lambda: float = 0.05
    after_nms_loss_mode: str = "rank"
    rank_boxes_of_all_images_at_once: bool = False
    overlap_in_nms: str = "2d"
    best_target_box_beta: float = 0.3
    has_un: bool = False
    bbox_un_lambda: float = 0.0
    bbox_un_dynamic: bool = True
    use_un_for_score: bool = True
    use_acceptance_prob_for_nms: bool = True
    boxes_for_acceptance_prob: str = "foregrounds"
    acceptance_prob_overlap_thres: float = 0.01
    acceptance_prob_mode: str = "likelihood"
    # ordinal-bin classify mode (reference lib/loss/rpn_3d.py:647-705 --
    # working-but-unshipped there; bins-1 binary classifiers over IoU3D
    # boundaries, or top-sort_K-vs-rest when sort_K > 0 and bins == 2)
    acceptance_prob_classify_bins: int = 2
    acceptance_prob_classify_sort_K: int = 0
    bins_boundary: Sequence[float] = (0.5,)
    use_acceptance_prob_in_regression_loss: bool = True
    weigh_acceptance_prob_regularization: bool = True
    weigh_3D_regression_loss_by_gt_iou3d: bool = False
    rank_with_class_confidence: bool = False
    decomp_alpha: bool = True
    score_thres: float = 0.6
    # velocity regression for the video/kalman model (reference
    # kitti_3d_full.py:43 has_vel=True; adds a bbox_3d channel + stats col 13)
    has_vel: bool = False
    # clip length for video-model training (reference kitti_3d_full.py:35
    # video_count=2: previous frame + current)
    video_count: int = 1
    # ego-pose loss weights (reference kitti_3d_full.py:150-151)
    pose_lambda_t: float = 1.0
    pose_lambda_r: float = 40.0

    # rng
    rng_seed: int = 5

    # network / image (groumd_nms.py:76-93)
    image_means: Sequence[float] = (0.485, 0.456, 0.406)
    image_stds: Sequence[float] = (0.229, 0.224, 0.225)
    feat_stride: int = 16
    test_scale: int = 512
    crop_size: Sequence[int] = (512, 1760)
    mirror_prob: float = 0.5
    distort_prob: float = -1.0

    # dataset (groumd_nms.py:95-109)
    dataset_root: str = "data"
    dataset_train: str = "kitti_split1"
    dataset_test: str = "kitti_split1"
    im_ext: str = ".png"
    use_3d_for_2d: bool = True
    percent_anc_h: Sequence[float] = (0.0625, 0.75)
    min_gt_vis: float = 0.65
    ilbls: Sequence[str] = ("Van", "ignore")
    lbls: Sequence[str] = ("Car", "Pedestrian", "Cyclist")

    # sampling (groumd_nms.py:115-124)
    batch_size: int = 2
    fg_image_ratio: float = 1.0
    box_samples: float = 0.20
    fg_fraction: float = 0.20
    bg_thresh_lo: float = 0.0
    bg_thresh_hi: float = 0.5
    fg_thresh: float = 0.5
    ign_thresh: float = 0.5
    best_thresh: float = 0.35

    # inference (groumd_nms.py:130-139)
    nms_topN_pre: int = 3000
    nms_topN_post: int = 40
    nms_thres: float = 0.4
    clip_boxes: bool = False
    use_differentiable_nms_at_test: bool = False
    test_batch_size: int = 8
    # one compiled program for ALL val image sizes (per-image dynamic-scale
    # resample) instead of one compile per distinct size -- see
    # eval/tester.py + data/augment.py::preprocess_images_dynamic
    eval_single_program: bool = False

    # anchors (groumd_nms.py:145-158)
    anchor_scales_count: int = 12
    anchor_ratios: Sequence[float] = (0.5, 1.0, 1.5)

    # fixed-shape padding knobs (TPU-specific)
    max_gts: int = 64
    max_igns: int = 32
    max_nms_boxes: int = 512
    max_ap_boxes: int = 1024

    # backbone (tiny=True used by tests / dry runs)
    backbone_tiny: bool = False
    compute_dtype: str = "float32"            # or "bfloat16"
    # rematerialize backbone activations in the train step's backward pass:
    # False/"none", True/"layer" (whole dense layers; measured +8% step
    # time, kept for peak memory), or "epilogue" (only each layer's
    # BN2->ReLU->conv2 tail -- see DenseNetConfig.remat_epilogue)
    backbone_remat: object = False

    # derived --------------------------------------------------------------
    @property
    def min_gt_h(self) -> float:
        return self.test_scale * self.percent_anc_h[0]

    @property
    def max_gt_h(self) -> float:
        return self.test_scale * self.percent_anc_h[1]

    @property
    def anchor_scales(self):
        base = (self.max_gt_h / self.min_gt_h) ** (
            1.0 / (self.anchor_scales_count - 1))
        return np.array([self.min_gt_h * base ** i
                         for i in range(self.anchor_scales_count)])

    @property
    def num_classes(self) -> int:
        return len(self.lbls) + 1

    def backbone_config(self) -> DenseNetConfig:
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        # torch momentum (batch weight) -> flax momentum (EMA decay)
        bn_momentum = 1.0 - self.slow_bn if self.slow_bn else 0.9
        remat = self.backbone_remat
        if remat in (False, None, "none", ""):
            layers, epilogue = False, False
        elif remat in (True, "layer", "layers"):
            layers, epilogue = True, False
        elif remat == "epilogue":
            layers, epilogue = False, True
        else:
            raise ValueError(f"backbone_remat={remat!r}: expected "
                             "False/'none', True/'layer', or 'epilogue'")
        if self.backbone_tiny:
            from .models.densenet import tiny_densenet_config
            cfg = tiny_densenet_config(dtype)
            return dataclasses.replace(cfg, bn_momentum=bn_momentum,
                                       remat_layers=layers,
                                       remat_epilogue=epilogue)
        return DenseNetConfig(dtype=dtype, bn_momentum=bn_momentum,
                              remat_layers=layers, remat_epilogue=epilogue)

    def rpn_config(self, num_anchors: int) -> RPNConfig:
        return RPNConfig(
            num_classes=self.num_classes,
            num_anchors=num_anchors,
            feat_stride=self.feat_stride,
            predict_acceptance_prob=self.predict_acceptance_prob,
            acceptance_prob_mode=self.acceptance_prob_mode,
            acceptance_prob_classify_bins=self.acceptance_prob_classify_bins,
            predict_uncertainty=self.has_un,
            predict_velocity=self.has_vel,
            backbone=self.backbone_config(),
        )

    def loss_config(self) -> LossConfig:
        return LossConfig(
            num_classes=self.num_classes,
            fg_fraction=self.fg_fraction,
            box_samples=self.box_samples,
            hard_negatives=self.hard_negatives,
            focal_loss=self.focal_loss,
            fg_thresh=self.fg_thresh,
            ign_thresh=self.ign_thresh,
            bg_thresh_lo=self.bg_thresh_lo,
            bg_thresh_hi=self.bg_thresh_hi,
            best_thresh=self.best_thresh,
            cls_2d_lambda=self.cls_2d_lambda,
            iou_2d_lambda=self.iou_2d_lambda,
            bbox_2d_lambda=self.bbox_2d_lambda,
            bbox_3d_lambda=self.bbox_3d_lambda,
            bbox_axis_head_lambda=self.bbox_axis_head_lambda,
            decomp_alpha=self.decomp_alpha,
            use_nms_in_loss=self.use_nms_in_loss,
            nms_thres=self.nms_thres,
            diff_nms_pruning_method=self.diff_nms_pruning_method,
            diff_nms_temperature=self.diff_nms_temperature,
            diff_nms_valid_box_prob_threshold=self.diff_nms_valid_box_prob_threshold,
            diff_nms_group_boxes=self.diff_nms_group_boxes,
            diff_nms_mask_group_boxes=self.diff_nms_mask_group_boxes,
            diff_nms_group_size=self.diff_nms_group_size,
            after_nms_lambda=self.after_nms_lambda,
            after_nms_loss_mode=self.after_nms_loss_mode,
            rank_boxes_of_all_images_at_once=self.rank_boxes_of_all_images_at_once,
            overlap_in_nms=self.overlap_in_nms,
            best_target_box_beta=self.best_target_box_beta,
            rank_with_class_confidence=self.rank_with_class_confidence,
            predict_acceptance_prob=self.predict_acceptance_prob,
            acceptance_prob_lambda=self.acceptance_prob_lambda,
            acceptance_prob_mode=self.acceptance_prob_mode,
            acceptance_prob_classify_bins=self.acceptance_prob_classify_bins,
            acceptance_prob_classify_sort_K=self.acceptance_prob_classify_sort_K,
            bins_boundary=tuple(self.bins_boundary),
            boxes_for_acceptance_prob=self.boxes_for_acceptance_prob,
            acceptance_prob_overlap_thres=self.acceptance_prob_overlap_thres,
            use_acceptance_prob_in_regression_loss=self.use_acceptance_prob_in_regression_loss,
            weigh_acceptance_prob_regularization=self.weigh_acceptance_prob_regularization,
            weigh_3D_regression_loss_by_gt_iou3d=self.weigh_3D_regression_loss_by_gt_iou3d,
            has_un=self.has_un,
            has_vel=self.has_vel,
            bbox_un_lambda=self.bbox_un_lambda,
            bbox_un_dynamic=self.bbox_un_dynamic,
            max_nms_boxes=self.max_nms_boxes,
            max_ap_boxes=self.max_ap_boxes,
        )

    def detect_config(self) -> DetectConfig:
        return DetectConfig(
            num_classes=self.num_classes,
            nms_topN_pre=self.nms_topN_pre,
            nms_topN_post=self.nms_topN_post,
            nms_thres=self.nms_thres,
            score_thres=self.score_thres,
            clip_boxes=self.clip_boxes,
            use_un_for_score=self.use_un_for_score,
            use_differentiable_nms=self.use_differentiable_nms_at_test,
            diff_nms_pruning_method=self.diff_nms_pruning_method,
            diff_nms_temperature=self.diff_nms_temperature,
            diff_nms_valid_box_prob_threshold=self.diff_nms_valid_box_prob_threshold,
            diff_nms_group_boxes=self.diff_nms_group_boxes,
            diff_nms_mask_group_boxes=self.diff_nms_mask_group_boxes,
            diff_nms_group_size=self.diff_nms_group_size,
            overlap_in_nms=self.overlap_in_nms,
            use_acceptance_prob_for_nms=self.use_acceptance_prob_for_nms,
            decomp_alpha=self.decomp_alpha,
        )

    def replace(self, **kwargs) -> "ExperimentConfig":
        return dataclasses.replace(self, **kwargs)

    def dump(self, path):
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, default=str)


def apply_overrides(cfg: ExperimentConfig,
                    items: Sequence[str]) -> ExperimentConfig:
    """Apply ``key=value`` CLI overrides, parsed as Python literals.

    Replaces the reference's edit-the-config-file workflow (every ablation
    there is a whole copied module) with ``--set lr=0.008 --set
    batch_size=8`` on any script.  Unknown fields and malformed items fail
    fast with the list of valid names nearby.
    """
    import ast
    valid = {f.name for f in dataclasses.fields(cfg)}
    updates = {}
    for item in items:
        key, sep, raw = item.partition("=")
        if not sep:
            raise ValueError(f"bad override {item!r}: expected KEY=VALUE")
        if key not in valid:
            near = sorted(v for v in valid if key.split("_")[0] in v)[:5]
            raise ValueError(
                f"unknown config field {key!r}" +
                (f" (did you mean one of {near}?)" if near else ""))
        try:
            updates[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            updates[key] = raw  # bare strings: --set lr_policy=step
    return cfg.replace(**updates)


def load_config(name: str, search_package: str = "configs") -> ExperimentConfig:
    """Import ``<search_package>.<name>`` and call its ``config()``.

    Mirrors init_config (lib/core.py:35-45).  Ablation variants (the
    reference's per-file groumd_nms_{no_group,...}.py modules) live in one
    factory here (``configs/ablations.py``); their full names resolve
    through it, so every reference config name works on every script CLI,
    e.g. ``--config groomed_nms_soft_nms_0_1``.
    """
    try:
        mod = importlib.import_module(f"{search_package}.{name}")
    except ModuleNotFoundError:
        abl = importlib.import_module(f"{search_package}.ablations")
        prefix = "groomed_nms_"
        key = name[len(prefix):] if name.startswith(prefix) else name
        if key in abl.ALL:
            return abl.ALL[key]()
        if key.startswith("group_") and key[len("group_"):].isdigit():
            return abl.group_size(int(key[len("group_"):]))
        raise
    return mod.config()
