"""Tiny synthetic-data config for integration tests and smoke runs.

Not a reference config: shrinks every axis (backbone, crop, anchor count,
NMS budgets) so the full train/test scripts run in seconds on CPU.
"""

from groomed_nms_tpu.config import ExperimentConfig


def config() -> ExperimentConfig:
    return ExperimentConfig(
        name="tiny_synthetic",
        backbone_tiny=True,
        max_iter=4,
        snapshot_iter=50,   # the final iteration always checkpoints
        display=2,
        batch_size=2,
        test_batch_size=2,
        crop_size=(96, 320),
        test_scale=96,
        anchor_scales_count=4,
        min_gt_vis=0.0,
        max_gts=16,
        max_igns=8,
        max_nms_boxes=32,
        max_ap_boxes=64,
        nms_topN_pre=64,
        nms_topN_post=8,
        score_thres=0.05,
        bbox_2d_lambda=1.0,   # direct 2D smooth-L1 for fast overfit checks
        use_nms_in_loss=True,
        predict_acceptance_prob=True,
        use_acceptance_prob_in_regression_loss=True,
        bbox_un_dynamic=True,
        fast_eval=True,
    )
