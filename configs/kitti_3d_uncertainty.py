"""The `_un` model variant: uncertainty head instead of acceptance branch.

Reference scripts/config/kitti_3d_uncertainty.py (model
densenet121_3d_dilate_decomp_alpha_un).
"""

from groomed_nms_tpu.config import ExperimentConfig


def config() -> ExperimentConfig:
    return ExperimentConfig(
        name="kitti_3d_uncertainty",
        model="rpn_3d_un",
        snapshot_iter=25000,
        display=250,
        use_nms_in_loss=False,
        after_nms_lambda=0.0,
        predict_acceptance_prob=False,
        has_un=True,
        bbox_un_dynamic=True,
        use_acceptance_prob_in_regression_loss=False,
        pretrained="output/kitti_3d_warmup",
        copy_stats=True,
    )
