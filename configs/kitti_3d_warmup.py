"""Stage-1 warmup: 80k iters, no NMS in loss, no acceptance branch.

Reference scripts/config/kitti_3d_warmup.py.
"""

from groomed_nms_tpu.config import ExperimentConfig


def config() -> ExperimentConfig:
    return ExperimentConfig(
        name="kitti_3d_warmup",
        max_iter=80000,
        snapshot_iter=20000,
        display=250,
        use_nms_in_loss=False,
        predict_acceptance_prob=False,
        use_acceptance_prob_in_regression_loss=False,
        weigh_acceptance_prob_regularization=False,
        use_acceptance_prob_for_nms=False,
        bbox_un_dynamic=False,
        after_nms_lambda=0.0,
        score_thres=0.75,
    )
