"""Self-balancing confidence without NMS-in-loss.

Reference scripts/config/self_balancing.py: acceptance branch trained only
through the dynamic (1 - confidence) regulariser + regression weighting.
"""

from groomed_nms_tpu.config import ExperimentConfig


def config() -> ExperimentConfig:
    return ExperimentConfig(
        name="self_balancing",
        snapshot_iter=25000,
        display=250,
        use_nms_in_loss=False,
        after_nms_lambda=0.0,
        predict_acceptance_prob=True,
        acceptance_prob_lambda=0.0,
        use_acceptance_prob_in_regression_loss=True,
        bbox_un_dynamic=True,
        pretrained="output/kitti_3d_warmup",
        copy_stats=True,
    )
