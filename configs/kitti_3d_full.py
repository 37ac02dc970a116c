"""Video model config: kalman tracker over 4-frame clips.

Reference scripts/config/kitti_3d_full.py (model
densenet121_3d_dilate_decomp_alpha_un_kalman).
"""

from groomed_nms_tpu.config import ExperimentConfig


def config() -> ExperimentConfig:
    return ExperimentConfig(
        name="kitti_3d_full",
        model="kalman",
        max_iter=80000,
        do_test=False,
        # reference trains only the pose network + confidence/uncertainty
        # heads in this stage (freeze_blacklist=['pose','conf'] is a
        # train-whitelist, kitti_3d_full.py:37); these are the equivalent
        # param-path substrings in this model tree
        freeze_blacklist=("pose_net", "accept", "uncertainty"),
        snapshot_iter=25000,
        display=250,
        use_nms_in_loss=False,
        after_nms_lambda=0.0,
        predict_acceptance_prob=False,
        has_un=True,
        has_vel=True,
        bbox_un_dynamic=True,
        use_acceptance_prob_in_regression_loss=False,
        pretrained="output/kitti_3d_uncertainty",
        copy_stats=True,
    )
