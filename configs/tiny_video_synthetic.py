"""Tiny video-model config for integration tests (kitti_3d_full shape).

Not a reference config: shrinks every axis so the scripts/train.py video
dispatch (model="kalman" -> VideoRPN3D + VideoTrainLoader) runs in seconds
on CPU against a synthetic tracking tree.
"""

from groomed_nms_tpu.config import ExperimentConfig


def config() -> ExperimentConfig:
    return ExperimentConfig(
        name="tiny_video_synthetic",
        model="kalman",
        backbone_tiny=True,
        max_iter=2,
        snapshot_iter=50,
        display=1,
        batch_size=2,
        test_batch_size=2,
        crop_size=(96, 320),
        test_scale=96,
        anchor_scales_count=4,
        min_gt_vis=0.0,
        max_gts=8,
        max_igns=4,
        max_nms_boxes=32,
        max_ap_boxes=64,
        has_vel=True,
        has_un=True,
        bbox_un_dynamic=True,
        predict_acceptance_prob=False,
        use_nms_in_loss=False,
        after_nms_lambda=0.0,
        video_count=2,
        freeze_whitelist=("backbone",),
        do_test=False,
    )
