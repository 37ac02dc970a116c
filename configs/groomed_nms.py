"""Stage-2 GrooMeD-NMS run: warm-started, NMS in loss, acceptance branch.

Reference scripts/config/groumd_nms.py -- the shipped headline config.
"""

from groomed_nms_tpu.config import ExperimentConfig


def config() -> ExperimentConfig:
    return ExperimentConfig(
        name="groomed_nms",
        pretrained="output/kitti_3d_warmup",
        copy_stats=True,
    )
