"""GrooMeD-NMS on split2 (reference scripts/config/groumd_nms_split2.py)."""

from .groomed_nms import config as base


def config():
    return base().replace(name="groomed_nms_split2",
                          dataset_train="kitti_split2",
                          dataset_test="kitti_split2",
                          pretrained="output/kitti_3d_warmup_split2")
