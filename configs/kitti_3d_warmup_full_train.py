"""Trainval warmup (reference scripts/config/kitti_3d_warmup_full_train.py):
the stage-1 warmup trained on the full KITTI training annotations with no
validation split (do_test off) -- feeds groomed_nms_full_train."""

from .kitti_3d_warmup import config as base


def config():
    return base().replace(name="kitti_3d_warmup_full_train",
                          dataset_train="kitti",
                          dataset_test="kitti",
                          do_test=False)
