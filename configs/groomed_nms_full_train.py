"""Trainval -> test-server run (reference groumd_nms_full_train[_2].py):
train on the full KITTI training annotations, no validation split."""

from .groomed_nms import config as base


def config():
    return base().replace(name="groomed_nms_full_train",
                          dataset_train="kitti",
                          dataset_test="kitti",
                          pretrained="output/kitti_3d_warmup_full_train",
                          do_test=False)
