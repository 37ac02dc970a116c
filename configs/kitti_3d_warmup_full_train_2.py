"""Longer trainval warmup (reference kitti_3d_warmup_full_train_2.py):
160k iterations instead of 80k -- feeds groomed_nms_full_train_2."""

from .kitti_3d_warmup_full_train import config as base


def config():
    return base().replace(name="kitti_3d_warmup_full_train_2",
                          max_iter=160000)
