"""Warmup on split2 (reference scripts/config/kitti_3d_warmup_split2.py)."""

from .kitti_3d_warmup import config as base


def config():
    return base().replace(name="kitti_3d_warmup_split2",
                          dataset_train="kitti_split2",
                          dataset_test="kitti_split2")
