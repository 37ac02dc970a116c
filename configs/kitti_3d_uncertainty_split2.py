"""The `_un` model on split2 (reference kitti_3d_uncertainty_split2.py):
warm-started from the split2 warmup."""

from .kitti_3d_uncertainty import config as base


def config():
    return base().replace(name="kitti_3d_uncertainty_split2",
                          dataset_train="kitti_split2",
                          dataset_test="kitti_split2",
                          pretrained="output/kitti_3d_warmup_split2")
