"""Data layer: KITTI parsing, imdb construction, augmentation, batching.

Capability match for the reference's lib/imdb_util.py + lib/augmentations.py,
re-designed around fixed shapes: ragged per-image ground truth is padded to
[G_max] with validity masks at collate time, and the image transform stack
(resize / pad / normalise / mirror) runs as a jitted device-side function.
"""

from .kitti import (decompose_alpha, read_kitti_calib, read_kitti_label,
                    read_kitti_poses)
from .imdb import (ImageRecord, build_imdb, determine_ignores, pad_gt_batch,
                   balance_samples)
from .augment import mirror_labels, preprocess_images

__all__ = [
    "decompose_alpha", "read_kitti_calib", "read_kitti_label",
    "read_kitti_poses", "ImageRecord", "build_imdb", "determine_ignores",
    "pad_gt_batch", "balance_samples", "mirror_labels", "preprocess_images",
]
