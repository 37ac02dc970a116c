"""Longer trainval -> test-server run (reference groumd_nms_full_train_2.py):
100k iters warm-started from a 160k-iter warmup, explicit GrooMeD knobs
(linear pruning, grouped+masked, group size 100) -- the values the base
config already defaults to."""

from .groomed_nms_full_train import config as base


def config():
    return base().replace(
        name="groomed_nms_full_train_2",
        max_iter=100000,
        pretrained="output/kitti_3d_warmup_full_train_2",
        diff_nms_pruning_method="linear",
        diff_nms_valid_box_prob_threshold=0.3,
        diff_nms_group_boxes=True,
        diff_nms_mask_group_boxes=True,
        diff_nms_group_size=100,
        best_target_box_beta=0.3,
    )
