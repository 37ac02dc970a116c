"""Ablation factory: one-knob variants of the shipped GrooMeD-NMS config.

Reference scripts/config/groumd_nms_{no_group, group_no_mask, sigmoidal,
soft_nms_0_1, soft_nms_0_5, cross_entropy, no_rankwise_AP, threshold_0_3,
threshold_0_5}.py -- verified by diff to flip exactly the knob named here.
"""

from .groomed_nms import config as base_config


def no_group():
    return base_config().replace(name="groomed_nms_no_group",
                                 diff_nms_group_boxes=False)


def group_no_mask():
    return base_config().replace(name="groomed_nms_group_no_mask",
                                 diff_nms_mask_group_boxes=False)


def sigmoidal():
    return base_config().replace(name="groomed_nms_sigmoidal",
                                 diff_nms_pruning_method="sigmoidal")


def soft_nms(temperature=0.1):
    return base_config().replace(
        name=f"groomed_nms_soft_nms_{str(temperature).replace('.', '_')}",
        diff_nms_pruning_method="soft_nms",
        diff_nms_temperature=temperature)


def cross_entropy():
    return base_config().replace(name="groomed_nms_cross_entropy",
                                 after_nms_loss_mode="classify")


def no_rankwise_ap():
    return base_config().replace(name="groomed_nms_no_rankwise_AP",
                                 rank_boxes_of_all_images_at_once=True)


def nms_threshold(thres):
    return base_config().replace(
        name=f"groomed_nms_threshold_{str(thres).replace('.', '_')}",
        nms_thres=thres)


def group_size(size):
    return base_config().replace(name=f"groomed_nms_group_{size}",
                                 diff_nms_group_size=size)


ALL = {
    "no_group": no_group,
    "group_no_mask": group_no_mask,
    "sigmoidal": sigmoidal,
    "soft_nms_0_1": lambda: soft_nms(0.1),
    "soft_nms_0_5": lambda: soft_nms(0.5),
    "cross_entropy": cross_entropy,
    "no_rankwise_AP": no_rankwise_ap,
    "threshold_0_3": lambda: nms_threshold(0.3),
    "threshold_0_5": lambda: nms_threshold(0.5),
}
