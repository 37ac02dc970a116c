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


def acceptance_classify(bins=2, boundary=(0.5,), sort_k=0):
    """Ordinal-classify acceptance training (the reference's unshipped
    acceptance_prob_mode='classify', lib/loss/rpn_3d.py:647-705).  NMS-in-
    loss is off because the reference model forces mode='regress' whenever
    the NMS is in the loss (models/densenet121_3d_dilate_decomp_alpha.py:
    92-94); the head emits per-classifier probabilities, so the scalar
    acceptance score does not exist for regression weighting or NMS
    rescoring.  lambda 0.3 is arbitrary (no shipped value exists; matches
    the differential tests)."""
    return base_config().replace(
        name="groomed_nms_acceptance_classify",
        use_nms_in_loss=False,
        after_nms_lambda=0.0,
        acceptance_prob_mode="classify",
        acceptance_prob_lambda=0.3,
        acceptance_prob_classify_bins=bins,
        bins_boundary=tuple(boundary),
        acceptance_prob_classify_sort_K=sort_k,
        use_acceptance_prob_in_regression_loss=False,
        weigh_acceptance_prob_regularization=False,
        bbox_un_dynamic=False,
        use_acceptance_prob_for_nms=False)


def acceptance_boxes(box_set="overlaps", thres=0.1):
    """Non-default acceptance-loss active set (the reference's unshipped
    boxes_for_acceptance_prob knob, lib/loss/rpn_3d.py:1005-1016):
    'overlaps' trains the acceptance head on every anchor whose max 2D
    IoU vs any GT exceeds ``thres``; 'all' trains on every anchor with
    the L1 weighted by the sampled cls weights."""
    return base_config().replace(
        name=f"groomed_nms_acceptance_{box_set}",
        boxes_for_acceptance_prob=box_set,
        acceptance_prob_overlap_thres=thres)


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
    "acceptance_classify": acceptance_classify,
    "acceptance_overlaps": lambda: acceptance_boxes("overlaps"),
    "acceptance_all": lambda: acceptance_boxes("all"),
}
