"""Loss layer: master RPN 3D loss, AP-loss, RankNet, pose loss.

Capability match for the reference's lib/loss/ package, re-expressed as pure
jittable functions over padded fixed-shape batches.
"""

from .aploss import ap_loss
from .ranknet import ranknet_loss
from .rpn_3d import LossConfig, UncertaintyState, rpn_3d_loss

__all__ = ["ap_loss", "ranknet_loss", "LossConfig", "UncertaintyState",
           "rpn_3d_loss"]
