"""Model zoo: DenseNet-121 dilated 3D RPN and variants.

Mirrors the reference's three model capabilities (models/*.py):
  * :mod:`rpn_3d` -- the decomp-alpha 3D RPN with optional acceptance-prob
    branch (reference models/densenet121_3d_dilate_decomp_alpha.py) and the
    uncertainty head variant (..._un.py, via ``predict_uncertainty=True``).
  * :mod:`kalman` -- the video model: shared backbone over stacked frames,
    pose network, differentiable Kalman tracker
    (reference models/densenet121_3d_dilate_decomp_alpha_un_kalman.py).
"""

from .densenet import DenseNetBackbone, DenseNetConfig
from .rpn_3d import RPN3D, RPNConfig, RPNOutputs

__all__ = [
    "DenseNetBackbone", "DenseNetConfig", "RPN3D", "RPNConfig", "RPNOutputs",
]
