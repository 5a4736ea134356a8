"""Square-root LM optimization engines: losses, dense LM, pose opt, Schur BA."""

from . import loss, lm, pose_opt
from .facade import Optimizer
from .lm import lm_optimize
from .loss import CHI2_2DOF, CHI2_3DOF

__all__ = [
    "loss", "lm", "pose_opt", "lm_optimize", "Optimizer",
    "CHI2_2DOF", "CHI2_3DOF",
]
