"""Evaluation harness: ATE/RPE metrics + synthetic world generator."""

from . import ate, synthetic
from .ate import ate_rmse, rpe

__all__ = ["ate", "synthetic", "ate_rmse", "rpe"]
