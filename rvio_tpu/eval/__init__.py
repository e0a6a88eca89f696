"""Trajectory evaluation: ATE/RPE with Umeyama alignment."""

from rvio_tpu.eval.ate import umeyama_alignment, ate_rmse, rpe_rmse

__all__ = ["umeyama_alignment", "ate_rmse", "rpe_rmse"]
