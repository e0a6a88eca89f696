"""Estimation engines: IMU propagation and the batched MSCKF update."""

from rvio_tpu.filter.propagation import ImuBlock, propagate, make_imu_block
from rvio_tpu.filter.update import msckf_update, UpdateBatch

__all__ = ["ImuBlock", "propagate", "make_imu_block", "msckf_update",
           "UpdateBatch"]
