"""Visual front-end: undistortion, KLT tracking, detection, RANSAC, lifecycle."""

from rvio_tpu.frontend.undistort import undistort_normalize
from rvio_tpu.frontend.ransac import gyro_ransac, integrate_gyro_rotation

__all__ = ["undistort_normalize", "gyro_ransac", "integrate_gyro_rotation"]
