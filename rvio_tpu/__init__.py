"""rvio_tpu — a TPU-native robocentric visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas implementation of robocentric sliding-window
filtering VIO with the capabilities of rpng/R-VIO (IROS 2018 / IJRR 2022):

- ``core``     : JPL quaternion / SO(3) primitives, chi-square gating table.
- ``state``    : fixed-shape filter state (x, P) with masked clone window;
                 augmentation, marginalization, robocentric composition.
- ``filter``   : IMU propagation (closed-form integrals, lax.scan) and the
                 batched inverse-depth MSCKF update (vmap over features).
- ``frontend`` : image pipeline — CLAHE, pyramid, batched pyramidal KLT,
                 Shi-Tomasi detection with grid refill, undistortion,
                 gyro-aided 2-point RANSAC, on-device feature lifecycle.
- ``ops``      : Pallas TPU kernels for the hot image ops (+ XLA fallbacks).
- ``runtime``  : the jitted per-frame step, sequence driver, init gate,
                 checkpointing, timing instrumentation.
- ``dataio``   : EuRoC ASL loader, synthetic IMU/camera simulator,
                 TUM-format trajectory IO.
- ``parallel`` : device-mesh scaling — segment data-parallelism with
                 composition-chain stitching, feature-axis sharding.
- ``eval``     : ATE/RPE trajectory evaluation (Umeyama alignment).

Everything under jit uses static shapes: the feature budget N, the max track
length L, and the clone window M are compile-time constants (masked during
the window growth phase), mirroring the reference's steady-state dimensions
(reference: src/rvio/System.cc:71-72 — window = nMaxTrackingLength-1).
"""

import jax as _jax

# The filter's covariance algebra is precision-critical and tiny; TPU's
# single-pass bf16 matmul default silently diverges it.  Force full-f32
# matmuls unless the user already chose a precision.  Image-pipeline convs
# opt back into fast bf16 passes locally where it is safe.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from rvio_tpu.config import RVIOConfig, load_config

__all__ = ["RVIOConfig", "load_config"]
__version__ = "0.1.0"
