"""Robustness matrix: the filter must stay finite and accurate across
window sizes, compression modes, and dtypes on the same sequence."""

import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                             TrackerConfig, TpuConfig)
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.driver import SequenceDriver, batches_from_sim


def _cfg(max_len, compression):
    return RVIOConfig(
        imu=ImuConfig(rate_hz=100.0), camera=CameraConfig(fps=10.0),
        tracker=TrackerConfig(num_features=32, max_tracking_length=max_len,
                              min_tracking_length=3),
        tpu=TpuConfig(imu_block=16, compression=compression))


@pytest.mark.parametrize("max_len", [6, 10])
@pytest.mark.parametrize("compression", ["qr", "cholesky"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_matrix(max_len, compression, dtype):
    cfg = _cfg(max_len, compression)
    sim = simulate_sequence(cfg, duration=10.0, static_time=1.0,
                            ramp_time=1.5, seed=13, n_landmarks=600,
                            meas_noise=0.001, imu_noise=True)
    res = SequenceDriver(cfg, dtype=dtype).run(
        sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t, batches_from_sim(sim))
    assert np.isfinite(res.positions).all()
    idx = np.searchsorted(sim.frame_t, res.timestamps)
    ate = ate_rmse(res.positions, sim.gt_p[idx])
    assert ate < 0.3, (f"ATE {ate:.3f} m at L={max_len}, "
                       f"{compression}, {dtype.__name__}")
