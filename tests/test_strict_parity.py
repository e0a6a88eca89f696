"""Strict-reference-parity end-to-end regression.

Four accuracy-relevant deviations from the reference default ON in this
framework (each individually justified, measured, and toggleable):

- ``init.sigma_v0``       (reference pins the init velocity variance to 0,
                           System.cc:154-169)
- ``init.freeze_bias_average``  (reference averages every pre-gate sample,
                           System.cc:217-249)
- ``init.forward_rotate_attitude``  (reference initializes attitude from
                           the running average, System.cc:119-140)
- ``tpu.adaptive_noise``  (reference pins sigma to the config forever,
                           Updater.cc:44)
- ``tpu.fej``             (off by default, matching the reference's
                           relinearize-every-frame chains, Updater.cc:118-141)

The reference-faithful mode (ALL deviations off) is the framework's
comparability claim — a user must be able to run the exact reference
behavior.  This test runs one flagship-math synthetic sequence end to end
in that mode and pins ATE + acceptance statistics, so parity mode cannot
silently rot while the (better) default mode keeps its own gates.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import (CameraConfig, ImuConfig, InitConfig, RVIOConfig,
                             TpuConfig, TrackerConfig)
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.driver import SequenceDriver, batches_from_sim


def strict_cfg():
    """Flagship filter math (window 15, 108x108 P) with every deviation
    from the reference switched off."""
    return RVIOConfig(
        imu=ImuConfig(rate_hz=200.0),
        camera=CameraConfig(fps=20.0),
        tracker=TrackerConfig(num_features=200, max_tracking_length=15,
                              min_tracking_length=3),
        init=InitConfig(sigma_v0=0.0, freeze_bias_average=False,
                        forward_rotate_attitude=False),
        tpu=TpuConfig(imu_block=16, fej=False, adaptive_noise=False),
    )


@pytest.fixture(scope="module")
def strict_run():
    # Sharp motion onset (0.6 s ramp): the reference's own operating
    # regime (EuRoC takeoff from standstill).  On gentle multi-second
    # ramps the reference-faithful init genuinely diverges (measured here:
    # ATE ~16 m on a 2 s smoothstep ramp — the zero velocity variance +
    # poisoned bias average defects the deviations fix); that is a
    # property of the reference's init, not a parity regression, so the
    # pinned workload keeps the onset sharp.
    cfg = strict_cfg()
    sim = simulate_sequence(cfg, duration=30.0, static_time=1.5,
                            ramp_time=0.6, rotation_lead=0.1, seed=7,
                            n_landmarks=600, meas_noise=0.001,
                            imu_noise=True)
    driver = SequenceDriver(cfg, dtype=jnp.float32)
    res = driver.run(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t,
                     batches_from_sim(sim))
    return cfg, sim, res


class TestStrictParityMode:
    def test_config_is_reference_faithful(self):
        cfg = strict_cfg()
        assert cfg.init.sigma_v0 == 0.0
        assert not cfg.init.freeze_bias_average
        assert not cfg.init.forward_rotate_attitude
        assert not cfg.tpu.adaptive_noise
        assert not cfg.tpu.fej

    def test_ate_bound(self, strict_run):
        """Parity mode is EXPECTED worse than the default mode (that is why
        the deviations exist); the bound is correspondingly loose, but pins
        that the mode still converges and tracks."""
        cfg, sim, res = strict_run
        assert len(res.timestamps) > 500
        idx = np.searchsorted(sim.frame_t, res.timestamps)
        ate = ate_rmse(res.positions, sim.gt_p[idx])
        # measured 0.059 m at pin time; 0.20 leaves room for fp drift
        assert ate < 0.20, f"strict-parity ATE {ate:.4f} m"

    def test_acceptance_statistics(self, strict_run):
        """Gate statistics in parity mode: with sigma pinned to the config
        (no adaptive whitening) the chi2 gate is WIDER than the default
        mode's, so nearly all usable features pass — the reference's
        operating regime.  Pins the accepted-update path stays live."""
        cfg, sim, res = strict_run
        warm = res.n_good[40:]
        # measured at pin time: mean 6.1, frac(n_good > 2) = 0.90
        assert warm.mean() > 4, f"n_good mean {warm.mean():.1f}"
        assert (warm > 2).mean() > 0.8  # updates fire on >80% of frames

    def test_default_mode_not_worse(self, strict_run):
        """The deviations exist to improve accuracy: the default config on
        the SAME sequence must not be worse than parity mode (guards the
        deviation set against regressions in either direction)."""
        cfg_s, sim, res_s = strict_run
        cfg_d = RVIOConfig(
            imu=cfg_s.imu, camera=cfg_s.camera, tracker=cfg_s.tracker,
            tpu=TpuConfig(imu_block=16),
        )
        res_d = SequenceDriver(cfg_d, dtype=jnp.float32).run(
            sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t,
            batches_from_sim(sim))
        idx_s = np.searchsorted(sim.frame_t, res_s.timestamps)
        idx_d = np.searchsorted(sim.frame_t, res_d.timestamps)
        ate_s = ate_rmse(res_s.positions, sim.gt_p[idx_s])
        ate_d = ate_rmse(res_d.positions, sim.gt_p[idx_d])
        assert ate_d <= ate_s * 1.05, \
            f"default {ate_d:.4f} m worse than strict parity {ate_s:.4f} m"
