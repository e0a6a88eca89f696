"""Innovation-whitening adaptive measurement noise (tpu.adaptive_noise).

The reference pins the image-noise sigma to the config value forever
(reference: src/rvio/Updater.cc:44).  The adaptive estimator must
(a) converge toward the TRUE noise ratio (actual/assumed)^2 when the
config sigma is mis-specified, (b) stay put when the config is right,
(c) leave the state bitwise alone when disabled.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_bundles
from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                             TrackerConfig, TpuConfig)
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.runtime.step import make_sequence_scan


def cfg_with(adaptive: bool, sigma_px: float = None):
    cam = {} if sigma_px is None else {"sigma_px": sigma_px,
                                       "sigma_py": sigma_px}
    return RVIOConfig(
        imu=ImuConfig(rate_hz=100.0),
        camera=CameraConfig(fps=10.0, **cam),
        tracker=TrackerConfig(num_features=40, max_tracking_length=8,
                              min_tracking_length=3),
        tpu=TpuConfig(imu_block=16, compression="qr",
                      adaptive_noise=adaptive))


def run_scale(cfg, meas_noise, duration=30.0):
    sim = simulate_sequence(cfg, duration=duration, static_time=1.2, seed=3,
                            n_landmarks=800, meas_noise=meas_noise,
                            imu_noise=True)
    s0, b0, _ = build_bundles(cfg, sim, jnp.float64)
    run = make_sequence_scan(cfg)
    st, out = run(jax.tree.map(jnp.copy, s0), b0)
    return float(np.asarray(st.sigma2_scale)), out


class TestAdaptiveNoise:
    def test_converges_toward_true_ratio(self):
        # config sigma 3x the actual noise -> scale should head to ~1/9
        actual = 0.001
        cfg = cfg_with(True, sigma_px=3 * actual)
        scale, _ = run_scale(cfg, actual)
        assert scale < 0.5, scale            # moved well below 1
        assert scale > 0.02, scale           # but not collapsed to the floor

    def test_roughly_stationary_when_correct(self):
        # config sigma == actual noise -> scale stays near 1
        actual = 0.002
        cfg = cfg_with(True, sigma_px=actual)
        scale, _ = run_scale(cfg, actual)
        assert 0.4 < scale < 2.5, scale

    def test_disabled_leaves_scale_unity(self):
        cfg = cfg_with(False)
        scale, _ = run_scale(cfg, 0.001, duration=10.0)
        assert scale == 1.0

    def test_mass_rejection_recovery(self):
        # config sigma 3x BELOW the actual noise: the chi2 gate initially
        # rejects nearly everything (D ~ 9x its expectation), so no update
        # fires — the upward walk must engage WITHOUT updates (adaptation
        # gated solely on do_update would freeze the scale at 1 and the
        # filter would dead-reckon forever), climb toward ~9, and re-admit
        # features
        actual = 0.003
        cfg = cfg_with(True, sigma_px=actual / 3)
        scale, out = run_scale(cfg, actual)
        assert scale > 3.0, scale            # walked up from 1
        n_good = np.asarray(out["n_good"])
        q = len(n_good) // 4
        assert n_good[-q:].mean() > 3.0, n_good[-q:].mean()  # re-engaged
