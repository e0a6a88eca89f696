"""Photometric-stress accuracy gates for the full image pipeline.

VERDICT r2 next-round #6: real EuRoC replay is unreachable here (no
network, no dataset — BASELINE.md), so the closest available stand-in is
the rendered pipeline under the photometric failure modes real footage
has: auto-exposure steps, vignetting, motion blur, and sensor-noise
bursts (rvio_tpu/dataio/synthetic.py PhotometricStress).  Each stress is
gated separately so a front-end robustness regression names its failure
mode; the combined test is the kitchen-sink certification.

The equalizer (CLAHE, reference Tracker.cc:183-202) is what makes the
exposure cases pass — the reference enables it for exactly this reason.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import (PhotometricStress, apply_photometric,
                                       simulate_sequence)
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.image_driver import run_rendered_sequence_scan


def _run(stress, duration=9.0, seed=7):
    cfg = RVIOConfig()  # flagship EuRoC operating point
    sim = simulate_sequence(cfg, duration=duration, static_time=1.5,
                            ramp_time=4.0, seed=seed, n_landmarks=2000,
                            motion_scale=0.8, imu_noise=True)
    res = run_rendered_sequence_scan(cfg, sim, dtype=jnp.float64,
                                     chunk_size=16, photometric=stress)
    idx = np.searchsorted(sim.frame_t, res.timestamps)
    return res, ate_rmse(res.positions, sim.gt_p[idx])


class TestApplyPhotometric:
    def test_exposure_step_changes_gain(self):
        img = np.full((40, 60), 100.0, np.float32)
        st = PhotometricStress(exposure_gains=(1.0, 0.5),
                               exposure_period_s=1.0)
        out0 = apply_photometric(img, 0, 0.0, st)
        out1 = apply_photometric(img, 20, 1.0, st)
        assert out0.mean() == pytest.approx(100.0)
        assert out1.mean() == pytest.approx(50.0)

    def test_vignette_darkens_corners_not_center(self):
        img = np.full((41, 61), 200.0, np.float32)
        st = PhotometricStress(vignette_strength=0.6)
        out = apply_photometric(img, 0, 0.0, st)
        assert out[20, 30] == pytest.approx(200.0, abs=2.0)
        assert out[0, 0] < 100.0

    def test_blur_spreads_point_along_flow(self):
        img = np.zeros((41, 61), np.float32)
        img[20, 30] = 255.0
        st = PhotometricStress(blur_px=6.0)
        out = apply_photometric(img, 1, 0.0, st, flow=np.array([6.0, 0.0]))
        row = out[20]
        assert (row > 1.0).sum() >= 4          # smeared horizontally
        assert out[:, 30].max() < 255.0
        assert out.sum() == pytest.approx(255.0, rel=0.05)  # energy kept

    def test_noise_burst_deterministic_and_periodic(self):
        img = np.full((30, 30), 128.0, np.float32)
        st = PhotometricStress(burst_period_s=0.5, burst_sigma=30.0, seed=3)
        a = apply_photometric(img, 10, 0.5, st, fps=20.0)
        b = apply_photometric(img, 10, 0.5, st, fps=20.0)
        np.testing.assert_array_equal(a, b)            # deterministic
        assert a.std() > 15.0                          # burst frame (k=10)
        quiet = apply_photometric(img, 11, 0.55, st, fps=20.0)
        assert quiet.std() < 1.0                       # off-burst clean


@pytest.mark.slow
class TestStressAccuracy:
    """Each stress individually, then combined, must hold the ATE gate.

    Clean-baseline reference: ~0.11 m on the 12 s flagship slice
    (tests/test_flagship_image_ate.py).  Stress gates are looser — the
    certification is 'still tracks, no blowup', not parity with clean.
    """

    def test_exposure_steps(self):
        st = PhotometricStress(exposure_gains=(1.0, 0.45, 1.6),
                               exposure_period_s=2.0)
        res, ate = _run(st)
        assert ate < 0.25, f"exposure-step ATE {ate:.3f} m"
        assert res.n_good.mean() > 4.0

    def test_vignetting(self):
        st = PhotometricStress(vignette_strength=0.5)
        res, ate = _run(st)
        assert ate < 0.25, f"vignette ATE {ate:.3f} m"
        assert res.n_good.mean() > 4.0

    def test_motion_blur(self):
        st = PhotometricStress(blur_px=5.0)
        res, ate = _run(st)
        assert ate < 0.30, f"motion-blur ATE {ate:.3f} m"
        assert res.n_good.mean() > 3.0

    def test_noise_bursts(self):
        st = PhotometricStress(noise_sigma=6.0, burst_period_s=1.5,
                               burst_sigma=25.0)
        res, ate = _run(st)
        assert ate < 0.30, f"noise-burst ATE {ate:.3f} m"
        assert res.n_good.mean() > 3.0

    def test_combined(self):
        st = PhotometricStress(exposure_gains=(1.0, 0.55, 1.5),
                               exposure_period_s=2.5,
                               vignette_strength=0.35, blur_px=3.0,
                               noise_sigma=4.0, burst_period_s=2.0,
                               burst_sigma=18.0)
        res, ate = _run(st)
        assert ate < 0.35, f"combined-stress ATE {ate:.3f} m"
        assert res.n_good.mean() > 3.0
