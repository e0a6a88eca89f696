"""Initialization-gate tests: bias averaging under slow motion onset.

Round-3 finding: the reference averages EVERY pre-gate IMU sample into
the bias init (System.cc:217-230) while the per-frame motion check stays
quiet through a slow onset — a 5 s smoothstep ramp poisons the gyro-bias
init by ~0.008 rad/s (~7 deg/min of yaw drift; at 5 m/s that is 10%+ of
path length).  The freeze_bias_average onset detector (detrended
cumulative angle + retroactive trim, runtime/driver.py) must cut the
init error by an order of magnitude without changing WHEN the gate fires.
"""

import numpy as np
import pytest

from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.runtime.driver import InitializationGate, bundle_imu


def _run_gate(cfg, sim):
    groups = bundle_imu(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t)
    gate = InitializationGate(cfg)
    for k in range(len(sim.frame_t)):
        w, a, dts = groups[k]
        if len(w) < 2:
            continue
        st = gate.feed(w, a, dts)
        if st is not None:
            return k, st
    raise AssertionError("gate never fired")


class TestFreezeBiasAverage:
    def _sim(self, **kw):
        cfg = RVIOConfig()
        sim = simulate_sequence(cfg, duration=10.0, static_time=1.5,
                                ramp_time=5.0, seed=7, n_landmarks=500,
                                motion_scale=0.8, **kw)
        return cfg, sim

    def test_slow_onset_bias_init_clean(self):
        cfg, sim = self._sim(imu_noise=False)
        k_fire, st = _run_gate(cfg, sim)
        bg_err = np.linalg.norm(np.asarray(st.bg) - sim.bg)
        # without the freeze this measures ~0.011 (vector [-8e-3,4e-4,-7e-3])
        assert bg_err < 1e-3, f"bias init poisoned: {np.asarray(st.bg)}"

    def test_slow_onset_bias_init_noisy_with_true_bias(self):
        cfg, sim = self._sim(imu_noise=True)
        _, st = _run_gate(cfg, sim)
        bg_err = np.linalg.norm(np.asarray(st.bg) - sim.bg)
        # a true constant bias must NOT trip the detrended onset detector
        # early: the average still covers enough samples to beat 1e-3
        assert bg_err < 1.5e-3, f"{np.asarray(st.bg)} vs {sim.bg}"

    def test_fire_frame_unchanged_by_freeze(self):
        # freezing only changes the averages, never the firing decision
        cfg, sim = self._sim(imu_noise=True)
        k_on, _ = _run_gate(cfg, sim)
        cfg_off = cfg.replace(init=cfg.init.__class__(
            **{**cfg.init.__dict__, "freeze_bias_average": False}))
        k_off, st_off = _run_gate(cfg_off, sim)
        assert k_on == k_off
        # and strict-parity mode reproduces the reference's poisoning
        bg_err_off = np.linalg.norm(np.asarray(st_off.bg) - sim.bg)
        assert bg_err_off > 3e-3
