"""Degraded-input handling: IMU gaps, sensor dropouts, feature droughts.

The reference's failure story is logging + fall-through (SURVEY.md §5:
frames with <2 IMU samples are skipped, too-few features skip the update).
These tests pin the same graceful degradation here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                             TrackerConfig, TpuConfig)
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.driver import (SequenceDriver, batches_from_sim,
                                     bundle_imu)


def _cfg():
    return RVIOConfig(
        imu=ImuConfig(rate_hz=100.0), camera=CameraConfig(fps=10.0),
        tracker=TrackerConfig(num_features=32, max_tracking_length=6,
                              min_tracking_length=3),
        tpu=TpuConfig(imu_block=16))


class TestImuGaps:
    def test_frames_without_imu_are_skipped(self):
        cfg = _cfg()
        sim = simulate_sequence(cfg, duration=8.0, static_time=1.0,
                                ramp_time=1.5, seed=21, meas_noise=5e-4)
        # delete a 0.35 s hole in the IMU stream mid-sequence
        keep = (sim.imu_t < 4.0) | (sim.imu_t > 4.35)
        res = SequenceDriver(cfg, dtype=jnp.float64).run(
            sim.imu_t[keep], sim.imu_w[keep], sim.imu_a[keep], sim.frame_t,
            batches_from_sim(sim))
        assert np.isfinite(res.positions).all()
        # the frames inside the hole produce no output rows
        in_hole = (res.timestamps > 4.0) & (res.timestamps < 4.3)
        assert in_hole.sum() <= 1
        idx = np.searchsorted(sim.frame_t, res.timestamps)
        # the first sample after the hole integrates dt~0.36 s as one
        # constant interval (reference semantics, rvio_mono.cc:102-107), so
        # some error is physical; the filter must stay bounded, not perfect
        assert ate_rmse(res.positions, sim.gt_p[idx]) < 1.0

    def test_bundle_imu_empty_groups(self):
        imu_t = np.array([0.01, 0.02, 0.2, 0.21])
        w = np.zeros((4, 3))
        a = np.tile([0, 0, 9.8], (4, 1))
        groups = bundle_imu(imu_t, w, a, np.array([0.05, 0.1, 0.25]))
        assert len(groups[0][0]) == 2      # two samples before 0.05
        assert len(groups[1][0]) == 0      # none newly available at 0.1
        assert len(groups[2][0]) == 2      # the late pair arrives by 0.25


class TestFeatureDrought:
    def test_long_vision_outage_dead_reckons(self):
        cfg = _cfg()
        sim = simulate_sequence(cfg, duration=10.0, static_time=1.0,
                                ramp_time=1.5, seed=22, meas_noise=5e-4)
        batches = batches_from_sim(sim)
        # knock out all features for 2 seconds mid-run
        for k, t in enumerate(sim.frame_t):
            if 4.0 < t < 6.0:
                b = batches[k]
                batches[k] = type(b)(meas=b.meas,
                                     track_len=np.zeros_like(b.track_len),
                                     is_type2=b.is_type2,
                                     valid=np.zeros_like(b.valid))
        res = SequenceDriver(cfg, dtype=jnp.float64).run(
            sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t, batches)
        assert np.isfinite(res.positions).all()
        # updates stop during the outage and resume after
        t = res.timestamps
        assert res.n_good[(t > 4.3) & (t < 6.0)].max(initial=0) == 0
        assert res.n_good[t > 7.0].mean() > 1
        idx = np.searchsorted(sim.frame_t, res.timestamps)
        ate = ate_rmse(res.positions, sim.gt_p[idx])
        assert ate < 1.0, f"post-outage ATE {ate:.3f} m"
