"""Batched multi-sequence replay == per-sequence replay, bitwise.

The set replay (runtime/replay_set.py) advances B sequences in lockstep
through the vmapped image scan; each sequence's trajectory must equal the
single-sequence chunked driver's output for the same seed, including when
lengths differ (ok=False padding must not perturb shorter sequences).
"""

import numpy as np
import pytest

from rvio_tpu.config import (CameraConfig, ImuConfig, InitConfig, RVIOConfig,
                             TpuConfig, TrackerConfig)


def _mini_cfg():
    return RVIOConfig(
        imu=ImuConfig(rate_hz=100.0),
        camera=CameraConfig(fps=10.0, width=160, height=120, fx=100.0,
                            fy=100.0, cx=80.0, cy=60.0, k1=0.0, k2=0.0,
                            p1=0.0, p2=0.0),
        tracker=TrackerConfig(num_features=32, max_tracking_length=6,
                              min_tracking_length=3, min_distance=10.0,
                              block_size_x=40, block_size_y=30),
        init=InitConfig(sigma_v0=0.1),
        tpu=TpuConfig(imu_block=16))


def _mem_seq(cfg, duration, seed):
    from rvio_tpu.dataio.rosbag import BagSequence
    from rvio_tpu.dataio.synthetic import simulate_sequence, render_frame
    sim = simulate_sequence(cfg, duration=duration, static_time=1.0,
                            ramp_time=1.0, seed=seed, n_landmarks=400,
                            motion_scale=0.5)
    imgs = np.stack([np.clip(render_frame(cfg, sim, k), 0, 255)
                     for k in range(len(sim.frame_t))]).astype(np.uint8)
    return BagSequence(imu_t=sim.imu_t, imu_w=sim.imu_w, imu_a=sim.imu_a,
                       cam_t=sim.frame_t, images=imgs), sim


@pytest.mark.slow
def test_set_replay_matches_single_replay():
    import jax.numpy as jnp
    from rvio_tpu.runtime.image_driver import run_euroc_sequence_scan
    from rvio_tpu.runtime.replay_set import run_sequence_set

    cfg = _mini_cfg()
    # deliberately different lengths: seq 1 exhausts first and rides
    # ok=False padding for the rest of the batch
    seq_a, _ = _mem_seq(cfg, 6.0, seed=5)
    seq_b, _ = _mem_seq(cfg, 4.0, seed=9)

    batch = run_sequence_set(cfg, [seq_a, seq_b], dtype=jnp.float64,
                             chunk_size=8)
    assert len(batch) == 2
    for seq, res in zip([seq_a, seq_b], batch):
        single = run_euroc_sequence_scan(cfg, seq, dtype=jnp.float64,
                                         chunk_size=8)
        assert len(res.timestamps) == len(single.timestamps)
        np.testing.assert_allclose(res.timestamps, single.timestamps,
                                   atol=0.0)
        np.testing.assert_allclose(res.positions, single.positions,
                                   atol=1e-12)
        np.testing.assert_allclose(res.quaternions, single.quaternions,
                                   atol=1e-12)
        np.testing.assert_array_equal(res.n_good, single.n_good)


@pytest.mark.slow
def test_set_replay_accuracy():
    import jax.numpy as jnp
    from rvio_tpu.eval.ate import ate_rmse
    from rvio_tpu.runtime.replay_set import run_sequence_set

    cfg = _mini_cfg()
    pairs = [_mem_seq(cfg, 5.0, seed=s) for s in (5, 7)]
    batch = run_sequence_set(cfg, [s for s, _ in pairs], dtype=jnp.float64,
                             chunk_size=8)
    for (seq, sim), res in zip(pairs, batch):
        idx = np.searchsorted(sim.frame_t, res.timestamps)
        ate = ate_rmse(res.positions, sim.gt_p[idx])
        assert ate < 0.25, f"set-replay ATE {ate:.3f} m"
