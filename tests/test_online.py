"""Online streaming driver: InputBuffer wiring + seq-gap drop detection.

The reference consumes live ROS feeds with per-message seq numbers and logs
drops (reference: rvio_mono.cc:54-87); these tests stream a rendered
synthetic sequence through the same producer/consumer shape — threaded
pushes, time-aligned pops — and check (a) the streamed trajectory equals
the offline per-frame pipeline, (b) drops are detected and survived.
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                             TrackerConfig, TpuConfig, InitConfig)
from rvio_tpu.dataio.synthetic import simulate_sequence, render_frame
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.driver import bundle_imu
from rvio_tpu.runtime.image_driver import ImagePipeline
from rvio_tpu.runtime.online import OnlineDriver


def _mini_cfg():
    return RVIOConfig(
        imu=ImuConfig(rate_hz=100.0),
        camera=CameraConfig(fps=10.0, width=320, height=240, fx=200.0,
                            fy=200.0, cx=160.0, cy=120.0, k1=-0.05, k2=0.01,
                            p1=0.0, p2=0.0),
        tracker=TrackerConfig(num_features=48, max_tracking_length=8,
                              min_tracking_length=3, min_distance=12.0,
                              block_size_x=80, block_size_y=60),
        init=InitConfig(sigma_v0=0.1),
        tpu=TpuConfig(imu_block=16))


@pytest.mark.slow
def test_online_stream_matches_offline(tmp_path):
    cfg = _mini_cfg()
    sim = simulate_sequence(cfg, duration=6.0, static_time=1.0, ramp_time=1.5,
                            seed=6, n_landmarks=400, motion_scale=0.5)
    frames = [np.clip(render_frame(cfg, sim, k), 0, 255).astype(np.uint8)
              for k in range(len(sim.frame_t))]

    # offline per-frame pipeline (the baseline)
    pipe = ImagePipeline(cfg, dtype=jnp.float64)
    groups = bundle_imu(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t)
    off = []
    for k in range(len(sim.frame_t)):
        out = pipe.process(sim.frame_t[k], frames[k], *groups[k])
        if out is not None:
            off.append((sim.frame_t[k], np.asarray(out["p_Gk"])))

    # streamed: producer thread pushes in timestamp order with seq numbers
    drv = OnlineDriver(cfg, dtype=jnp.float64)
    done = threading.Event()

    def produce():
        events = ([("imu", t, i) for i, t in enumerate(sim.imu_t)]
                  + [("img", t, i) for i, t in enumerate(sim.frame_t)])
        events.sort(key=lambda e: e[1])
        for kind, t, i in events:
            if kind == "imu":
                drv.push_imu(t, sim.imu_w[i], sim.imu_a[i], seq=i)
            else:
                drv.push_image(t, frames[i], seq=i)
        done.set()

    th = threading.Thread(target=produce)
    th.start()
    drv.spin(stop_event=done)
    th.join()

    assert drv.drops == {"imu": 0, "image": 0}
    assert len(drv.poses) == len(off)
    for (t_s, p_s, _), (t_o, p_o) in zip(drv.poses, off):
        assert t_s == t_o
        np.testing.assert_allclose(p_s, p_o, atol=1e-9)


@pytest.mark.slow
def test_online_drop_detection_and_recovery():
    """Dropped image messages are counted (seq gap) and the filter keeps
    tracking through them, like the reference's degraded-feed behavior."""
    cfg = _mini_cfg()
    sim = simulate_sequence(cfg, duration=7.0, static_time=1.0, ramp_time=1.5,
                            seed=6, n_landmarks=400, motion_scale=0.5)
    drv = OnlineDriver(cfg, dtype=jnp.float64)
    dropped = {25, 26, 40}           # image frame indices never delivered
    events = ([("imu", t, i) for i, t in enumerate(sim.imu_t)]
              + [("img", t, i) for i, t in enumerate(sim.frame_t)])
    events.sort(key=lambda e: e[1])
    for kind, t, i in events:
        if kind == "imu":
            drv.push_imu(t, sim.imu_w[i], sim.imu_a[i], seq=i)
        elif i not in dropped:
            drv.push_image(t, np.clip(render_frame(cfg, sim, i), 0,
                                      255).astype(np.uint8), seq=i)
    while drv.spin_once() is not None or len(drv.buffer) > 0:
        pass
    assert drv.drops["image"] == 3
    assert drv.drops["imu"] == 0
    est_t = np.asarray([p[0] for p in drv.poses])
    est_p = np.asarray([p[1] for p in drv.poses])
    assert len(est_p) > 30
    idx = np.searchsorted(sim.frame_t, est_t)
    ate = ate_rmse(est_p, sim.gt_p[idx])
    assert ate < 0.25, f"ATE {ate:.3f} m after dropped frames"


@pytest.mark.slow
def test_pipelined_spin_matches_sequential():
    """spin_once_pipelined = same poses as spin_once, one frame later."""
    cfg = _mini_cfg()
    sim = simulate_sequence(cfg, duration=5.0, static_time=1.0, ramp_time=1.5,
                            seed=6, n_landmarks=400, motion_scale=0.5)
    frames = [np.clip(render_frame(cfg, sim, k), 0, 255).astype(np.uint8)
              for k in range(len(sim.frame_t))]

    def feed(drv, pipelined):
        imu_done = 0
        outs = []
        for k, t in enumerate(sim.frame_t):
            end = int(np.searchsorted(sim.imu_t, t, side="right"))
            for j in range(imu_done, end):
                drv.push_imu(sim.imu_t[j], sim.imu_w[j], sim.imu_a[j])
            imu_done = end
            drv.push_image(t, frames[k])
            got = (drv.spin_once_pipelined() if pipelined
                   else drv.spin_once())
            if got is not None:
                outs.append(got)
        if pipelined:
            last = drv.drain()
            if last is not None:
                outs.append(last)
        return outs

    seq = feed(OnlineDriver(cfg, dtype=jnp.float64), False)
    pipe = feed(OnlineDriver(cfg, dtype=jnp.float64), True)
    assert len(seq) == len(pipe) and len(seq) > 10
    for a, b in zip(seq, pipe):
        assert a["t"] == b["t"]
        np.testing.assert_allclose(a["p_Gk"], b["p_Gk"], atol=1e-12)
        np.testing.assert_allclose(a["q_kG"], b["q_kG"], atol=1e-12)
