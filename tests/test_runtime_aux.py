"""Tests for auxiliary runtime pieces: streaming InputBuffer, visualization."""

import os

import numpy as np
import pytest

from rvio_tpu.runtime.input_buffer import InputBuffer
from rvio_tpu.utils.visualize import (draw_tracks, draw_detections,
                                      save_debug_image, plot_trajectory_svg)


class TestInputBuffer:
    def test_pairs_image_with_imu(self):
        buf = InputBuffer()
        for i in range(10):
            buf.push_imu(0.005 * (i + 1), [0.1, 0, 0], [0, 0, 9.8])
        buf.push_image(0.05, "frame0")
        out = buf.get_measurements()
        assert out is not None
        t, img, w, a, dt = out
        assert img == "frame0" and t == 0.05
        assert len(w) == 10
        assert dt[0] == 0.0 and np.allclose(dt[1:], 0.005)

    def test_waits_for_imu_coverage(self):
        buf = InputBuffer()
        buf.push_image(0.05, "early")
        buf.push_imu(0.01, [0, 0, 0], [0, 0, 9.8])
        assert buf.get_measurements() is None  # imu doesn't cover image yet
        buf.push_imu(0.04, [0, 0, 0], [0, 0, 9.8])
        assert buf.get_measurements() is None  # still no sample past t_img
        buf.push_imu(0.06, [0, 0, 0], [0, 0, 9.8])
        out = buf.get_measurements()
        assert out is not None and len(out[2]) == 2  # the two samples <= t_img

    def test_out_of_order_input_sorted(self):
        buf = InputBuffer()
        buf.push_imu(0.02, [2, 0, 0], [0, 0, 9.8])
        buf.push_imu(0.01, [1, 0, 0], [0, 0, 9.8])
        buf.push_imu(0.03, [3, 0, 0], [0, 0, 9.8])
        buf.push_image(0.025, "f")
        t, img, w, a, dt = buf.get_measurements()
        np.testing.assert_allclose(w[:, 0], [1, 2])  # sorted, cut at t_img

    def test_time_offset(self):
        buf = InputBuffer()
        for i in range(10):
            buf.push_imu(0.01 * (i + 1), [i, 0, 0], [0, 0, 9.8])
        buf.push_image(0.05, "f")
        t, img, w, a, dt = buf.get_measurements(time_offset=0.03)
        assert len(w) == 8  # samples up to t_img + 0.03


class TestVisualize:
    def test_debug_images(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (60, 80))
        prev = rng.uniform(10, 70, (5, 2))
        new = prev + rng.normal(0, 2, (5, 2))
        inl = np.array([1, 1, 0, 1, 0], bool)
        out = draw_tracks(img, prev, new, inl)
        assert out.shape == img.shape
        p = str(tmp_path / "track.png")
        save_debug_image(p, out)
        assert os.path.getsize(p) > 100
        out2 = draw_detections(img, prev, new)
        save_debug_image(str(tmp_path / "newer.png"), out2)

    def test_trajectory_svg(self, tmp_path):
        t = np.linspace(0, 10, 100)
        est = np.stack([np.sin(t), np.cos(t), t * 0], 1)
        gt = est + 0.01
        lm = np.random.default_rng(1).uniform(-2, 2, (50, 3))
        p = str(tmp_path / "traj.svg")
        plot_trajectory_svg(p, est, gt, lm)
        content = open(p).read()
        assert content.startswith("<svg") and "polyline" in content


class TestPackedSequenceScan:
    def test_scan_matches_per_frame_step(self):
        """make_sequence_scan (packed per-frame I/O rows) == the jitted
        per-frame step applied sequentially.

        Pins the pack/unpack round trip: every bundle field must
        reconstruct exactly (floats pass through in the filter dtype;
        ints/bools are small integers, exact).  Tolerance is fp-tight,
        not bitwise — the scan body and the standalone step are separate
        XLA programs and may schedule f64 ops differently."""
        import jax
        import jax.numpy as jnp
        from rvio_tpu.config import (CameraConfig, ImuConfig, RVIOConfig,
                                     TpuConfig, TrackerConfig)
        from rvio_tpu.dataio.synthetic import simulate_sequence
        from rvio_tpu.filter.propagation import make_imu_block
        from rvio_tpu.filter.update import UpdateBatch
        from rvio_tpu.runtime.driver import (InitializationGate,
                                             batches_from_sim, bundle_imu)
        from rvio_tpu.runtime.step import (FrameBundle, make_filter_step,
                                           make_sequence_scan)

        cfg = RVIOConfig(
            imu=ImuConfig(rate_hz=100.0), camera=CameraConfig(fps=10.0),
            tracker=TrackerConfig(num_features=24, max_tracking_length=6,
                                  min_tracking_length=3),
            tpu=TpuConfig(imu_block=16))
        dtype = jnp.float64
        sim = simulate_sequence(cfg, duration=8.0, static_time=1.0,
                                ramp_time=1.0, seed=6, n_landmarks=300,
                                meas_noise=5e-4)
        groups = bundle_imu(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t)
        batches = batches_from_sim(sim)
        gate = InitializationGate(cfg, dtype)
        state = None
        bundles = []
        for k, (w, a, dts) in enumerate(groups):
            if len(w) < 2:
                continue
            if state is None:
                state = gate.feed(np.asarray(w), np.asarray(a),
                                  np.asarray(dts))
                continue
            b = batches[k]
            bundles.append(FrameBundle(
                imu=make_imu_block(w, a, dts, cfg.tpu.imu_block, dtype),
                batch=UpdateBatch(meas=jnp.asarray(b.meas, dtype),
                                  track_len=jnp.asarray(b.track_len,
                                                        jnp.int32),
                                  is_type2=jnp.asarray(b.is_type2, bool),
                                  valid=jnp.asarray(b.valid, bool))))
        assert state is not None and len(bundles) > 30

        step = make_filter_step(cfg, donate=False)
        st = state
        ps, ngs = [], []
        for bd in bundles:
            st, out = step(st, bd)
            ps.append(np.asarray(out["p_Gk"]))
            ngs.append(int(out["n_good"]))
        seq = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *bundles)
        run = make_sequence_scan(cfg)
        st2, outs = run(jax.tree.map(jnp.copy, state), seq)
        np.testing.assert_allclose(np.asarray(outs["p_Gk"]),
                                   np.stack(ps), rtol=0, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(outs["n_good"]),
                                      np.asarray(ngs))
        assert max(ngs) > 2  # updates actually fired
