"""rosbag v2.0 codec tests: round-trip, compression, drop counting, e2e.

The reference's only dataset input path is ``rosbag play`` with topic
remapping (reference: README.md:70-86); rvio_tpu reads the same .bag files
directly (rvio_tpu/dataio/rosbag.py).  No ROS tooling exists in this image,
so the tests round-trip through our own writer — which emits the documented
container layout (bag header padded to 4096, chunks, connection records).
"""

import numpy as np
import pytest

from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.rosbag import (BagSequence, bag_info, load_rosbag,
                                    parse_image, parse_imu, serialize_image,
                                    serialize_imu, write_rosbag)


def _make_messages(n_imu=40, n_img=5, h=24, w=32, imu_rate=200.0,
                   cam_rate=20.0, t0=100.0, seed=0):
    rng = np.random.default_rng(seed)
    msgs = []
    ws = rng.normal(size=(n_imu, 3))
    accs = rng.normal(size=(n_imu, 3)) + [0, 0, 9.81]
    for i in range(n_imu):
        msgs.append(("/imu0", b"sensor_msgs/Imu", t0 + i / imu_rate,
                     serialize_imu(i, t0 + i / imu_rate, ws[i], accs[i])))
    imgs = rng.integers(0, 256, size=(n_img, h, w), dtype=np.uint8)
    for k in range(n_img):
        msgs.append(("/cam0/image_raw", b"sensor_msgs/Image",
                     t0 + k / cam_rate,
                     serialize_image(k, t0 + k / cam_rate, imgs[k])))
    return msgs, ws, accs, imgs


class TestMessageSerialization:
    def test_imu_roundtrip(self):
        w = np.array([0.1, -0.2, 0.3])
        a = np.array([0.0, 9.81, -0.5])
        m = parse_imu(serialize_imu(7, 123.456789, w, a))
        assert m.seq == 7
        assert abs(m.stamp - 123.456789) < 1e-9
        np.testing.assert_allclose(m.w, w)
        np.testing.assert_allclose(m.a, a)

    def test_image_roundtrip_mono8(self):
        img = np.arange(6 * 8, dtype=np.uint8).reshape(6, 8)
        m = parse_image(serialize_image(3, 4.5, img))
        assert m.encoding == "mono8"
        np.testing.assert_array_equal(m.image, img)

    def test_image_rgb8_and_bgr8(self):
        img = np.random.default_rng(1).integers(
            0, 256, size=(4, 5, 3), dtype=np.uint8)
        m = parse_image(serialize_image(0, 1.0, img, b"rgb8"))
        np.testing.assert_array_equal(m.image, img)
        m2 = parse_image(serialize_image(0, 1.0, img, b"bgr8"))
        np.testing.assert_array_equal(m2.image, img[..., ::-1])


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
@pytest.mark.parametrize("chunks", [1, 3])
class TestBagRoundTrip:
    def test_roundtrip(self, tmp_path, compression, chunks):
        msgs, ws, accs, imgs = _make_messages()
        p = str(tmp_path / "t.bag")
        write_rosbag(p, msgs, compression=compression, chunk_count=chunks)

        info = bag_info(p)
        assert info.topics == {"/imu0": "sensor_msgs/Imu",
                               "/cam0/image_raw": "sensor_msgs/Image"}
        assert info.message_counts == {"/imu0": 40, "/cam0/image_raw": 5}

        seq = load_rosbag(p)
        assert isinstance(seq, BagSequence)
        np.testing.assert_allclose(seq.imu_w, ws)
        np.testing.assert_allclose(seq.imu_a, accs)
        np.testing.assert_array_equal(seq.images, imgs)
        assert seq.imu_drops == 0 and seq.image_drops == 0
        assert len(seq.cam_t) == 5
        # timestamps survive to ns precision
        assert abs(seq.imu_t[1] - seq.imu_t[0] - 1 / 200.0) < 1e-6


class TestBagSemantics:
    def test_drop_counting(self, tmp_path):
        # reference logs seq gaps as drops (rvio_mono.cc:56-59,84-87)
        msgs, *_ = _make_messages(n_imu=10, n_img=4)
        gappy = []
        for topic, mtype, t, data in msgs:
            seq_no = int.from_bytes(data[:4], "little")
            if topic == "/imu0" and seq_no in (3, 4):
                continue  # drop two imu msgs
            if topic == "/cam0/image_raw" and seq_no == 2:
                continue  # drop one image
            gappy.append((topic, mtype, t, data))
        p = str(tmp_path / "g.bag")
        write_rosbag(p, gappy)
        seq = load_rosbag(p)
        assert seq.imu_drops == 2
        assert seq.image_drops == 1

    def test_skip_and_max_frames(self, tmp_path):
        msgs, *_ = _make_messages(n_imu=200, n_img=10)
        p = str(tmp_path / "s.bag")
        write_rosbag(p, msgs)
        seq = load_rosbag(p, skip_s=0.2)
        assert len(seq.cam_t) == 6          # 10 frames at 20 Hz, skip 4
        assert seq.imu_t[0] >= seq.cam_t[0] - 1e-9 - 0.005
        seq2 = load_rosbag(p, max_frames=3)
        assert len(seq2.cam_t) == 3

    def test_wrong_topic_raises(self, tmp_path):
        msgs, *_ = _make_messages(n_imu=4, n_img=1)
        p = str(tmp_path / "w.bag")
        write_rosbag(p, msgs)
        with pytest.raises(ValueError, match="image topic"):
            load_rosbag(p, image_topic="/camera/image_raw")

    def test_unsorted_imu_sorted_on_load(self, tmp_path):
        msgs, *_ = _make_messages(n_imu=6, n_img=2)
        # swap two imu messages out of time order
        imu_idx = [i for i, m in enumerate(msgs) if m[0] == "/imu0"]
        msgs[imu_idx[1]], msgs[imu_idx[2]] = msgs[imu_idx[2]], msgs[imu_idx[1]]
        p = str(tmp_path / "u.bag")
        write_rosbag(p, msgs)
        seq = load_rosbag(p)
        assert np.all(np.diff(seq.imu_t) >= 0)

    def test_unsorted_images_sorted_on_load(self, tmp_path):
        # images out of receipt order must come back time-sorted too:
        # bundle_imu and the skip/ATE searchsorted calls assume monotone cam_t
        msgs, _, _, imgs = _make_messages(n_imu=40, n_img=4)
        img_idx = [i for i, m in enumerate(msgs)
                   if m[0] == "/cam0/image_raw"]
        msgs[img_idx[0]], msgs[img_idx[2]] = msgs[img_idx[2]], msgs[img_idx[0]]
        p = str(tmp_path / "ui.bag")
        write_rosbag(p, msgs)
        seq = load_rosbag(p)
        assert np.all(np.diff(seq.cam_t) > 0)
        np.testing.assert_array_equal(seq.images, imgs)


def _mini_cfg():
    from rvio_tpu.config import (CameraConfig, ImuConfig, InitConfig,
                                 TpuConfig, TrackerConfig)
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


def _write_rendered_bag(path, cfg, sim):
    from rvio_tpu.dataio.synthetic import render_frame
    msgs = []
    for i in range(len(sim.imu_t)):
        msgs.append(("/imu0", b"sensor_msgs/Imu", float(sim.imu_t[i]),
                     serialize_imu(i, float(sim.imu_t[i]),
                                   sim.imu_w[i], sim.imu_a[i])))
    for k in range(len(sim.frame_t)):
        u8 = np.clip(render_frame(cfg, sim, k), 0, 255).astype(np.uint8)
        msgs.append(("/cam0/image_raw", b"sensor_msgs/Image",
                     float(sim.frame_t[k]),
                     serialize_image(k, float(sim.frame_t[k]), u8)))
    msgs.sort(key=lambda m: m[2])
    write_rosbag(path, msgs, compression="bz2", chunk_count=4)


class TestBagEndToEnd:
    def test_bag_replay_matches_rendered_run(self, tmp_path):
        """Write rendered synthetic frames+IMU into a bag, replay via the
        bag path, and compare against the direct rendered-scan driver."""
        import jax.numpy as jnp
        from rvio_tpu.dataio.synthetic import simulate_sequence
        from rvio_tpu.runtime.image_driver import (run_euroc_sequence_scan,
                                                   run_rendered_sequence_scan)

        cfg = _mini_cfg()
        sim = simulate_sequence(cfg, duration=6.0, static_time=1.0,
                                ramp_time=1.0, seed=5, n_landmarks=400,
                                motion_scale=0.5)
        p = str(tmp_path / "sim.bag")
        _write_rendered_bag(p, cfg, sim)

        seq = load_rosbag(p)
        res_bag = run_euroc_sequence_scan(cfg, seq, dtype=jnp.float64,
                                          chunk_size=8)
        res_ref = run_rendered_sequence_scan(cfg, sim, dtype=jnp.float64,
                                             chunk_size=8)
        assert len(res_bag.timestamps) == len(res_ref.timestamps)
        # same frames, same math — bag path only differs by float64 timestamp
        # rounding in the serialized messages (ns precision)
        np.testing.assert_allclose(res_bag.positions, res_ref.positions,
                                   atol=1e-6)

    @pytest.mark.slow
    def test_play_rosbag_streams_into_online_driver(self, tmp_path):
        """play_rosbag == `rosbag play`: stream a bag into the OnlineDriver
        and match the offline per-frame replay of the same bag."""
        import threading
        import jax.numpy as jnp
        from rvio_tpu.dataio.rosbag import play_rosbag
        from rvio_tpu.dataio.synthetic import simulate_sequence
        from rvio_tpu.runtime.image_driver import run_euroc_sequence
        from rvio_tpu.runtime.online import OnlineDriver

        cfg = _mini_cfg()
        sim = simulate_sequence(cfg, duration=5.0, static_time=1.0,
                                ramp_time=1.0, seed=6, n_landmarks=400,
                                motion_scale=0.5)
        p = str(tmp_path / "sim.bag")
        _write_rendered_bag(p, cfg, sim)

        off = run_euroc_sequence(cfg, load_rosbag(p), dtype=jnp.float64)

        drv = OnlineDriver(cfg, dtype=jnp.float64)
        done = threading.Event()
        pushed = []

        def produce():
            pushed.append(play_rosbag(drv, p))
            done.set()

        th = threading.Thread(target=produce)
        th.start()
        drv.spin(stop_event=done)
        th.join()

        assert pushed[0] == len(sim.frame_t)
        assert drv.drops == {"imu": 0, "image": 0}
        assert len(drv.poses) == len(off.timestamps)
        np.testing.assert_allclose(
            np.asarray([p_ for _t, p_, _q in drv.poses]), off.positions,
            atol=1e-9)


class TestBagCli:
    def test_info_flag(self, tmp_path, capsys):
        from rvio_tpu.run import main
        msgs, *_ = _make_messages(n_imu=8, n_img=2)
        p = str(tmp_path / "i.bag")
        write_rosbag(p, msgs)
        assert main(["--info", p]) == 0
        out = capsys.readouterr().out
        assert "/imu0" in out and "sensor_msgs/Imu" in out
        assert "8 msgs" in out
        assert "duration" in out


class TestGroundTruthTopics:
    def test_vicon_transform_roundtrip_and_autodetect(self, tmp_path):
        from rvio_tpu.dataio.rosbag import (parse_transform_stamped,
                                            serialize_transform_stamped)
        rng = np.random.default_rng(3)
        msgs, *_ = _make_messages(n_imu=10, n_img=2)
        ps = rng.normal(size=(20, 3))
        qs = rng.normal(size=(20, 4))
        for i in range(20):
            t = 100.0 + i * 0.05
            msgs.append(("/vicon/firefly_sbx/firefly_sbx",
                         b"geometry_msgs/TransformStamped", t,
                         serialize_transform_stamped(i, t, ps[i], qs[i],
                                                     b"firefly_sbx")))
        msgs.sort(key=lambda m: m[2])
        p = str(tmp_path / "v.bag")
        write_rosbag(p, msgs)
        m = parse_transform_stamped(
            serialize_transform_stamped(1, 2.5, ps[0], qs[0], b"x"))
        np.testing.assert_allclose(m.p, ps[0])
        np.testing.assert_allclose(m.q, qs[0])

        seq = load_rosbag(p)          # gt_topic="auto"
        assert seq.gt_t is not None and len(seq.gt_t) == 20
        np.testing.assert_allclose(seq.gt_p, ps)
        np.testing.assert_allclose(seq.gt_q, qs)
        assert load_rosbag(p, gt_topic=None).gt_t is None

    def test_leica_point_gt_and_skip(self, tmp_path):
        from rvio_tpu.dataio.rosbag import serialize_point_stamped
        msgs, *_ = _make_messages(n_imu=100, n_img=6)
        for i in range(40):
            t = 100.0 + i * 0.02
            msgs.append(("/leica/position", b"geometry_msgs/PointStamped", t,
                         serialize_point_stamped(i, t, [i * 0.1, 0.0, 1.0])))
        msgs.sort(key=lambda m: m[2])
        p = str(tmp_path / "l.bag")
        write_rosbag(p, msgs, compression="bz2")
        seq = load_rosbag(p)
        assert seq.gt_q is None and len(seq.gt_t) == 40
        seq2 = load_rosbag(p, skip_s=0.2)
        assert seq2.gt_t[0] >= seq2.cam_t[0] - 1e-9
        assert len(seq2.gt_t) < 40


class TestEvalCli:
    def test_eval_tum_pair(self, tmp_path, capsys):
        from rvio_tpu.dataio.tum import write_tum
        from rvio_tpu.eval.__main__ import main as eval_main
        rng = np.random.default_rng(4)
        t = np.arange(50) * 0.05
        gt = np.cumsum(rng.normal(size=(50, 3)) * 0.01, axis=0)
        q = np.tile([0.0, 0.0, 0.0, 1.0], (50, 1))
        # estimate = gt under a rigid transform + small noise
        Rz = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        est = (Rz @ gt.T).T + [1.0, 2.0, 3.0] + rng.normal(size=(50, 3)) * 1e-4
        write_tum(str(tmp_path / "gt.tum"), t, gt, q)
        write_tum(str(tmp_path / "est.tum"), t, est, q)
        assert eval_main([str(tmp_path / "est.tum"),
                          str(tmp_path / "gt.tum")]) == 0
        out = capsys.readouterr().out
        ate = float(out.split("ATE RMSE: ")[1].split(" ")[0])
        assert ate < 1e-3     # alignment removes the rigid transform


class TestTruncatedBags:
    """Recorder-crash recovery: a bag cut mid-write must load cleanly with
    every message before the cut (rosbag's reindex semantics), not raise."""

    @pytest.mark.parametrize("frac", [0.35, 0.6, 0.97])
    def test_truncated_bag_loads_prefix(self, tmp_path, frac):
        msgs, ws, accs, imgs = _make_messages(n_imu=400, n_img=40)
        msgs.sort(key=lambda m: m[2])
        p = str(tmp_path / "full.bag")
        write_rosbag(p, msgs, chunk_count=8)
        blob = open(p, "rb").read()
        full = load_rosbag(p)
        pt = str(tmp_path / "cut.bag")
        with open(pt, "wb") as f:
            f.write(blob[:int(len(blob) * frac)])
        seq = load_rosbag(pt)
        # a clean prefix: fewer (or equal) messages, all matching the full bag
        assert 2 <= len(seq.imu_t) <= len(full.imu_t)
        assert 1 <= len(seq.cam_t) <= len(full.cam_t)
        n = len(seq.imu_t)
        np.testing.assert_allclose(seq.imu_w, full.imu_w[:n])
        np.testing.assert_array_equal(seq.images,
                                      full.images[:len(seq.cam_t)])

    def test_truncated_compressed_chunk(self, tmp_path):
        msgs, *_ = _make_messages(n_imu=400, n_img=40)
        msgs.sort(key=lambda m: m[2])
        p = str(tmp_path / "full.bag")
        write_rosbag(p, msgs, compression="bz2", chunk_count=8)
        blob = open(p, "rb").read()
        pt = str(tmp_path / "cut.bag")
        # cut INSIDE the final chunk's compressed payload
        with open(pt, "wb") as f:
            f.write(blob[:int(len(blob) * 0.85)])
        seq = load_rosbag(pt)
        assert len(seq.imu_t) >= 2 and len(seq.cam_t) >= 1


class TestCheckpointResume:
    def test_resume_continues_exact_trajectory(self, tmp_path):
        """run --save-checkpoint at the half-way point, then --resume: the
        two halves concatenate to the uninterrupted run's exact trajectory
        (filter + tracker + RNG restored; something the reference cannot
        do at all, System.cc:83-88)."""
        import jax.numpy as jnp
        from rvio_tpu.dataio.synthetic import simulate_sequence
        from rvio_tpu.runtime.image_driver import run_euroc_sequence_scan

        cfg = _mini_cfg()
        sim = simulate_sequence(cfg, duration=7.0, static_time=1.0,
                                ramp_time=1.0, seed=5, n_landmarks=400,
                                motion_scale=0.5)
        p = str(tmp_path / "sim.bag")
        _write_rendered_bag(p, cfg, sim)
        seq = load_rosbag(p)

        full = run_euroc_sequence_scan(cfg, seq, dtype=jnp.float64,
                                       chunk_size=8)
        n_half = len(seq.cam_t) // 2
        ck = str(tmp_path / "session.npz")
        first = run_euroc_sequence_scan(cfg, seq, dtype=jnp.float64,
                                        chunk_size=8, max_frames=n_half,
                                        checkpoint_path=ck)
        second = run_euroc_sequence_scan(cfg, seq, dtype=jnp.float64,
                                         chunk_size=8, resume_from=ck)
        ts = np.concatenate([first.timestamps, second.timestamps])
        ps = np.concatenate([first.positions, second.positions])
        assert len(second.timestamps) > 5
        np.testing.assert_array_equal(ts, full.timestamps)
        np.testing.assert_allclose(ps, full.positions, rtol=0, atol=1e-12)
