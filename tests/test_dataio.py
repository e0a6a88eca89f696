"""Data IO tests: PNG codec, TUM format, EuRoC loader, simulator physics."""

import os

import numpy as np
import pytest

from rvio_tpu.config import RVIOConfig, ImuConfig, CameraConfig
from rvio_tpu.dataio.png import read_png_gray, write_png_gray
from rvio_tpu.dataio.tum import write_tum, read_tum
from rvio_tpu.dataio.euroc import load_euroc
from rvio_tpu.dataio.synthetic import simulate_sequence


class TestPng:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        write_png_gray(p, img)
        back = read_png_gray(p)
        np.testing.assert_array_equal(back, img)

    def test_reads_filtered_png(self, tmp_path):
        # encode with zlib level 9 + per-row filters via a second writer to
        # exercise the unfilter paths: emulate filter 2 (Up) manually
        import struct, zlib
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(8, 16), dtype=np.uint8)
        raw = b""
        prev = np.zeros(16, np.int32)
        for y in range(8):
            line = (img[y].astype(np.int32) - prev) % 256
            raw += b"\x02" + line.astype(np.uint8).tobytes()
            prev = img[y].astype(np.int32)
        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(ctype, payload):
            c = struct.pack(">I", len(payload)) + ctype + payload
            return c + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", 16, 8, 8, 0, 0, 0, 0)
        p = str(tmp_path / "f2.png")
        with open(p, "wb") as f:
            f.write(sig + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(raw))
                    + chunk(b"IEND", b""))
        np.testing.assert_array_equal(read_png_gray(p), img)


class TestTum:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        t = np.cumsum(rng.uniform(0.01, 0.1, 5))
        p = rng.normal(size=(5, 3))
        q = rng.normal(size=(5, 4))
        path = str(tmp_path / "traj.tum")
        write_tum(path, t, p, q)
        t2, p2, q2 = read_tum(path)
        np.testing.assert_allclose(t2, t, atol=1e-9)
        np.testing.assert_allclose(p2, p, atol=1e-9)
        np.testing.assert_allclose(q2, q, atol=1e-9)


class TestEuroc:
    def test_loads_asl_layout(self, tmp_path):
        mav = tmp_path / "mav0"
        (mav / "imu0").mkdir(parents=True)
        (mav / "cam0" / "data").mkdir(parents=True)
        with open(mav / "imu0" / "data.csv", "w") as f:
            f.write("#timestamp,w,w,w,a,a,a\n")
            for i in range(20):
                t = int(1e9 * (100.0 + i * 0.005))
                f.write(f"{t},0.01,0.02,0.03,0.1,0.2,9.8\n")
        with open(mav / "cam0" / "data.csv", "w") as f:
            f.write("#timestamp,filename\n")
            for i in range(2):
                t = int(1e9 * (100.0 + i * 0.05))
                f.write(f"{t},{t}.png\n")
                write_png_gray(str(mav / "cam0" / "data" / f"{t}.png"),
                               np.zeros((8, 8), np.uint8))
        seq = load_euroc(str(tmp_path))
        assert len(seq.imu_t) == 20
        assert len(seq.cam_t) == 2
        np.testing.assert_allclose(seq.imu_a[0], [0.1, 0.2, 9.8])
        # skip_s drops leading data
        seq2 = load_euroc(str(tmp_path), skip_s=0.05)
        assert len(seq2.cam_t) == 1


class TestSimulatorPhysics:
    def test_static_phase_measures_gravity(self):
        cfg = RVIOConfig(imu=ImuConfig(rate_hz=100.0),
                         camera=CameraConfig(fps=10.0))
        sim = simulate_sequence(cfg, duration=4.0, static_time=1.5, seed=0)
        early = sim.imu_t < 1.0
        np.testing.assert_allclose(sim.imu_w[early], 0, atol=1e-12)
        np.testing.assert_allclose(sim.imu_a[early],
                                   np.tile([0, 0, cfg.imu.gravity],
                                           (early.sum(), 1)), atol=1e-10)

    def test_imu_integrates_to_trajectory(self):
        """Dead-reckon the simulated IMU and compare against ground truth —
        proves measurement/kinematics consistency independent of the filter."""
        cfg = RVIOConfig(imu=ImuConfig(rate_hz=200.0),
                         camera=CameraConfig(fps=20.0))
        sim = simulate_sequence(cfg, duration=8.0, static_time=1.0, seed=1)
        G = cfg.imu.gravity
        from scipy.spatial.transform import Rotation as ScipyRot
        R = np.eye(3)   # world-from-body
        p = np.zeros(3)
        v = np.zeros(3)
        z = np.array([0, 0, 1.0])
        # integrate exactly up to the last frame time (compare same instant)
        k = len(sim.frame_t) - 1
        t_end = sim.frame_t[k]
        t_prev = 0.0
        for i, t in enumerate(sim.imu_t):
            if t > t_end + 1e-9:
                break
            dt = t - t_prev
            t_prev = t
            a_w = R @ sim.imu_a[i] - G * z
            p = p + v * dt + 0.5 * a_w * dt ** 2
            v = v + a_w * dt
            R = R @ ScipyRot.from_rotvec(sim.imu_w[i] * dt).as_matrix()
        err = np.linalg.norm(p - sim.gt_p[k])
        assert err < 0.05, f"dead-reckoning drift {err:.3f} m"

    def test_feature_tracks_are_consistent_projections(self):
        cfg = RVIOConfig(imu=ImuConfig(rate_hz=100.0),
                         camera=CameraConfig(fps=10.0))
        sim = simulate_sequence(cfg, duration=6.0, static_time=1.0, seed=2)
        # any type-2 feature's track length equals max length
        t2 = sim.feat_type2 & sim.feat_valid
        if t2.any():
            assert (sim.feat_len[t2] == cfg.tracker.max_tracking_length).all()
        # all valid tracks are at least min length... type-1 only
        v1 = sim.feat_valid & ~sim.feat_type2
        assert (sim.feat_len[v1] >= cfg.tracker.min_tracking_length).all()
