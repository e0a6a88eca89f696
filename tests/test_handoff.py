"""Warm-handoff segment parallelism: split-run == unsplit-run on a long run.

The reference is strictly sequential and can only initialize at rest
(reference: System.cc:182-249), so a long sequence cannot be split.  These
tests prove the TPU-native design can: a mid-sequence segment starts from a
closed-form visual-inertial bootstrap + warm-up, all segments filter in
PARALLEL on the virtual 8-device mesh, and the stitched trajectory matches
the unsplit sequential run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                             TrackerConfig, TpuConfig)
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.parallel import make_mesh
from rvio_tpu.parallel.handoff import (bootstrap_velocity_gravity,
                                       run_segments_warm, segment_plan,
                                       warm_initialize)
from rvio_tpu.parallel.stitch import fit_yaw_transform, prefix_product
from rvio_tpu.runtime.step import make_sequence_scan
from bench import build_bundles


def small_cfg():
    return RVIOConfig(
        imu=ImuConfig(rate_hz=100.0), camera=CameraConfig(fps=10.0),
        tracker=TrackerConfig(num_features=24, max_tracking_length=6,
                              min_tracking_length=3),
        tpu=TpuConfig(imu_block=16))


class TestBootstrap:
    def test_closed_form_velocity_gravity(self):
        """The linear VIO bootstrap recovers v0 and gravity mid-motion."""
        cfg = small_cfg()
        sim = simulate_sequence(cfg, duration=60.0, static_time=1.0, seed=5,
                                meas_noise=5e-4, imu_noise=True)
        _, bundles, idx0 = build_bundles(cfg, sim, jnp.float64)
        imu_w = np.asarray(bundles.imu.w)
        imu_a = np.asarray(bundles.imu.a)
        imu_dt = np.asarray(bundles.imu.dt)
        imu_valid = np.asarray(bundles.imu.valid)
        meas = np.asarray(bundles.batch.meas)
        tl = np.asarray(bundles.batch.track_len)
        vv = np.asarray(bundles.batch.valid)
        for w0 in (100, 294, 400):
            out = bootstrap_velocity_gravity(cfg, imu_w, imu_a, imu_dt,
                                             imu_valid, meas, tl, vv, w0, 30)
            assert out is not None
            v0, g0, diag = out
            # the self-estimated accuracy must cover the actual error
            # (pre-commit validation contract)
            assert diag["sigma_v"] < 0.5
            k0 = idx0 + w0 - 1
            R0 = sim.gt_R[k0]
            v_gt = R0.T @ sim.gt_v[k0]
            g_gt = R0.T @ np.array([0, 0, 1.0])
            assert np.linalg.norm(v0 - v_gt) < 0.3, f"w0={w0}"
            ang = np.degrees(np.arccos(np.clip(g0 @ g_gt, -1, 1)))
            assert ang < 2.0, f"w0={w0} gravity {ang:.2f} deg off"

    def test_warm_initialize_fallback(self):
        """Without bootstrap values, gravity comes from the accel direction."""
        cfg = small_cfg()
        st = warm_initialize(cfg, np.array([0.5, 0.0, 9.7]), jnp.float64)
        g = np.asarray(st.g)
        np.testing.assert_allclose(np.linalg.norm(g), 1.0, atol=1e-12)
        assert g[2] > 0.99
        assert float(st.P[15, 15]) > 0.5  # wide velocity prior

    def test_segment_plan_covers_sequence(self):
        idx, ok, B = segment_plan(100, 4, 10)
        assert B == 25
        covered = np.zeros(100, int)
        for s in range(4):
            body = ok[s] & (idx[s] >= s * B)
            for i in np.flatnonzero(body):
                covered[idx[s, i]] += 1
        # every frame belongs to exactly one segment body
        assert (covered == 1).all()
        # segment 0's (clipped) warm-up rows are masked out
        assert not ok[0, :10].any()


class TestWarmHandoff:
    @pytest.mark.slow
    def test_split_run_matches_unsplit_5min(self):
        """8 warm-started parallel segments over a >=5 min sequence stitch
        to the unsplit sequential trajectory (VERDICT r1 item 2)."""
        cfg = small_cfg()
        sim = simulate_sequence(cfg, duration=300.0, static_time=1.0, seed=5,
                                meas_noise=5e-4, imu_noise=True)
        state0, bundles, idx0 = build_bundles(cfg, sim, jnp.float64)
        gt = sim.gt_p[idx0:]

        run = make_sequence_scan(cfg)
        _, out = run(jax.tree.map(jnp.copy, state0), bundles)
        full_p = np.asarray(out["p_Gk"])
        ate_full = ate_rmse(full_p, gt)

        mesh = make_mesh(8, seg=8, feat=1)
        stitched, outs, info = run_segments_warm(
            cfg, state0, bundles, n_segments=8, warmup=150,
            dtype=jnp.float64, mesh=mesh)
        assert stitched.shape == full_p.shape
        ate_split = ate_rmse(stitched, gt)
        # split accuracy within a tight delta of the sequential run
        assert ate_split < ate_full + 0.05, (
            f"split {ate_split:.3f} vs unsplit {ate_full:.3f}")
        # and the split trajectory itself stays close to the unsplit one
        d = np.linalg.norm(stitched - full_p, axis=1)
        assert d.max() < 0.6, f"max split-vs-unsplit deviation {d.max():.3f} m"
        # every segment must have filtered (updates accepted), not dead-reckoned
        ng = np.asarray(outs["n_good"])
        ok = np.asarray(outs["ok"])
        for s in range(8):
            assert ng[s][ok[s]].mean() > 3.0, f"segment {s} never updated"
        # pre-commit bootstrap validation + the conservative warm noise
        # scale must make every warm start converge on its own — zero
        # sequential repairs (round-4 contract; the 30-min/16-way drive
        # also measures 0, BASELINE.md)
        assert info["repaired_segments"] == [], info["repaired_segments"]
        # the accepted bootstraps carry confident self-estimates
        for d in info["bootstrap_diags"][1:]:
            assert d is not None and "sigma_v" in d, d
            assert d["sigma_v"] < 0.5


class TestStitchPrimitives:
    def test_prefix_product_matches_sequential(self):
        rng = np.random.default_rng(3)
        Ts = []
        for _ in range(11):
            yaw = rng.uniform(-np.pi, np.pi)
            c, s = np.cos(yaw), np.sin(yaw)
            T = np.eye(4)
            T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
            T[:3, 3] = rng.normal(size=3)
            Ts.append(T)
        out = prefix_product(np.asarray(Ts))
        acc = np.eye(4)
        for i, T in enumerate(Ts):
            acc = acc @ T
            np.testing.assert_allclose(out[i], acc, atol=1e-12)

    def test_fit_yaw_transform_with_rotations(self):
        """Orientation-based 4-DOF fit recovers a known yaw+translation even
        when the overlap barely translates (where the position fit fails)."""
        rng = np.random.default_rng(0)
        yaw, t = 0.8, np.array([3.0, -1.0, 0.5])
        c, s = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        # nearly stationary overlap: positions cluster in ~1 cm
        cur_p = 0.005 * rng.normal(size=(20, 3))
        cur_R = np.stack([np.linalg.qr(np.eye(3) + 0.3 * rng.normal(size=(3, 3)))[0]
                          for _ in range(20)])
        prev_p = (Rz @ cur_p.T).T + t
        prev_R = Rz @ cur_R
        T = fit_yaw_transform(cur_p, prev_p, cur_R, prev_R)
        np.testing.assert_allclose(T[:3, :3], Rz, atol=1e-10)
        np.testing.assert_allclose(T[:3, 3], t, atol=0.02)

    def test_stitch_drift_8_segments(self):
        """>=8-segment chain: stitched trajectory drift stays bounded when
        each boundary fit sees small per-segment noise (VERDICT r1 item 8)."""
        from rvio_tpu.parallel.stitch import stitch_segments
        rng = np.random.default_rng(1)
        tt = np.linspace(0, 8 * np.pi, 1600)
        world = np.stack([10 * np.cos(tt / 4), 10 * np.sin(tt / 4),
                          0.5 * np.sin(tt)], axis=1)
        # world-from-body rotations: yaw following the tangent
        tang = np.gradient(world, axis=0)
        yaws = np.arctan2(tang[:, 1], tang[:, 0])
        Rws = np.stack([[[np.cos(y), -np.sin(y), 0],
                         [np.sin(y), np.cos(y), 0], [0, 0, 1]] for y in yaws])
        S, ov = 8, 40
        n = len(world) // S
        seg_p, seg_R = [], []
        for s in range(S):
            lo = max(s * n - ov, 0)
            hi = min((s + 1) * n, len(world))
            p = world[lo:hi] + 0.01 * rng.normal(size=(hi - lo, 3))
            R = Rws[lo:hi]
            # express in the segment's own frame: random yaw + origin
            yaw = rng.uniform(-np.pi, np.pi)
            c, si = np.cos(yaw), np.sin(yaw)
            Rz = np.array([[c, -si, 0], [si, c, 0], [0, 0, 1]])
            seg_p.append((Rz @ (p - p[0]).T).T)
            seg_R.append(np.einsum("ij,njk->nik", Rz, R))
        overlaps = [0] + [ov] * (S - 1)
        stitched, _ = stitch_segments(seg_p, seg_R, overlaps=overlaps[1:])
        assert len(stitched) == len(world)
        # align the stitched chain to world (segment 0's frame is arbitrary)
        err = ate_rmse(stitched, world)
        assert err < 0.25, f"8-segment stitch drift {err:.3f} m"
