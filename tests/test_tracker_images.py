"""Image-level front-end test: the on-device tracker on rendered frames.

Renders synthetic imagery with checker-corner landmarks at known projected
positions, then runs the REAL front-end (CLAHE -> pyramid -> detection ->
KLT -> RANSAC -> lifecycle) and checks it detects, tracks, and emits
update batches consistent with the known geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                             TrackerConfig, TpuConfig)
from rvio_tpu.dataio.synthetic import (simulate_sequence, render_frame,
                                       project_landmarks)
from rvio_tpu.frontend.tracker import make_tracker
from rvio_tpu.runtime.driver import bundle_imu


@pytest.fixture(scope="module")
def tracked():
    cfg = RVIOConfig(
        imu=ImuConfig(rate_hz=100.0),
        camera=CameraConfig(fps=10.0, width=320, height=240, fx=200.0,
                            fy=200.0, cx=160.0, cy=120.0, k1=-0.05, k2=0.01,
                            p1=0.0, p2=0.0),
        tracker=TrackerConfig(num_features=40, max_tracking_length=8,
                              min_tracking_length=3, min_distance=12.0,
                              block_size_x=80, block_size_y=60),
        tpu=TpuConfig(imu_block=16))
    sim = simulate_sequence(cfg, duration=7.0, static_time=1.0, seed=5,
                            n_landmarks=300, motion_scale=0.6)
    init_fn, track_fn = make_tracker(cfg, jnp.float64)
    groups = bundle_imu(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t)

    k0 = 12  # start after motion begins
    ts, n0 = init_fn(jnp.asarray(render_frame(cfg, sim, k0)))
    states, batches, debugs = [ts], [], []
    key = jax.random.key(0)
    for k in range(k0 + 1, k0 + 13):
        img = jnp.asarray(render_frame(cfg, sim, k))
        w, a, dts = groups[k]
        K = cfg.tpu.imu_block
        pad = K - len(w)
        wj = jnp.asarray(np.pad(w, ((0, pad), (0, 0))))
        dj = jnp.asarray(np.pad(dts, (0, pad)))
        vj = jnp.asarray(np.arange(K) < len(w))
        key, sub = jax.random.split(key)
        ts, batch, dbg = track_fn(ts, img, wj, dj, vj, sub)
        states.append(ts)
        batches.append(batch)
        debugs.append(dbg)
    return cfg, sim, k0, states, batches, debugs, int(n0)


class TestTrackerOnImages:
    def test_initial_detection_finds_corners(self, tracked):
        cfg, sim, k0, states, batches, debugs, n0 = tracked
        assert n0 > 15  # plenty of rendered corners detected
        # detected positions coincide with projected landmarks (within 1.5px)
        px, vis = project_landmarks(cfg, sim, k0)
        pos = np.asarray(states[0].pos)[np.asarray(states[0].active)]
        d = np.linalg.norm(pos[:, None, :] - px[None, vis, :], axis=-1).min(1)
        assert np.median(d) < 1.5

    def test_tracking_retention(self, tracked):
        cfg, sim, k0, states, batches, debugs, n0 = tracked
        n_tracked = [int(d["n_tracked"]) for d in debugs]
        assert np.mean(n_tracked) > 10
        # refill keeps the pool alive
        n_active = [int(np.asarray(s.active).sum()) for s in states[1:]]
        assert min(n_active) > 10

    def test_tracked_positions_follow_geometry(self, tracked):
        cfg, sim, k0, states, batches, debugs, n0 = tracked
        # at the final frame, tracked features lie near projected landmarks
        kf = k0 + 12
        px, vis = project_landmarks(cfg, sim, kf)
        st = states[-1]
        act = np.asarray(st.active) & (np.asarray(st.length) >= 3)
        pos = np.asarray(st.pos)[act]
        d = np.linalg.norm(pos[:, None, :] - px[None, vis, :], axis=-1).min(1)
        assert np.median(d) < 2.0, f"median track drift {np.median(d):.2f} px"

    def test_update_batches_eventually_emitted(self, tracked):
        cfg, sim, k0, states, batches, debugs, n0 = tracked
        # after L frames some features reach max length (type 2) or get lost
        total_updates = sum(int(np.asarray(b.valid).sum()) for b in batches)
        assert total_updates > 0
        # histories grow up to the max and never beyond
        for s in states:
            assert int(np.asarray(s.length).max()) <= cfg.tracker.max_tracking_length

    def test_batch_measurements_match_groundtruth_projection(self, tracked):
        cfg, sim, k0, states, batches, debugs, n0 = tracked
        from rvio_tpu.frontend.undistort import undistort_normalize
        # take the last batch with valid features; its newest measurement for
        # type-2 features equals the undistorted projection of some landmark
        for k, b in reversed(list(enumerate(batches))):
            v = np.asarray(b.valid)
            if v.any():
                frame_idx = k0 + 1 + k
                tl = np.asarray(b.track_len)
                meas = np.asarray(b.meas)
                f = int(np.flatnonzero(v)[0])
                zlast = meas[f, tl[f] - 1]
                # Both types: the batch history ends at the PREVIOUS frame —
                # the current frame's measurement is appended only after
                # classification (Tracker.cc:317-335).
                kk = frame_idx - 1
                pxs, vis = project_landmarks(cfg, sim, kk)
                c = cfg.camera
                zn = np.asarray(undistort_normalize(
                    jnp.asarray(pxs[vis]), fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
                    k1=c.k1, k2=c.k2, p1=c.p1, p2=c.p2, k3=c.k3))
                d = np.linalg.norm(zn - zlast[None, :], axis=1).min()
                assert d < 0.02, f"batch measurement {d:.4f} from any landmark"
                break


def test_refill_lands_in_slot_zero(tracked):
    """Regression: the refill compaction must fill slot 0 like any other.

    A drop-mode scatter with default-0 destination indices raced duplicate
    writes at slot 0, leaving it permanently inactive (and the candidate
    silently discarded) whenever fewer candidates than free slots existed.
    """
    from rvio_tpu.frontend.tracker import TrackerState
    cfg, sim, k0, states, batches, debugs, n0 = tracked
    init_fn, track_fn = make_tracker(cfg, jnp.float64)
    ts = states[5]
    # deactivate slot 0 (and only slot 0): it must be refilled this frame
    ts0 = TrackerState(pos=ts.pos, hist=ts.hist,
                       length=ts.length.at[0].set(0),
                       active=ts.active.at[0].set(False),
                       pyramid=ts.pyramid)
    k = k0 + 6
    img = jnp.asarray(render_frame(cfg, sim, k))
    groups = bundle_imu(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t)
    w, a, dts = groups[k]
    K = cfg.tpu.imu_block
    pad = K - len(w)
    wj = jnp.asarray(np.pad(w, ((0, pad), (0, 0))))
    dj = jnp.asarray(np.pad(dts, (0, pad)))
    vj = jnp.asarray(np.arange(K) < len(w))
    nts, _b, dbg = track_fn(ts0, img, wj, dj, vj, jax.random.key(3))
    if int(dbg["n_new"]) >= 1:
        assert bool(nts.active[0]), "slot 0 was not refilled"
        assert int(nts.length[0]) == 1
        assert float(jnp.abs(nts.pos[0]).sum()) > 0.0


def test_rgb_input_matches_gray(tracked):
    """A 3-channel frame with equal channels must track exactly like its
    grayscale version (Camera.RGB parity: Tracker.cc:183-202 cvtColor)."""
    cfg, sim, k0, states, batches, debugs, n0 = tracked
    init_fn, _ = make_tracker(cfg, jnp.float64)
    gray = render_frame(cfg, sim, k0)
    rgb = np.repeat(gray[..., None], 3, axis=-1)
    ts_g, n_g = init_fn(jnp.asarray(gray))
    ts_c, n_c = init_fn(jnp.asarray(rgb))
    assert int(n_g) == int(n_c)
    # luma weights sum to 1.0 only up to fp rounding -> ~1e-7 px wiggle
    np.testing.assert_allclose(np.asarray(ts_c.pos), np.asarray(ts_g.pos),
                               atol=5e-3)
