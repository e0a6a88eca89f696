"""EuRoC-path integration test: ASL directory -> image pipeline -> ATE.

Synthesizes a miniature EuRoC dataset on disk (rendered PNG frames + IMU and
ground-truth CSVs in the ASL layout) and replays it through the production
dataset path — loader, (native or python) PNG decode, threaded prefetch,
tracker, filter — proving a reference user's workflow works end to end
without ROS.  Also checks the chunked on-device scan driver produces the
same trajectory as the per-frame pipeline.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                             TrackerConfig, TpuConfig)
from rvio_tpu.dataio.euroc import load_euroc
from rvio_tpu.dataio.png import write_png_gray
from rvio_tpu.dataio.synthetic import simulate_sequence, render_frame
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.image_driver import (make_batched_image_chunk_scan,
                                           make_image_chunk_scan,
                                           run_euroc_sequence,
                                           run_euroc_sequence_scan)


def _mini_cfg():
    return RVIOConfig(
        imu=ImuConfig(rate_hz=100.0),
        camera=CameraConfig(fps=10.0, width=320, height=240, fx=200.0,
                            fy=200.0, cx=160.0, cy=120.0, k1=-0.05, k2=0.01,
                            p1=0.0, p2=0.0),
        tracker=TrackerConfig(num_features=48, max_tracking_length=8,
                              min_tracking_length=3, min_distance=12.0,
                              block_size_x=80, block_size_y=60),
        tpu=TpuConfig(imu_block=16))


@pytest.fixture(scope="module")
def asl_dataset(tmp_path_factory):
    """Miniature EuRoC ASL directory rendered from the simulator."""
    tmp_path = tmp_path_factory.mktemp("euroc")
    cfg = _mini_cfg()
    sim = simulate_sequence(cfg, duration=8.0, static_time=1.0, ramp_time=1.5,
                            seed=9, n_landmarks=400, motion_scale=0.5)

    mav = tmp_path / "mav0"
    (mav / "imu0").mkdir(parents=True)
    (mav / "cam0" / "data").mkdir(parents=True)
    (mav / "state_groundtruth_estimate0").mkdir(parents=True)
    t0_ns = 1_400_000_000_000_000_000
    with open(mav / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for t, w, a in zip(sim.imu_t, sim.imu_w, sim.imu_a):
            f.write(f"{t0_ns + int(t * 1e9)},{w[0]},{w[1]},{w[2]},"
                    f"{a[0]},{a[1]},{a[2]}\n")
    with open(mav / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for k, t in enumerate(sim.frame_t):
            ts = t0_ns + int(t * 1e9)
            f.write(f"{ts},{ts}.png\n")
            img = np.clip(render_frame(cfg, sim, k), 0, 255).astype(np.uint8)
            write_png_gray(str(mav / "cam0" / "data" / f"{ts}.png"), img)
    with open(mav / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        for k, t in enumerate(sim.frame_t):
            p = sim.gt_p[k]
            f.write(f"{t0_ns + int(t * 1e9)},{p[0]},{p[1]},{p[2]},1,0,0,0\n")
    return str(tmp_path), cfg, sim


@pytest.mark.slow
def test_euroc_directory_replay(asl_dataset):
    path, cfg, sim = asl_dataset
    seq = load_euroc(path)
    assert len(seq.cam_files) == len(sim.frame_t)
    res = run_euroc_sequence(cfg, seq, dtype=jnp.float64)
    assert len(res.timestamps) > 40

    gi = np.clip(np.searchsorted(seq.gt_t, res.timestamps), 0,
                 len(seq.gt_t) - 1)
    ate = ate_rmse(res.positions, seq.gt_p[gi])
    span = np.linalg.norm(seq.gt_p.max(0) - seq.gt_p.min(0))
    assert span > 0.4
    assert ate < 0.25, f"EuRoC-path ATE {ate:.3f} m over {span:.2f} m span"


@pytest.mark.slow
def test_chunked_scan_matches_per_frame(asl_dataset):
    """The chunk-scan driver reproduces the per-frame pipeline trajectory."""
    path, cfg, sim = asl_dataset
    seq = load_euroc(path)
    res_a = run_euroc_sequence(cfg, seq, dtype=jnp.float64)
    res_b = run_euroc_sequence_scan(cfg, seq, dtype=jnp.float64,
                                    chunk_size=16)
    assert len(res_b.timestamps) == len(res_a.timestamps)
    np.testing.assert_allclose(res_b.timestamps, res_a.timestamps)
    # identical math and RNG chain -> trajectories agree tightly
    np.testing.assert_allclose(res_b.positions, res_a.positions,
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(res_b.quaternions, res_a.quaternions,
                               atol=1e-6, rtol=0)
    np.testing.assert_array_equal(res_b.n_good, res_a.n_good)


@pytest.mark.slow
def test_batched_chunk_scan_matches_single(asl_dataset):
    """Segment-batched pipeline == per-segment single scans (B independent
    filters in lockstep must not interact)."""
    import jax
    from rvio_tpu.dataio.euroc import load_euroc, load_image
    from rvio_tpu.frontend.tracker import make_tracker
    from rvio_tpu.runtime.driver import InitializationGate, bundle_imu

    path, cfg, sim = asl_dataset
    seq = load_euroc(path)
    dtype = jnp.float64
    K = cfg.tpu.imu_block
    T = 12

    groups = bundle_imu(seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t)
    gate = InitializationGate(cfg, dtype)
    state0 = None
    for k in range(len(seq.cam_t)):
        w, a, dts = groups[k]
        if len(w) < 2:
            continue
        state0 = gate.feed(w, a, dts)
        if state0 is not None:
            k0 = k
            break
    assert state0 is not None

    init_fn, _ = make_tracker(cfg, dtype)

    def build_segment(start):
        ts, _ = init_fn(jnp.asarray(load_image(seq.cam_files[start]), dtype))
        ks = list(range(start + 1, start + 1 + T))
        imgs = np.stack([load_image(seq.cam_files[k]) for k in ks])
        cw = np.zeros((T, K, 3)); ca = np.zeros((T, K, 3))
        cdt = np.zeros((T, K)); cv = np.zeros((T, K), bool)
        ok = np.zeros(T, bool)
        for i, k in enumerate(ks):
            w, a, dts = groups[k]
            m = min(len(w), K)
            cw[i, :m] = w[:m]; ca[i, :m] = a[:m]; cdt[i, :m] = dts[:m]
            cv[i, :m] = True; ok[i] = len(w) >= 2
        chunk = {"image": jnp.asarray(imgs),
                 "imu_w": jnp.asarray(cw, dtype),
                 "imu_a": jnp.asarray(ca, dtype),
                 "imu_dt": jnp.asarray(cdt, dtype),
                 "imu_valid": jnp.asarray(cv),
                 "ok": jnp.asarray(ok)}
        return ts, chunk

    starts = [k0, k0 + 5]
    segs = [build_segment(s) for s in starts]
    keys = [jax.random.key(7 + i) for i in range(len(starts))]

    single = make_image_chunk_scan(cfg, dtype)
    singles = [single((ts, state0, keys[i]), ch)[1]
               for i, (ts, ch) in enumerate(segs)]

    batched = make_batched_image_chunk_scan(cfg, dtype)
    bcarry = (jax.tree.map(lambda *x: jnp.stack(x), *[s[0] for s in segs]),
              jax.tree.map(lambda *x: jnp.stack(x), *([state0] * len(segs))),
              jnp.stack(keys))
    bchunk = jax.tree.map(lambda *x: jnp.stack(x), *[s[1] for s in segs])
    _, bouts = batched(bcarry, bchunk)

    for i in range(len(starts)):
        for name in ("p_Gk", "q_kG", "v_k"):
            np.testing.assert_allclose(np.asarray(bouts[name][i]),
                                       np.asarray(singles[i][name]),
                                       atol=1e-9, rtol=0, err_msg=name)
        np.testing.assert_array_equal(np.asarray(bouts["n_good"][i]),
                                      np.asarray(singles[i]["n_good"]))
