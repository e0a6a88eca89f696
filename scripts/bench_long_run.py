"""9.8 km-class long-run benchmark (BASELINE.json configs[4]).

The reference's second demonstrated workload is a 9.8 km urban drive
(reference: README.md:52).  This script runs the equivalent synthetic
workload — a 30-60 min drive-style sequence (sustained cruise + excitation,
corridor landmarks, noisy IMU with bias offsets) at the flagship EuRoC
operating point — two ways on the attached TPU:

(a) single-chip endurance: the whole drive through the chunked
    whole-sequence scan, one filter instance (fps, ATE, end-drift %);
(b) warm-handoff split: the same drive split into N segments, each
    warm-started via the Martinelli-style linear bootstrap
    (parallel/handoff.py), all segments advancing in lockstep as one
    batched scan — the single-chip execution shape of the multi-host
    segment-parallel layout (segments never communicate mid-run).

Prints one JSON line per mode.  Results recorded in BASELINE.md.

    LONG_RUN_MINUTES=30 LONG_RUN_SEGMENTS=16 python scripts/bench_long_run.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from bench import build_bundles
from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.step import make_sequence_scan


def main():
    minutes = float(os.environ.get("LONG_RUN_MINUTES", "30"))
    n_seg = int(os.environ.get("LONG_RUN_SEGMENTS", "16"))
    duration = minutes * 60.0
    cfg = RVIOConfig()  # flagship EuRoC operating point
    dtype = jnp.float32

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    if dev.platform == "cpu" and os.environ.get("LONG_RUN_ALLOW_CPU") != "1":
        # the axon plugin silently falls back to CPU when the chip is held
        # by another process — a 30-min drive on 2 vCPUs is not a benchmark
        raise SystemExit("refusing to run on CPU fallback "
                         "(set LONG_RUN_ALLOW_CPU=1 to override)")

    # ~5.4 m/s cruise -> 9.7 km in 30 min; corridor landmark density
    # ~105/m keeps a few hundred candidates in range per frame
    v_drift = np.array([5.2, 0.8, 0.0])
    path_est = np.linalg.norm(v_drift) * duration
    n_lm = int(105 * path_est)

    t0 = time.perf_counter()
    sim = simulate_sequence(cfg, duration=duration, static_time=1.5,
                            ramp_time=5.0, seed=7, n_landmarks=n_lm,
                            meas_noise=0.001, imu_noise=True,
                            drift_velocity=v_drift)
    sim_s = time.perf_counter() - t0
    print(f"# sim built in {sim_s:.1f}s", flush=True)
    t0 = time.perf_counter()
    state0, bundles, idx0 = build_bundles(cfg, sim, dtype)
    print(f"# bundles built in {time.perf_counter()-t0:.1f}s", flush=True)
    T = int(bundles.imu.w.shape[0])
    gt = sim.gt_p[idx0:]
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))

    # ---- (a) single-chip endurance ----
    skip_endurance = os.environ.get("LONG_RUN_SKIP_ENDURANCE") == "1"
    run = make_sequence_scan(cfg)
    t0 = time.perf_counter()
    st, out = run(jax.tree.map(jnp.copy, state0), bundles)
    _ = float(jnp.sum(out["p_Gk"]))           # compile + honest sync
    print(f"# endurance compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    if not skip_endurance:
        t0 = time.perf_counter()
        st, out = run(jax.tree.map(jnp.copy, state0), bundles)
        _ = float(jnp.sum(out["p_Gk"]))
        wall = time.perf_counter() - t0
    else:
        wall = 1e9
    est_p = np.asarray(out["p_Gk"])
    ate = ate_rmse(est_p, gt)
    end_err = float(np.linalg.norm(est_p[-1] - gt[-1]))
    print(json.dumps({
        "mode": "endurance_single_chip", "minutes": minutes,
        "frames": T, "path_m": round(path, 1), "sim_build_s": round(sim_s, 1),
        "fps": round(T / wall, 1), "wall_s": round(wall, 2),
        "ate_m": round(ate, 3), "end_err_m": round(end_err, 3),
        "end_drift_pct": round(100 * end_err / path, 3),
        "n_good_mean": round(float(np.asarray(out["n_good"]).mean()), 1),
        "device": str(jax.devices()[0]).replace(" ", "_")}))

    # ---- (b) warm-handoff split ----
    from rvio_tpu.parallel.handoff import run_segments_warm
    warmup = int(15.0 * cfg.camera.fps)       # 15 s warm-up prefix
    t0 = time.perf_counter()
    stitched, outs, info = run_segments_warm(
        cfg, state0, bundles, n_segments=n_seg, warmup=warmup, dtype=dtype)
    _ = float(np.sum(stitched))
    wall_b = time.perf_counter() - t0
    ate_split = ate_rmse(stitched, gt)
    dev = np.linalg.norm(stitched - est_p, axis=1)
    print(json.dumps({
        "mode": f"warm_handoff_{n_seg}way", "minutes": minutes,
        "frames": T, "segments": n_seg, "warmup_frames": warmup,
        "fps_incl_compile": round(T / wall_b, 1), "wall_s": round(wall_b, 2),
        "ate_m": round(ate_split, 3),
        "ate_vs_unsplit_m": round(ate_split - ate, 4),
        "max_dev_vs_unsplit_m": round(float(dev.max()), 3),
        "repaired_segments": info["repaired_segments"],
        "bootstrap_sigma_v": [
            round(d["sigma_v"], 3) for d in info["bootstrap_diags"][1:]
            if d and "sigma_v" in d],
        "end_drift_pct": round(
            100 * float(np.linalg.norm(stitched[-1] - gt[-1])) / path, 3)}))


if __name__ == "__main__":
    main()
