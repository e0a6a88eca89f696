"""Decompose drive-workload end drift: heading vs scale vs random walk.

The 30-min drive shows 7.5 % end drift (BASELINE round 3).  Before picking a
fix, identify the error channel:

- heading: angle between est and gt displacement directions over time
  (a yaw error rotates the remaining path -> drift ~ path * yaw);
- scale: ratio of est to gt distance-travelled (a scale error stretches the
  path -> drift ~ path * |1 - s|);
- bias: gyro-bias estimate error vs simulated truth (clean runs: any bias
  error is systematic).

    DIAG_MINUTES=5 DIAG_CLEAN=1 DIAG_FEJ=0 python scripts/drift_diagnose.py
"""

import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from bench import build_bundles
from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.runtime.step import make_sequence_scan


def main():
    minutes = float(os.environ.get("DIAG_MINUTES", "5"))
    clean = os.environ.get("DIAG_CLEAN") == "1"
    fej = os.environ.get("DIAG_FEJ", "0") == "1"
    seed = int(os.environ.get("DIAG_SEED", "7"))
    duration = minutes * 60.0

    base = RVIOConfig()
    cfg = base.replace(tpu=dataclasses.replace(base.tpu, fej=fej))
    v = np.array([5.2, 0.8, 0.0])
    sim = simulate_sequence(cfg, duration=duration, static_time=1.5,
                            ramp_time=5.0, seed=seed, meas_noise=0.001,
                            imu_noise=not clean,
                            n_landmarks=int(105 * np.linalg.norm(v) * duration),
                            drift_velocity=v)
    s0, b0, i0 = build_bundles(cfg, sim, jnp.float32)
    run = make_sequence_scan(cfg)
    st, out = run(jax.tree.map(jnp.copy, s0), b0)
    est = np.asarray(out["p_Gk"])
    gt = sim.gt_p[i0:]
    T = est.shape[0]

    path_cum_gt = np.concatenate(
        [[0], np.cumsum(np.linalg.norm(np.diff(gt, axis=0), axis=1))])
    path_cum_est = np.concatenate(
        [[0], np.cumsum(np.linalg.norm(np.diff(est, axis=0), axis=1))])
    path = path_cum_gt[-1]

    # heading error over time: angle between horizontal displacement
    # directions measured over a sliding 30 s baseline
    fps = cfg.camera.fps
    w = int(30 * fps)
    rows = []
    for k in range(w, T, w):
        de = est[k] - est[k - w]
        dg = gt[k] - gt[k - w]
        de2, dg2 = de[:2], dg[:2]
        cosang = np.dot(de2, dg2) / max(
            np.linalg.norm(de2) * np.linalg.norm(dg2), 1e-12)
        ang = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
        sgn = np.sign(np.cross(dg2, de2))
        scale = np.linalg.norm(de) / max(np.linalg.norm(dg), 1e-12)
        rows.append((k / fps, sgn * ang, scale))
    rows = np.array(rows)

    end_err = float(np.linalg.norm(est[-1] - gt[-1]))
    # error split: scale-induced = |path_est - path_gt| along track;
    # heading-induced = residual lateral deviation
    de_end = est[-1] - est[0]
    dg_end = gt[-1] - gt[0]
    along = np.dot(de_end, dg_end) / max(np.linalg.norm(dg_end), 1e-12)
    lateral = float(np.sqrt(max(np.linalg.norm(de_end) ** 2 - along ** 2, 0)))
    along_err = float(along - np.linalg.norm(dg_end))

    print(json.dumps({
        "minutes": minutes, "clean": clean, "fej": fej, "seed": seed,
        "path_m": round(float(path), 1),
        "end_err_m": round(end_err, 2),
        "end_drift_pct": round(100 * end_err / path, 3),
        "along_track_err_m": round(along_err, 2),
        "lateral_err_m": round(lateral, 2),
        "path_scale_est_over_gt": round(
            float(path_cum_est[-1] / path), 5),
        "final_heading_err_deg": round(float(rows[-1, 1]), 3),
        "final_window_scale": round(float(rows[-1, 2]), 5),
        "n_good_mean": round(float(np.asarray(out["n_good"]).mean()), 1),
    }), flush=True)
    print("# t[s]  heading_err[deg]  window_scale")
    for t, a, s in rows[:: max(1, len(rows) // 12)]:
        print(f"#  {t:7.0f}  {a:+8.3f}  {s:.5f}")


if __name__ == "__main__":
    main()
