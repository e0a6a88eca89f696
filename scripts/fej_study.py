"""A/B study: first-estimates Jacobians (tpu.fej) vs reference relinearization.

Runs the drive-class workload (the regime where the relinearization leak
compounds — BASELINE.md round 3: 7.5 % end drift at 30 min) and the bounded
flagship workload in both modes and prints one JSON line per run.

    FEJ_MINUTES=5 python scripts/fej_study.py          # drive A/B
    FEJ_WORKLOAD=flagship python scripts/fej_study.py  # bounded-workspace A/B
"""

import dataclasses
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
    minutes = float(os.environ.get("FEJ_MINUTES", "5"))
    workload = os.environ.get("FEJ_WORKLOAD", "drive")
    seed = int(os.environ.get("FEJ_SEED", "7"))
    imu_noise = os.environ.get("FEJ_CLEAN") != "1"
    duration = minutes * 60.0
    dtype = jnp.float32

    dev = jax.devices()[0]
    print(f"# device: {dev} workload={workload} minutes={minutes} "
          f"seed={seed} noise={imu_noise}", flush=True)

    base = RVIOConfig()
    sim_kw = dict(duration=duration, static_time=1.5, ramp_time=5.0,
                  seed=seed, meas_noise=0.001, imu_noise=imu_noise)
    if workload == "drive":
        v = np.array([5.2, 0.8, 0.0])
        sim_kw.update(n_landmarks=int(105 * np.linalg.norm(v) * duration),
                      drift_velocity=v)
    sim = simulate_sequence(base, **sim_kw)

    for fej in (False, True):
        cfg = base.replace(tpu=dataclasses.replace(base.tpu, fej=fej))
        s0, b0, i0 = build_bundles(cfg, sim, dtype)
        run = make_sequence_scan(cfg)
        t0 = time.perf_counter()
        st, out = run(jax.tree.map(jnp.copy, s0), b0)
        _ = float(jnp.sum(out["p_Gk"]))
        wall = time.perf_counter() - t0
        est = np.asarray(out["p_Gk"])
        gt = sim.gt_p[i0:]
        path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
        end_err = float(np.linalg.norm(est[-1] - gt[-1]))
        print(json.dumps({
            "fej": fej, "workload": workload, "minutes": minutes,
            "seed": seed, "imu_noise": imu_noise,
            "frames": int(est.shape[0]), "path_m": round(path, 1),
            "ate_m": round(ate_rmse(est, gt), 4),
            "end_err_m": round(end_err, 3),
            "end_drift_pct": round(100 * end_err / max(path, 1e-9), 3),
            "n_good_mean": round(float(np.asarray(out["n_good"]).mean()), 1),
            "wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
