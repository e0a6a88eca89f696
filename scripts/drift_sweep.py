"""Drive-drift decomposition sweep: equilibrium vs random-walk terms.

VERDICT r4 weak #5 / next #7: the residual single-chip drive drift
(2.34 % at 30 min) is attributed to (a) the weakly-observable
yaw/gyro-bias equilibrium, whose magnitude scales with the ASSUMED noise
levels (sigma_wg, sigma_im), plus (b) genuine yaw random walk from the
actual gyro noise.  This sweep separates the terms by measurement:

- clean-IMU rows have NO random walk — their drift IS the equilibrium;
- scaling the configured sigma_wg down moves only the equilibrium
  (the simulator's true bias is CONSTANT, so the config's EuRoC
  random-walk density overstates this workload's bias walk — smaller
  sigma_wg is *more* honest to the sim while matching real hardware
  less);
- noisy rows at each scale show equilibrium + walk.

    DRIFT_SWEEP_MINUTES=10 python scripts/drift_sweep.py
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


def run_one(cfg, sim, dtype=jnp.float32):
    s0, b0, i0 = build_bundles(cfg, sim, dtype)
    run = make_sequence_scan(cfg)
    t0 = time.time()
    st, out = run(jax.tree.map(jnp.copy, s0), b0)
    est = np.asarray(out["p_Gk"])
    gt = sim.gt_p[i0:]
    wall = time.time() - t0
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    end_err = float(np.linalg.norm(est[-1] - gt[-1]))
    bg = np.asarray(st.bg)
    return dict(end_drift_pct=round(100 * end_err / path, 3),
                ate_m=round(float(ate_rmse(est, gt)), 3),
                path_m=round(path, 0),
                bg_err_deg_min=[round(float(x), 4) for x in
                                (bg - sim.bg) * 180 / np.pi * 60],
                n_good=round(float(np.asarray(out["n_good"]).mean()), 1),
                wall_s=round(wall, 1))


def main():
    minutes = float(os.environ.get("DRIFT_SWEEP_MINUTES", "10"))
    duration = minutes * 60.0
    base = RVIOConfig()
    dtype = jnp.float32
    v = np.array([5.2, 0.8, 0.0])
    nl = int(105 * np.linalg.norm(v) * duration)

    sims = {}
    for clean in (False, True):
        sims[clean] = simulate_sequence(
            base, duration=duration, static_time=1.5, ramp_time=5.0,
            seed=7, meas_noise=0.001, imu_noise=not clean,
            n_landmarks=nl, drift_velocity=v)

    rows = []
    for clean, wg_scale in [(False, 1.0), (False, 0.3), (False, 0.1),
                            (False, 0.03), (True, 1.0), (True, 0.1)]:
        cfg = base.replace(imu=dataclasses.replace(
            base.imu, sigma_wg=base.imu.sigma_wg * wg_scale))
        r = run_one(cfg, sims[clean], dtype)
        r.update(clean=clean, sigma_wg_scale=wg_scale, minutes=minutes)
        rows.append(r)
        print(json.dumps(r), flush=True)

    # decomposition summary: equilibrium(scale) from clean rows; walk =
    # noisy - clean at the same scale (in quadrature is not valid for a
    # systematic + random mix; report both raw)
    print("# clean rows measure the equilibrium term alone; "
          "noisy-minus-clean at matched scale bounds the random walk")


if __name__ == "__main__":
    main()
