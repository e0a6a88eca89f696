"""f32 vs f64 study: accuracy + covariance conditioning at long horizon.

SURVEY.md hard part 4: the reference runs all-double; the TPU build runs
f32 (with `highest` matmul precision) — does the 108x108 covariance stay
well-conditioned and the ATE hold over a long run?  This script runs the
SAME noisy synthetic sequence (flagship feature-level operating point)
in both dtypes and reports, over a >=5 min horizon:

- ATE / RPE per dtype and the f32-vs-f64 trajectory divergence,
- covariance health per dtype: min eigenvalue of the active block, max
  condition number, symmetry residual — sampled every N frames.

Runs on CPU (f64-exact reference available there).  Results go to
BASELINE.md.  Usage: python scripts/precision_study.py [--duration 300]
"""

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("XLA_FLAGS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse, rpe_rmse
from rvio_tpu.runtime.step import make_sequence_scan
from bench import build_bundles


def cov_health(P: np.ndarray, n_clones: int) -> tuple:
    """(min eig, max eig, #collapsed dirs, symmetry residual).

    A raw condition number of P is meaningless here: the gravity unit
    constraint plus the strong global-pose prior legitimately collapse a
    few variance directions toward zero in the robocentric form.  The
    meaningful health signals are PSD-ness (min eig bounded below by
    rounding), the count of collapsed (< 1e-15) directions staying small
    and stable, and exact symmetry."""
    d = 24 + 6 * n_clones
    Pa = P[:d, :d]
    w = np.linalg.eigvalsh(0.5 * (Pa + Pa.T))
    sym = np.abs(Pa - Pa.T).max()
    return w.min(), w.max(), int((w < 1e-15).sum()), sym


def run(cfg, sim, dtype):
    state0, bundles, idx0 = build_bundles(cfg, sim, dtype)
    scan = make_sequence_scan(cfg)
    st, out = scan(jax.tree.map(jnp.copy, state0), bundles)

    # re-run in chunks to sample P along the way
    from rvio_tpu.runtime.step import make_filter_step
    step = make_filter_step(cfg, donate=False)
    T = bundles.imu.w.shape[0]
    stride = max(T // 24, 1)
    health = []
    st2, _, _ = build_bundles(cfg, sim, dtype)
    for k in range(T):
        st2, o = step(st2, jax.tree.map(lambda x: x[k], bundles))
        if k % stride == 0 and k > 30:
            health.append(cov_health(np.asarray(st2.P, np.float64),
                                     int(st2.n_clones)))
    return np.asarray(out["p_Gk"], np.float64), idx0, np.asarray(health)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=300.0)
    args = ap.parse_args()

    cfg = RVIOConfig()  # flagship operating point (feature-level)
    sim = simulate_sequence(cfg, duration=args.duration, static_time=1.5,
                            ramp_time=5.0, seed=7, n_landmarks=2000,
                            motion_scale=0.8, meas_noise=0.001,
                            imu_noise=True)
    gt = None
    rows = {}
    for name, dtype in (("f64", jnp.float64), ("f32", jnp.float32)):
        p, idx0, health = run(cfg, sim, dtype)
        gt = sim.gt_p[idx0:]
        ate = ate_rmse(p, gt)
        rpe = rpe_rmse(p, gt, delta=int(cfg.camera.fps))
        rows[name] = (p, ate, rpe, health)
        print(f"{name}: ATE {ate:.4f} m  RPE(1s) {rpe:.4f} m  "
              f"minEig {health[:, 0].min():.3e}  "
              f"maxEig {health[:, 1].max():.3e}  "
              f"collapsedDirs {int(health[:, 2].max())}  "
              f"maxAsym {health[:, 3].max():.3e}")
    p64, p32 = rows["f64"][0], rows["f32"][0]
    d = np.linalg.norm(p64 - p32, axis=1)
    print(f"f32-vs-f64 trajectory divergence: mean {d.mean():.2e} m, "
          f"max {d.max():.2e} m over {len(d)} frames "
          f"({args.duration:.0f} s horizon)")


if __name__ == "__main__":
    main()
