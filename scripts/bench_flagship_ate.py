"""Multi-seed flagship image-level accuracy benchmark (TPU).

Runs the FULL image pipeline (rendered 752x480 frames, 200 features,
window 15, 20 Hz camera / 200 Hz IMU with noise + bias offsets) for
>= 60 s over several seeds and prints an ATE table — the accuracy claim of
record standing in for real-EuRoC replay (reference: README.md:70-86),
which is unreachable in this environment.  Results are recorded in
BASELINE.md.

Usage: python scripts/bench_flagship_ate.py [--seeds 3] [--duration 60]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse, rpe_rmse
from rvio_tpu.runtime.image_driver import run_rendered_sequence_scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--timing-split", action="store_true")
    args = ap.parse_args()

    cfg = RVIOConfig()
    print(f"flagship config: {cfg.camera.width}x{cfg.camera.height}, "
          f"{cfg.tracker.num_features} features, "
          f"window {cfg.tracker.max_tracking_length}, "
          f"{args.duration:.0f} s")
    print(f"{'seed':>4} {'frames':>6} {'ATE m':>8} {'RPE m':>8} "
          f"{'span m':>7} {'n_good':>6} {'fe ms':>6} {'be ms':>6} {'wall s':>7}")
    ates = []
    for seed in range(args.seeds):
        sim = simulate_sequence(cfg, duration=args.duration, static_time=1.5,
                                ramp_time=5.0, seed=7 + seed,
                                n_landmarks=2000, motion_scale=0.8,
                                imu_noise=True)
        t0 = time.perf_counter()
        res = run_rendered_sequence_scan(cfg, sim, dtype=jnp.float32,
                                         chunk_size=32,
                                         timing_split=args.timing_split)
        wall = time.perf_counter() - t0
        idx = np.searchsorted(sim.frame_t, res.timestamps)
        gt = sim.gt_p[idx]
        ate = ate_rmse(res.positions, gt)
        rpe = rpe_rmse(res.positions, gt, delta=int(cfg.camera.fps))
        span = np.linalg.norm(gt.max(0) - gt.min(0))
        ates.append(ate)
        print(f"{7 + seed:>4} {len(res.timestamps):>6} {ate:>8.4f} "
              f"{rpe:>8.4f} {span:>7.2f} {res.n_good.mean():>6.1f} "
              f"{res.frontend_ms.mean():>6.2f} {res.backend_ms.mean():>6.2f} "
              f"{wall:>7.1f}")
    print(f"ATE mean {np.mean(ates):.4f} m, max {np.max(ates):.4f} m "
          f"over {args.seeds} seeds")


if __name__ == "__main__":
    main()
