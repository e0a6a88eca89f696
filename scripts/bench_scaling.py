"""Scaling benchmark: per-chip segment-batch throughput + stitch overhead.

The multi-chip design (parallel/: seg x feat mesh) runs one independent
filter per sequence segment with ZERO inter-chip communication during
filtering; segments are joined afterwards by composition-chain stitching
(parallel/stitch.py).  Multi-host scaling efficiency is therefore

    eff(N) = t_chip(B) / (t_chip(B) + t_serial_share)

where t_chip(B) is the per-chip time to filter its B segments (measured
here on the real chip across B) and t_serial_share is the stitch +
gather cost amortized over the run (measured here; microseconds per
segment of host work on final poses only).

Single-chip hardware only is available in this environment, so this is
the honest decomposition: per-chip throughput curve (the workload every
chip in a slice would run) + the only serial term.  Multi-device
execution/collectives for the same program are validated on a virtual
8-device CPU mesh in tests/test_parallel.py and __graft_entry__'s
dryrun_multichip.

Prints one JSON line per batch size, then a summary line.
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

from rvio_tpu.config import RVIOConfig
from rvio_tpu.parallel.segment import stack_states
from rvio_tpu.parallel.stitch import stitch_segments
from rvio_tpu.runtime.step import make_batched_sequence_scan
from bench import build_bundles
from rvio_tpu.dataio.synthetic import simulate_sequence


def main():
    cfg = RVIOConfig()
    dtype = jnp.float32
    duration = float(os.environ.get("BENCH_DURATION_S", "30"))
    sim = simulate_sequence(cfg, duration=duration, static_time=1.5,
                            ramp_time=5.0, seed=7, n_landmarks=2000,
                            motion_scale=0.8, meas_noise=0.001,
                            imu_noise=True)
    state0, bundles, idx0 = build_bundles(cfg, sim, dtype)
    n_frames = int(bundles.imu.w.shape[0])

    run = make_batched_sequence_scan(cfg)
    results = []
    for B in (1, 2, 4, 8, 16, 32):
        bstates = stack_states([state0] * B)
        bbundles = jax.tree.map(lambda x: jnp.stack([x] * B, axis=0), bundles)
        st, out = run(bstates, bbundles)
        _ = float(jnp.sum(out["p_Gk"]))
        times = []
        for _i in range(3):
            bstates = stack_states([state0] * B)
            t0 = time.perf_counter()
            st, out = run(bstates, bbundles)
            _ = float(jnp.sum(out["p_Gk"]))
            times.append(time.perf_counter() - t0)
        t = min(times)
        fps = B * n_frames / t
        results.append((B, t, fps))
        print(json.dumps({"segments": B, "wall_s": round(t, 4),
                          "fps_total": round(fps, 1),
                          "fps_per_segment": round(fps / B, 1)}))

    # stitch overhead: chain 32 segments of this run's poses (host, numpy)
    B, t_run, _ = results[-1]
    p = np.asarray(out["p_Gk"])           # (B, T, 3)
    q = np.asarray(out["q_kG"])
    from rvio_tpu.core.quaternion import quat_to_rot
    R = np.asarray(jax.vmap(jax.vmap(quat_to_rot))(jnp.asarray(q)))
    t0 = time.perf_counter()
    stitched, offsets = stitch_segments([p[i] for i in range(B)],
                                        [R[i] for i in range(B)])
    t_stitch = time.perf_counter() - t0
    eff = t_run / (t_run + t_stitch)
    print(json.dumps({
        "metric": "projected_scaling_efficiency",
        "segments": B, "filter_wall_s": round(t_run, 4),
        "stitch_wall_s": round(t_stitch, 5),
        "value": round(eff, 4),
        "note": "no inter-chip comm during filtering; stitch is the only "
                "serial term", "stitched_frames": int(stitched.shape[0])}))


if __name__ == "__main__":
    main()
