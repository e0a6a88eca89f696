"""Segment-batched image-pipeline scaling curve (VERDICT r3 #3).

Measures the aggregate images->poses throughput of
``make_batched_image_chunk_scan`` at B = 1..32 lockstep segments on one
chip, against the VPU-bound asymptote claimed in BASELINE.md (~1.5k fps
set by the CLAHE+KLT fraction).  Frames are device-resident (replay
shape); every timing ends in a scalar readback (honest sync through the
axon tunnel).

    BENCH_PIPELINE_BS="1 4 8 16 32" python scripts/bench_pipeline_scaling.py
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
from rvio_tpu.dataio.synthetic import render_frame, simulate_sequence
from rvio_tpu.frontend.tracker import make_tracker
from rvio_tpu.runtime.image_driver import (make_batched_image_chunk_scan,
                                           make_image_chunk_scan)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    if dev.platform == "cpu" and os.environ.get("ALLOW_CPU") != "1":
        raise SystemExit("refusing CPU fallback (another TPU job running?)")

    cfg = RVIOConfig()
    dtype = jnp.float32
    bs = [int(x) for x in os.environ.get(
        "BENCH_PIPELINE_BS", "1 4 8 16 32").split()]
    PB = 32          # frames per chunk
    nchunk = int(os.environ.get("BENCH_PIPELINE_CHUNKS", "3"))

    sim = simulate_sequence(cfg, duration=20.0, static_time=1.5,
                            ramp_time=5.0, seed=7, n_landmarks=2000,
                            motion_scale=0.8, meas_noise=0.001,
                            imu_noise=True)
    state0, bundles, idx0 = build_bundles(cfg, sim, dtype)
    init_fn, _ = make_tracker(cfg, dtype)
    img1 = jnp.asarray(render_frame(cfg, sim, idx0 + 5), dtype)
    ts0, _ = init_fn(img1)
    K = cfg.tpu.imu_block

    u8 = np.stack([np.clip(render_frame(cfg, sim, idx0 + 6 + k), 0, 255)
                   for k in range(PB * nchunk)]).astype(np.uint8)
    base_chunks = []
    for c in range(nchunk):
        base_chunks.append({
            "image": jnp.asarray(u8[c * PB:(c + 1) * PB]),
            "imu_w": jnp.zeros((PB, K, 3), dtype),
            "imu_a": jnp.tile(jnp.asarray([0., 0., cfg.imu.gravity], dtype),
                              (PB, K, 1)),
            "imu_dt": jnp.full((PB, K), 1.0 / cfg.imu.rate_hz, dtype),
            "imu_valid": jnp.tile(jnp.arange(K) < 10, (PB, 1)),
            "ok": jnp.ones(PB, bool)})

    for B in bs:
        if B == 1:
            scan = make_image_chunk_scan(cfg, dtype)
            carry0 = (ts0, jax.tree.map(jnp.copy, state0), jax.random.key(0))
            chunks = base_chunks
        else:
            scan = make_batched_image_chunk_scan(cfg, dtype)
            carry0 = (jax.tree.map(lambda x: jnp.stack([x] * B), ts0),
                      jax.tree.map(lambda x: jnp.stack([x] * B), state0),
                      jax.random.split(jax.random.key(0), B))
            chunks = [jax.tree.map(lambda x: jnp.stack([x] * B), ch)
                      for ch in base_chunks]

        def run(n=nchunk):
            carry = jax.tree.map(jnp.copy, carry0)
            out = None
            for ch in chunks[:n]:
                carry, out = scan(carry, ch)
            return float(jnp.sum(out["p_Gk"]))

        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        walls, w1 = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            run(1)
            w1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        # steady-state in-scan: chunks 2..n amortize the dispatch floor
        # (needs >= 2 chunks for the delta; fall back to wall at 1)
        if nchunk > 1:
            inscan_ms = (min(walls) - min(w1)) * 1e3 / (B * PB * (nchunk - 1))
        else:
            inscan_ms = wall * 1e3 / (B * PB)
        print(json.dumps({
            "B": B, "frames": B * PB * nchunk,
            "agg_fps_wall": round(B * PB * nchunk / wall, 1),
            "agg_fps_inscan": round(1e3 / inscan_ms, 1) if inscan_ms > 0 else None,
            "inscan_ms_per_frame": round(inscan_ms, 3),
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
