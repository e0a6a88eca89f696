"""Per-stage TPU timing of the image front-end.

Times each front-end stage in isolation (jitted, donated where possible)
plus the full fused track_fn, on real rendered frames, so optimization
effort goes where the milliseconds are.  Run on the TPU:

    python scripts/profile_frontend.py [--frames 30]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import simulate_sequence, render_frame
from rvio_tpu.frontend.image import clahe, build_pyramid, scharr_gradients
from rvio_tpu.frontend.klt import klt_track
from rvio_tpu.frontend.detector import (shi_tomasi_response, grid_top_corners,
                                        corner_subpix, find_newer)
from rvio_tpu.frontend.tracker import make_tracker


def bench(fn, *args, reps=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    cfg = RVIOConfig()
    if args.no_pallas:
        object.__setattr__(cfg.tpu, "use_pallas", False)
    print(f"backend={jax.default_backend()} use_pallas={cfg.tpu.use_pallas}")

    sim = simulate_sequence(cfg, duration=3.0)
    img0 = jnp.asarray(render_frame(cfg, sim, 10))
    img1 = jnp.asarray(render_frame(cfg, sim, 11))
    N = cfg.tracker.num_features
    levels = cfg.tracker.klt_levels

    # --- isolated stages ---
    f_clahe = jax.jit(lambda im: clahe(im, 3.0, 5))
    print(f"clahe                {bench(f_clahe, img0, reps=args.reps):8.2f} ms")

    f_pyr = jax.jit(lambda im: tuple(build_pyramid(im, levels)))
    print(f"pyramid              {bench(f_pyr, img0, reps=args.reps):8.2f} ms")

    f_grad = jax.jit(lambda im: scharr_gradients(im))
    print(f"scharr (lvl0)        {bench(f_grad, img0, reps=args.reps):8.2f} ms")

    pyr0 = jax.tree.map(jnp.asarray, f_pyr(img0))
    pyr1 = jax.tree.map(jnp.asarray, f_pyr(img1))
    key = jax.random.PRNGKey(0)
    pts = jnp.stack([jax.random.uniform(key, (N,), minval=30, maxval=700),
                     jax.random.uniform(jax.random.fold_in(key, 1), (N,),
                                        minval=30, maxval=440)], axis=1)
    active = jnp.ones(N, bool)

    f_klt = jax.jit(lambda a, b, p, m: klt_track(
        list(a), list(b), p, m, win=cfg.tracker.klt_window,
        max_iters=cfg.tracker.klt_max_iters, eps=cfg.tracker.klt_eps,
        min_eig=cfg.tracker.klt_min_eig, use_pallas=cfg.tpu.use_pallas))
    print(f"klt ({levels + 1} lvls)         "
          f"{bench(f_klt, pyr0, pyr1, pts, active, reps=args.reps):8.2f} ms")

    f_resp = jax.jit(shi_tomasi_response)
    print(f"shi_tomasi_response  {bench(f_resp, img0, reps=args.reps):8.2f} ms")

    resp = f_resp(img0)
    cell2 = max(4, int(2 * cfg.tracker.min_distance))
    f_top = jax.jit(lambda r: grid_top_corners(r, cell2, N,
                                               cfg.tracker.quality_level))
    print(f"grid_top_corners     {bench(f_top, resp, reps=args.reps):8.2f} ms")

    cand, cvalid = f_top(resp)
    f_sub = jax.jit(lambda im, p: corner_subpix(
        im, p, win=int(cfg.tracker.min_distance) // 2,
        use_pallas=cfg.tpu.use_pallas))
    print(f"corner_subpix        {bench(f_sub, img0, cand, reps=args.reps):8.2f} ms")

    f_new = jax.jit(lambda c, cv, p, a: find_newer(
        c, cv, p, a, img_w=cfg.camera.width, img_h=cfg.camera.height,
        block_w=cfg.tracker.block_size_x, block_h=cfg.tracker.block_size_y,
        min_dist=cfg.tracker.min_distance, max_feats=N))
    print(f"find_newer           {bench(f_new, cand, cvalid, pts, active, reps=args.reps):8.2f} ms")

    # --- full fused frame ---
    init_fn, track_fn = make_tracker(cfg)
    ts, _ = init_fn(img0)
    jax.block_until_ready(ts.pos)
    K = cfg.tpu.imu_block
    imu_w = jnp.zeros((K, 3))
    imu_dt = jnp.full((K,), 0.005)
    imu_valid = jnp.arange(K) < 10
    out = track_fn(ts, img1, imu_w, imu_dt, imu_valid, key)
    jax.block_until_ready(out[0].pos)
    t0 = time.perf_counter()
    for i in range(args.reps):
        out = track_fn(ts, img1, imu_w, imu_dt, imu_valid, key)
    jax.block_until_ready(out[0].pos)
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"track_fn (full)      {ms:8.2f} ms   ({1e3 / ms:.1f} fps)")


if __name__ == "__main__":
    main()
