"""In-scan stage ablation of the fused images->poses pipeline.

Stubs ONE stage of the fused tracker+filter chunk scan at a time
(monkeypatching the module globals the tracker/step close over), measures
the steady-state in-scan ms/frame with the 1-vs-9-dispatch delta method,
and reports each stage's in-context cost as (full - stubbed).

Isolated kernel timings undercount (stages overlap/fuse differently in
context) — this is the method that found the round-2 cost structure.
Each variant is a fresh XLA compile (~2-7 min via the remote compiler);
expect ~30-45 min total cold.

Run: python scripts/ablate_inscan.py [--stages clahe,klt,...]
"""

import argparse
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

PB = 32


def build_inputs():
    from bench import build_bundles
    from rvio_tpu.config import RVIOConfig
    from rvio_tpu.dataio.synthetic import render_frame, simulate_sequence
    from rvio_tpu.frontend.tracker import make_tracker

    cfg = RVIOConfig()
    dtype = jnp.float32
    sim = simulate_sequence(cfg, duration=12.0, static_time=1.5,
                            ramp_time=5.0, seed=7, n_landmarks=2000,
                            motion_scale=0.8, meas_noise=0.001,
                            imu_noise=True)
    state0, bundles, idx0 = build_bundles(cfg, sim, dtype)
    init_fn, _ = make_tracker(cfg, dtype)
    img1 = jnp.asarray(render_frame(cfg, sim, idx0 + 5), dtype)
    ts0, _ = init_fn(img1)
    K = cfg.tpu.imu_block
    u8 = np.stack([np.clip(render_frame(cfg, sim, idx0 + 6 + k), 0, 255)
                   for k in range(PB)]).astype(np.uint8)
    chunk = {"image": jnp.asarray(u8),
             "imu_w": jnp.zeros((PB, K, 3), dtype),
             "imu_a": jnp.tile(jnp.asarray([0., 0., cfg.imu.gravity], dtype),
                               (PB, K, 1)),
             "imu_dt": jnp.full((PB, K), 1.0 / cfg.imu.rate_hz, dtype),
             "imu_valid": jnp.tile(jnp.arange(K) < 10, (PB, 1)),
             "ok": jnp.ones(PB, bool)}
    return cfg, dtype, state0, ts0, chunk


def measure(cfg, dtype, state0, ts0, chunk):
    from rvio_tpu.runtime.image_driver import make_image_chunk_scan
    scan = make_image_chunk_scan(cfg, dtype)

    def run(n):
        c = (ts0, jax.tree.map(jnp.copy, state0), jax.random.key(0))
        o = None
        for _ in range(n):
            c, o = scan(c, chunk)
        return float(jnp.sum(o["p_Gk"]))

    t0 = time.perf_counter()
    run(1)
    compile_s = time.perf_counter() - t0
    t1 = t9 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(1); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); run(9); t9 = min(t9, time.perf_counter() - t0)
    return (t9 - t1) / (8 * PB) * 1e3, compile_s


STUBS = {}


def stub(name):
    def deco(fn):
        STUBS[name] = fn
        return fn
    return deco


@stub("clahe")
def _stub_clahe():
    import rvio_tpu.frontend.tracker as T
    old = T.clahe
    T.clahe = lambda img, *a, **k: img
    return lambda: setattr(T, "clahe", old)


@stub("pyramid")
def _stub_pyramid():
    import rvio_tpu.frontend.tracker as T
    old = T.build_pyramid

    def fake(img, levels):
        pyr = [img]
        for _ in range(levels):
            pyr.append(pyr[-1][::2, ::2])      # decimate, no blur
        return pyr

    T.build_pyramid = fake
    return lambda: setattr(T, "build_pyramid", old)


@stub("klt")
def _stub_klt():
    import rvio_tpu.frontend.tracker as T
    old_f, old_x = T.klt_track_fused, T.klt_track

    def fake(p1, p2, pos, active, **k):
        return pos, active, jnp.zeros(pos.shape[0], pos.dtype)

    T.klt_track_fused = fake
    T.klt_track = lambda p1, p2, pos, active, **k: fake(p1, p2, pos, active)
    return lambda: (setattr(T, "klt_track_fused", old_f),
                    setattr(T, "klt_track", old_x))


@stub("undistort")
def _stub_undistort():
    import rvio_tpu.frontend.tracker as T
    old = T.undistort_normalize

    def fake(pts, *, fx, fy, cx, cy, **k):
        return jnp.stack([(pts[..., 0] - cx) / fx,
                          (pts[..., 1] - cy) / fy], axis=-1)

    T.undistort_normalize = fake
    return lambda: setattr(T, "undistort_normalize", old)


@stub("ransac")
def _stub_ransac():
    import rvio_tpu.frontend.tracker as T
    old = T.gyro_ransac
    T.gyro_ransac = lambda key, p1, p2, valid, *a, **k: valid
    return lambda: setattr(T, "gyro_ransac", old)


@stub("detect")
def _stub_detect():
    import rvio_tpu.frontend.tracker as T
    old_r, old_g, old_s = (T.shi_tomasi_response, T.grid_top_corners,
                           T.corner_subpix)
    T.shi_tomasi_response = lambda img, **k: img
    T.grid_top_corners = lambda resp, cell, n, q: (
        jnp.zeros((n, 2), resp.dtype), jnp.zeros(n, bool))
    T.corner_subpix = lambda img, pts, **k: pts
    return lambda: (setattr(T, "shi_tomasi_response", old_r),
                    setattr(T, "grid_top_corners", old_g),
                    setattr(T, "corner_subpix", old_s))


@stub("subpix")
def _stub_subpix():
    import rvio_tpu.frontend.tracker as T
    old = T.corner_subpix
    T.corner_subpix = lambda img, pts, **k: pts
    return lambda: setattr(T, "corner_subpix", old)


@stub("propagate")
def _stub_propagate():
    import rvio_tpu.runtime.step as S
    old = S.propagate
    S.propagate = lambda st, imu, **k: st
    return lambda: setattr(S, "propagate", old)


@stub("update")
def _stub_update():
    import rvio_tpu.runtime.step as S
    old = S.msckf_update

    def fake(st, batch, **k):
        F = batch.valid.shape[0]
        z3 = jnp.zeros((F, 3), st.dtype)
        return st, {"n_good": jnp.int32(0), "passed": batch.valid,
                    "mahalanobis": jnp.zeros(F, st.dtype), "landmarks": z3,
                    "rho": jnp.zeros(F, st.dtype),
                    "did_update": jnp.bool_(False),
                    "n_usable": jnp.int32(0), "tl_good_sum": jnp.int32(0)}

    S.msckf_update = fake
    return lambda: setattr(S, "msckf_update", old)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default=",".join(["full"] + list(STUBS)))
    args = ap.parse_args()
    assert jax.devices()[0].platform != "cpu", "needs the TPU"

    inputs = build_inputs()
    results = {}
    full_ms = None
    for name in args.stages.split(","):
        if name == "full":
            ms, cs = measure(*inputs)
            full_ms = ms
        else:
            restore = STUBS[name]()
            try:
                ms, cs = measure(*inputs)
            finally:
                restore()
        results[name] = ms
        delta = (full_ms - ms) if (full_ms is not None and name != "full") else 0.0
        print(json.dumps({"stage": name, "inscan_ms": round(ms, 3),
                          "delta_ms": round(delta, 3),
                          "compile_s": round(cs, 1)}), flush=True)


if __name__ == "__main__":
    main()
