"""Roofline accounting for the five fused Pallas kernels (VERDICT items).

Measures device peaks empirically on the attached chip (HBM bandwidth via a
loop-carried streaming triad, VPU f32 throughput via a long fused FMA
chain, MXU f32 throughput via a large matmul), then times each fused kernel
at flagship shapes and reports achieved GFLOP/s / GB/s against those peaks.

Timing methodology (axon dev tunnel): a single dispatch pays ~1 ms of RPC
latency, which swamps sub-millisecond kernels — so every measurement here
runs K repetitions INSIDE one jitted ``lax.scan`` with a loop-carried data
dependency (the next iteration's inputs depend on the previous outputs, so
XLA cannot elide or overlap the repeats), plus a scalar-only device->host
readback.  Per-kernel time = scan wall / K.

FLOP/byte counts are analytic from the kernel shapes (documented inline);
the VPU numbers count every elementwise op (select/compare/fma alike) since
they all occupy a VPU lane-slot — the right unit for kernels that do no
matmuls.  Prints a table; results recorded in BASELINE.md.

Run on TPU: python scripts/roofline.py
"""

import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rvio_tpu.config import RVIOConfig

K_REP = 32  # in-jit repetitions per dispatch


def _time_scanned(step, init_carry, reps=K_REP, chain=16, outers=3):
    """Time ``step`` executions with sync latency fully amortized.

    step(carry) -> carry with a real data dependency between iterations.
    One jitted program runs ``reps`` executions via lax.scan; ``chain``
    such calls are chained carry-to-carry before a single scalar
    readback.  Through the axon tunnel a device->host sync costs ~25 ms
    (measured 2026-08-21) regardless of work, so per-kernel time must be
    the DELTA between a chained run and a single (sync-dominated) run:
    t = (T_chain - T_1) / ((chain - 1) * reps).
    """
    @jax.jit
    def run(c):
        return lax.scan(lambda cc, _: (step(cc), None), c, None,
                        length=reps)[0]

    def sync(out):
        # scalar readback — full-array conversion rides the ~30 MB/s tunnel
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    sync(run(init_carry))  # compile + warm
    t1 = float("inf")
    tN = float("inf")
    for _ in range(outers):
        t0 = time.perf_counter()
        sync(run(init_carry))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        c = init_carry
        for _ in range(chain):
            c = run(c)
        sync(c)
        tN = min(tN, time.perf_counter() - t0)
    return max(tN - t1, 1e-9) / ((chain - 1) * reps)


def measure_peaks():
    # HBM: loop-carried triad y <- x*c + y (reads x,y; writes y) — the loop
    # carry stops XLA fusing the repeats into registers
    n = 32 * 1024 * 1024  # 128 MB per array
    x = jnp.ones((n,), jnp.float32)

    def triad(y):
        return x * 1.5 + y

    t = _time_scanned(triad, jnp.zeros((n,), jnp.float32), reps=16)
    hbm = 3 * 4 * n / t / 1e9

    # VPU f32: K fused FMAs per element on a VMEM-sized working set
    KF = 256
    m = 2 * 1024 * 1024

    def chain(a):
        acc = a
        for _ in range(KF):
            acc = acc * 1.0000001 + 1e-7
        return acc

    t = _time_scanned(chain, jnp.ones((m,), jnp.float32), reps=8)
    vpu = 2 * KF * m / t / 1e9  # fma = 2 flops

    # MXU f32 (highest precision — what the filter uses).  d must be large
    # enough that one matmul (~7 ms at d=8192) dwarfs timing noise, and A
    # must be non-degenerate random — a uniform constant lets XLA reduce
    # the product to a rank-1 broadcast and report PFLOP/s fiction.
    d = 8192
    A = jnp.asarray(np.random.default_rng(0).standard_normal((d, d)) * 1e-2,
                    jnp.float32)

    def mm(carry):
        # A rides in the carry: a closed-over 256 MB constant would be
        # embedded in the HLO (the remote-compile endpoint rejects it)
        A_, B = carry
        return A_, jax.lax.dot(A_, B,
                               precision=jax.lax.Precision.HIGHEST) * 1e-2

    t = _time_scanned(mm, (A, A), reps=4, chain=4)
    mxu = 2 * d ** 3 / t / 1e9
    return hbm, vpu, mxu


def bench_klt(cfg):
    """Fused per-level LK kernel at flagship shapes (pos feeds back)."""
    from rvio_tpu.frontend.image import build_pyramid
    from rvio_tpu.frontend.klt import klt_track_fused
    from rvio_tpu.ops.klt_iterate import fused_tile_shape

    rng = np.random.default_rng(0)
    H, W = cfg.camera.height, cfg.camera.width
    img1 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    pyr1 = [jnp.asarray(p) for p in build_pyramid(img1, cfg.tracker.klt_levels)]
    pyr2 = [jnp.asarray(p) for p in build_pyramid(img2, cfg.tracker.klt_levels)]
    N = cfg.tracker.num_features
    pos0 = jnp.asarray(rng.uniform(40, min(H, W) - 40, (N, 2)), jnp.float32)
    active = jnp.ones(N, bool)
    win = cfg.tracker.klt_window
    it = cfg.tracker.klt_max_iters

    def step(pos):
        new_pos, status, err = klt_track_fused(
            pyr1, pyr2, pos, active, win=win, max_iters=it,
            eps=cfg.tracker.klt_eps, min_eig=cfg.tracker.klt_min_eig)
        # dependency + keep the workload stationary
        return pos0 + (new_pos - new_pos.mean()) * 1e-12

    t = _time_scanned(step, pos0)

    # analytic per-iteration elementwise ops (dominant terms), per lane:
    #   window extraction: 2 axes x ceil(log2(hi)) halving selects over the
    #     (TH, TW) tile (select = 1 op) + 2-tap bilinear blend (3 fma)
    #   residual/gradient/Hessian update on the (win+1)^2 support: ~12 ops
    TH, TW = fused_tile_shape(win)
    hi = TW - (win + 2)
    levels = cfg.tracker.klt_levels + 1
    Npad = -(-N // 128) * 128
    per_iter = (2 * math.ceil(math.log2(max(hi, 2))) * TH * TW
                + 3 * (win + 1) ** 2 + 12 * (win + 1) ** 2)
    flops = levels * it * per_iter * Npad
    # bytes: tile stacks DMA'd once per level (template+search, f32)
    bytes_ = levels * 2 * TH * TW * Npad * 4
    return t, flops, bytes_


def bench_lm(cfg):
    """Pallas LM triangulation at flagship shapes."""
    from rvio_tpu.ops.lm_triangulate import lm_triangulate_pallas

    rng = np.random.default_rng(1)
    F = cfg.tracker.max_update_features
    L = cfg.tracker.max_tracking_length
    z0 = jnp.asarray(rng.normal(0, 0.1, (F, L, 2)), jnp.float32)
    Rc = jnp.asarray(np.tile(np.eye(3), (F, L, 1, 1)), jnp.float32)
    tc = jnp.asarray(rng.normal(0, 0.1, (F, L, 3)), jnp.float32)
    tlen = jnp.asarray(rng.integers(3, L + 1, F), jnp.int32)

    def step(z):
        phi, psi, rho, ok = lm_triangulate_pallas(
            z, Rc, tc, tlen, sigma_im=cfg.camera.sigma_image)
        return z0 + (rho[:, None, None] - rho.mean()) * 1e-12

    t = _time_scanned(step, z0)

    Fpad = -(-F // 128) * 128
    # per LM iteration per (L, lane) element: h = R e + rho t (15 fma),
    # residual+proj (8), Hproj/HJ/Ht 2x3 jacobians (~60), HTH/HTe
    # accumulations (~54), masked reductions (~12) -> ~150 ops; plus the
    # 3x3 adjugate solve (~60 ops on (1, N)) per iteration
    iters = 10
    flops = iters * (150 * L + 60) * Fpad
    bytes_ = (2 + 9 + 3) * L * Fpad * 4 * 2
    return t, flops, bytes_


def bench_gate(cfg):
    """Pallas Mahalanobis-gate Cholesky at flagship shapes."""
    from rvio_tpu.ops.spd_solve import batched_quadform_pallas

    rng = np.random.default_rng(2)
    F = cfg.tracker.max_update_features
    m = 2 * cfg.tracker.max_tracking_length
    A = rng.normal(size=(F, m, m))
    S = jnp.asarray(A @ A.transpose(0, 2, 1) + 10 * np.eye(m), jnp.float32)
    r0 = jnp.asarray(rng.normal(size=(F, m)), jnp.float32)

    def step(r):
        D = batched_quadform_pallas(S, r)
        return r0 + (D[:, None] - D.mean()) * 1e-12

    t = _time_scanned(step, r0)
    # cholesky m^3/3 + two triangular solves m^2 + quadform m, per feature
    flops = F * (m ** 3 / 3 + 2 * m ** 2 + m) * 2
    bytes_ = F * (m * m + m) * 4 * 2
    return t, flops, bytes_


def bench_clahe(cfg):
    """Pallas CLAHE (hist + apply) at the flagship image size."""
    from rvio_tpu.ops.clahe import clahe_pallas

    rng = np.random.default_rng(3)
    H, W = cfg.camera.height, cfg.camera.width
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    def step(img):
        out = clahe_pallas(img, 3.0, 5)
        return img0 + (out - out.mean()) * 1e-12

    t = _time_scanned(step, img0)
    g = 5
    th, tw = -(-H // g), -(-W // g)
    Hp, Wpx = th * g, -(-(tw * g) // 128) * 128
    # nibble-factored kernels: per pixel the VPU builds ~3 16-to-16g-wide
    # one-hots (~2 ops/elem) plus the apply's hi-select/weight/reduce
    # (~5*16g ops).  The 2*2*16*16g MAC-flops/pixel of K=16 contractions
    # ride the MXU concurrently and are NOT counted here, so %VPU below is
    # the kernel's VPU-lane occupancy (its governing bound).
    flops = (2 * 2 * (16 + 16 * g) + 5 * 16 * g) * Hp * Wpx
    bytes_ = (3 * Hp * Wpx) * 4
    return t, flops, bytes_


def bench_jac_project(cfg):
    """Fused jacobian+projection kernel at the flagship update shape."""
    from rvio_tpu.ops.jac_project import jac_project_pallas

    rng = np.random.default_rng(6)
    F = cfg.tracker.max_update_features
    L = cfg.tracker.max_tracking_length
    Rc = jnp.asarray(np.tile(np.eye(3), (F, L, 1, 1))
                     + rng.normal(size=(F, L, 3, 3)) * 0.05, jnp.float32)
    tc = jnp.asarray(rng.normal(size=(F, L, 3)) * 0.2, jnp.float32)
    z = jnp.asarray(rng.normal(size=(F, L, 2)) * 0.2, jnp.float32)
    phi = jnp.asarray(rng.normal(size=F) * 0.3, jnp.float32)
    psi = jnp.asarray(rng.normal(size=F) * 0.3, jnp.float32)
    rho = jnp.asarray(rng.uniform(0.3, 2.0, F), jnp.float32)
    te = jnp.asarray(rng.integers(3, L + 1, F), jnp.int32)
    Rbc_t = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    tbc_t = (0.0, 0.0, 0.0)

    def step(zz):
        r_p, hx, hfn = jac_project_pallas(
            zz, Rc, tc, Rc, tc, Rc, tc, phi, psi, rho, te,
            Rbc_t=Rbc_t, tbc_t=tbc_t, L=L)
        return z + (jnp.sum(r_p) + jnp.sum(hfn)) * 1e-20

    t = _time_scanned(step, z)
    # per feature: chains/Hf ~ 60L, block outer product 2*3*6(L-1)*2L,
    # 3 reflections x ~4 passes over the (88, 2L) system
    J = L - 1
    flops = F * (60 * L + 2 * 3 * 6 * J * 2 * L + 3 * 4 * 2 * (6 * J + 4) * 2 * L)
    bytes_ = F * (L * 38 + 2 * L * (6 * J + 4)) * 4
    return t, flops, bytes_


def bench_propagate_block(cfg):
    """Fused whole-frame propagation kernel (K-sample IMU block)."""
    from rvio_tpu.ops.propagate_block import propagate_block_pallas

    rng = np.random.default_rng(7)
    K = cfg.tpu.imu_block
    w = jnp.asarray(rng.normal(size=(K, 3)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.normal(size=(K, 3)) + [0, 0, 9.8], jnp.float32)
    dte = jnp.full((K,), 0.005, jnp.float32)
    A = rng.normal(size=(24, 24)) * 0.01
    P0 = jnp.asarray(A @ A.T + np.eye(24) * 1e-4, jnp.float32)
    R0 = jnp.eye(3, dtype=jnp.float32)
    v3 = jnp.asarray(rng.normal(size=3), jnp.float32)
    g3 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    sig = (1e-4,) * 12

    def step(ww):
        Rk, pk, vk, P24, Psi = propagate_block_pallas(
            ww, a, dte, R0, v3, g3, v3 * 0, v3 * 0, P0,
            gravity=9.8, small_angle=0.001, sig=sig)
        return w + (jnp.sum(P24) + jnp.sum(pk)) * 1e-20

    t = _time_scanned(step, w)
    # per sample: ~4 24x24 matmuls + ~10 3x3 products + scalar bank
    flops = K * (4 * 2 * 24 ** 3 + 20 * 2 * 27 + 200)
    bytes_ = (2 * 24 * 24 + K * 7 + 60) * 4
    return t, flops, bytes_


def bench_tile_gather(cfg):
    """Tile-gather DMA kernel at the fused-KLT level-0 shape."""
    from rvio_tpu.ops.tile_gather import gather_tiles_narrow_pallas
    from rvio_tpu.ops.klt_iterate import fused_tile_shape

    rng = np.random.default_rng(4)
    H, W = cfg.camera.height, cfg.camera.width
    Wp = -(-W // 128) * 128 + 256
    img = jnp.asarray(rng.uniform(0, 255, (H, Wp)), jnp.float32)
    N = cfg.tracker.num_features
    th, tw = fused_tile_shape(cfg.tracker.klt_window)
    origin0 = jnp.asarray(
        np.stack([rng.integers(0, W - tw, N), rng.integers(0, H - th, N)],
                 axis=1), jnp.int32)

    def step(origin):
        tiles = gather_tiles_narrow_pallas(img, origin, th=th, tw=tw)
        dep = (jnp.sum(tiles) * 1e-20).astype(jnp.int32)  # 0, data-dependent
        return origin0 + dep

    t = _time_scanned(step, origin0)
    # pure DMA: reads a (th, 256) band + writes a (th, tw) tile per feature
    bytes_ = N * (th * 256 + th * tw) * 4
    return t, 0.0, bytes_


def bench_shi_tomasi_nms(cfg):
    """Fused response+NMS kernel at the flagship image size."""
    from rvio_tpu.ops.shi_tomasi import shi_tomasi_nms_pallas

    rng = np.random.default_rng(8)
    H, W = cfg.camera.height, cfg.camera.width
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    def step(img):
        out = shi_tomasi_nms_pallas(img)
        dep = jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))
        return img0 + dep * 1e-20

    t = _time_scanned(step, img0)
    Wp = -(-(W + 4) // 128) * 128
    Hp = -(-H // 64) * 64
    # per pixel: sobel (8 fma) + 3 products + 3 box sums (4 adds each) +
    # eig formula (~8) + 8 NMS compares
    flops = (8 + 3 + 12 + 8 + 8) * Hp * Wp
    bytes_ = 2 * Hp * Wp * 4
    return t, flops, bytes_


def bench_ekf_tail(cfg):
    """Fused compression+EKF-core kernel (kept as option; see BASELINE
    round 5a — measured slower than the XLA chain it replaces)."""
    from rvio_tpu.ops.ekf_tail import ekf_tail_pallas

    rng = np.random.default_rng(9)
    M = cfg.window_size
    CM, D = 6 * M, 24 + 6 * M
    Hs = rng.normal(size=(600, CM)).astype(np.float32) * 0.5
    C = jnp.asarray(Hs.T @ Hs)
    b = jnp.asarray(Hs.T @ (rng.normal(size=600).astype(np.float32) * 0.01))
    A = rng.normal(size=(D, D)) * 0.02
    P0 = jnp.asarray((A @ A.T + np.eye(D) * 1e-4).astype(np.float32))
    sig2 = jnp.float32(2.3e-6)

    def step(P):
        dx, Pn = ekf_tail_pallas(C, b, P, sig2)
        return 0.999 * Pn + 0.001 * P0

    t = _time_scanned(step, P0)
    NC = -(-CM // 8) * 8
    DP = -(-D // 8) * 8
    # 2 choleskys (NC^3/3) + 3 triangular passes (NC^2 * DP) + ~6 dense
    # matmuls (DP^2 * NC or DP^3)
    flops = 2 * (2 * NC ** 3 / 3) + 3 * 2 * NC * NC * DP + 6 * 2 * DP * DP * NC
    bytes_ = (2 * NC * NC + 2 * DP * DP) * 4
    return t, flops, bytes_


def main():
    cfg = RVIOConfig()
    hbm, vpu, mxu = measure_peaks()
    print(f"measured peaks: HBM {hbm:.0f} GB/s, VPU f32 {vpu:.0f} GFLOP/s, "
          f"MXU f32(highest) {mxu:.0f} GFLOP/s")
    rows = []
    for name, fn in (("fused KLT (4 lvl x 30 it, N=200)", bench_klt),
                     ("LM triangulate (F=100, L=15)", bench_lm),
                     ("gate cholesky (F=100, m=30)", bench_gate),
                     ("clahe nibble VPU-side (480x752)", bench_clahe),
                     ("jac+project fused (F=100, L=15)", bench_jac_project),
                     ("propagate block (K=16)", bench_propagate_block),
                     ("shi-tomasi + NMS fused (480x752)", bench_shi_tomasi_nms),
                     ("ekf tail fused (off by default)", bench_ekf_tail),
                     ("tile gather (N=200 KLT tiles)", bench_tile_gather)):
        t, flops, bytes_ = fn(cfg)
        rows.append((name, t * 1e3, flops / t / 1e9, bytes_ / t / 1e9))
    print(f"{'kernel':<34} {'ms':>7} {'GFLOP/s':>9} {'%VPU':>6} "
          f"{'GB/s':>7} {'%HBM':>6}")
    for name, ms, gf, gb in rows:
        print(f"{name:<34} {ms:>7.3f} {gf:>9.1f} {100 * gf / vpu:>5.1f}% "
              f"{gb:>7.2f} {100 * gb / hbm:>5.1f}%")


if __name__ == "__main__":
    main()
