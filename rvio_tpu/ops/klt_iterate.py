"""Fused Pallas kernel: the whole per-level LK iteration loop on-core.

Replaces the XLA-composed iteration path of frontend/klt.py (the TPU
equivalent of cv::calcOpticalFlowPyrLK's refinement loop, reference:
src/rvio/Tracker.cc:237-244) with ONE kernel per pyramid level that keeps
both tile stacks VMEM-resident and runs template sampling, gradient/Hessian
setup, and all ≤max_iters Gauss-Newton iterations without touching HBM.

Why: profiling showed the XLA path pays ~30 µs per LK iteration — dominated
by two per-iteration `take_along_axis` gathers over (N, win, TILE) patches —
for ~120 iterations/frame (4 levels x 30).  The kernel removes the gathers
entirely:

- **features live on the lane axis**: every array is (rows, cols, Npad)
  with Npad a multiple of 128, so each VPU op advances all features at once;
- **per-feature fractional sampling** becomes a *binary-halving conditional
  extraction*: the bilinear patch window at integer offset ``s`` in
  ``[0, hi]`` is reached by ~log2(hi) masked static-slice selects (each lane
  picks `cur[bit:]` or `cur[:-bit]`), followed by one 2-tap blend per axis —
  all dense VPU work, no gathers;
- convergence early-exit is a scalar `while_loop` carried on an
  "any lane still active" flag, semantically identical to the XLA path's
  batch-level early exit (converged/dead lanes freeze their state).

Numerics vs frontend.klt.klt_track: identical bilinear/Scharr/Gauss-Newton
math, with one border difference — window taps are clamped by shifting the
whole window (base clamp) instead of per-tap clamping, and the tile is sized
(TH x TW from the window size + wander bound) so interior features never
clamp at all; only features whose tile origin hit the image border sample
differently, and those are border/edge cases the in-bounds mask governs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # feature-lane block multiple


def fused_tile_shape(win: int) -> tuple:
    """(TH, TW) for the fused kernel's search/template tiles.

    Sized so a feature whose center stays within the wander bound
    (±(32-win)/2-1 px of its level-entry guess, matching frontend.klt) can
    always sample a full (win+1)^2 bilinear support without any tap
    clamping.  Rows carry +8 slack for the DMA row alignment.
    """
    w = (32 - win) / 2.0 - 1.0
    th = int(2 * -(-(8.5 + w + win / 2.0) // 1))          # 2*ceil(...)
    tw = int(2 * w + win + 3)
    rup = lambda x: -(-x // 8) * 8
    return rup(th), rup(tw)


def _round_lanes(n: int) -> int:
    return -(-n // LANE) * LANE


def _extract_window(T, s, hi: int, axis: int, L: int):
    """Per-lane dynamic window T[s : s+L] along ``axis`` via halving selects.

    T: (..., N) with the lane axis last; s: (1, N) int32 in [0, hi]; the
    length of T along ``axis`` must be exactly L + hi.  Each stage halves
    the remaining shift range with one masked select of two static slices.
    """
    if hi == 0:
        return T
    take_shape = [1] * T.ndim
    take_shape[-1] = s.shape[-1]
    rmax = hi
    cur = T
    while rmax > 0:
        # bit = ceil(rmax/2): then nxt = rmax - bit >= bit - 1, so both the
        # taken slice [bit, bit+keep) and untaken [0, keep) stay in bounds
        # (len(cur) == L + rmax is the loop invariant) and rmax halves.
        bit = (rmax + 1) // 2
        nxt = rmax - bit
        keep = L + nxt
        take = (s >= bit).reshape(take_shape)
        a = lax.slice_in_dim(cur, bit, bit + keep, axis=axis)
        b = lax.slice_in_dim(cur, 0, keep, axis=axis)
        cur = jnp.where(take, a, b)
        s = jnp.where(take, s - bit, s)
        rmax = nxt
    return cur


def _sample(T, locy, locx, win: int):
    """Bilinear (win x win) patches from packed tiles at per-lane centers.

    T: (R, C, N); locy/locx: (1, N) in tile coordinates (already clipped to
    the tile).  Equivalent to frontend.klt._sample_patches with whole-window
    (base) clamping; see module docstring.  Returns (win, win, N).
    """
    R, C, N = T.shape
    r = win // 2
    fy0 = jnp.floor(locy)
    fy = (locy - fy0).astype(T.dtype)
    by = jnp.clip(fy0.astype(jnp.int32) - r, 0, R - (win + 1))
    rows = _extract_window(T, by, R - (win + 1), axis=0, L=win + 1)
    rows = rows[:-1] * (1.0 - fy)[None] + rows[1:] * fy[None]   # (win, C, N)

    fx0 = jnp.floor(locx)
    fx = (locx - fx0).astype(T.dtype)
    bx = jnp.clip(fx0.astype(jnp.int32) - r, 0, C - (win + 1))
    cols = _extract_window(rows, bx, C - (win + 1), axis=1, L=win + 1)
    return cols[:, :-1] * (1.0 - fx)[None] + cols[:, 1:] * fx[None]


def _scharr(T):
    """Scharr gradients on a packed (R, C, N) tile stack, reflect-padded.

    Same stencil as frontend.image.scharr_gradients / klt._tile_scharr
    (3/32, 10/32 smoothing taps, central difference)."""
    a = jnp.asarray(3 / 32, T.dtype)
    b = jnp.asarray(10 / 32, T.dtype)
    py = jnp.concatenate([T[1:2], T, T[-2:-1]], axis=0)
    px = jnp.concatenate([py[:, 1:2], py, py[:, -2:-1]], axis=1)
    sy = a * px[:-2] + b * px[1:-1] + a * px[2:]          # y-smoothed
    gx = sy[:, 2:] - sy[:, :-2]
    dy = px[2:] - px[:-2]
    gy = a * dy[:, :-2] + b * dy[:, 1:-1] + a * dy[:, 2:]
    return gx, gy


def _lk_level_kernel(tp_ref, ts_ref, scal_ref, out_ref, *,
                     win: int, max_iters: int, eps: float, min_eig: float,
                     wander: float):
    """One pyramid level for one lane-block of features.

    scal rows: 0 loc0y, 1 loc0x (template sample point), 2 glocy, 3 glocx
    (iteration start), 4 ginity, 5 ginitx (wander anchor), 6 status.
    out rows: 0 glocy, 1 glocx, 2 alive, 3 ok_level, 4 err, 5 iters.
    """
    Tp = tp_ref[...]
    Ts = ts_ref[...]
    dt = Tp.dtype
    area = float(win * win)

    loc0y = scal_ref[0:1, :]
    loc0x = scal_ref[1:2, :]
    gy0 = scal_ref[2:3, :]
    gx0 = scal_ref[3:4, :]
    giy = scal_ref[4:5, :]
    gix = scal_ref[5:6, :]
    status = scal_ref[6:7, :] > 0.5

    # --- template patch + gradients + inverse Hessian (once) ---
    gxt, gyt = _scharr(Tp)
    tmpl = _sample(Tp, loc0y, loc0x, win)
    gx = _sample(gxt, loc0y, loc0x, win)
    gy = _sample(gyt, loc0y, loc0x, win)

    gxx = jnp.sum(gx * gx, axis=(0, 1))[None]
    gxy = jnp.sum(gx * gy, axis=(0, 1))[None]
    gyy = jnp.sum(gy * gy, axis=(0, 1))[None]
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    meig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) / (2 * area)
    ok_level = (meig > min_eig) & (det > 1e-12)
    dets = jnp.where(det == 0, 1.0, det)
    inv00 = jnp.where(ok_level, gyy / dets, 0.0)
    inv01 = jnp.where(ok_level, -gxy / dets, 0.0)
    inv11 = jnp.where(ok_level, gxx / dets, 0.0)

    gate = status & ok_level
    R, C = Ts.shape[0], Ts.shape[1]

    def sample_cur(py, px):
        ly = jnp.clip(py, 0.0, float(R - 1))
        lx = jnp.clip(px, 0.0, float(C - 1))
        return _sample(Ts, ly, lx, win)

    # Masks are carried as f32 0/1 vectors: Mosaic requires layout-stable
    # while_loop carries and i1 vectors pick up mismatched padding layouts.
    #
    # Convergence is checked every CHECK_EVERY iterations: the while_loop's
    # scalar go-condition is a cross-lane reduction consumed by the scalar
    # core — a pipeline stall per trip that dominates the iteration cost
    # (~4 us/iter measured vs ~1 us of vector work).  Converged/dead lanes
    # freeze through the `take` mask, and the `it + j < max_iters` cap
    # keeps the sub-steps bitwise-identical to the 1-per-trip loop.
    CHECK_EVERY = 4

    def one_iter(j, carry):
        it, py, px, convf, alivef = carry
        d_ok = ((jnp.abs(py - giy) <= wander)
                & (jnp.abs(px - gix) <= wander))
        # Gate the wander kill with the same iteration cap as the updates:
        # the last trip's extra sub-steps (max_iters % CHECK_EVERY != 0)
        # must not re-check d_ok on the post-final-update position — the
        # 1-per-trip oracle never evaluates it there (d_ok is idempotent
        # between position updates, so this reproduces its check sequence
        # exactly).
        alivef = jnp.where(d_ok | (it + j >= max_iters), alivef, 0.0)
        cur = sample_cur(py, px)
        di = cur - tmpl
        bx = jnp.sum(di * gx, axis=(0, 1))[None]
        by = jnp.sum(di * gy, axis=(0, 1))[None]
        sx = -(inv00 * bx + inv01 * by)
        sy = -(inv01 * bx + inv11 * by)
        take = (convf < 0.5) & (alivef > 0.5) & (it + j < max_iters)
        py = jnp.where(take, py + sy, py)
        px = jnp.where(take, px + sx, px)
        convf = jnp.where(take & (sx * sx + sy * sy < eps * eps),
                          1.0, convf)
        return it, py, px, convf, alivef

    def body(carry):
        it, _go, py, px, convf, alivef = carry
        c = (it, py, px, convf, alivef)
        for j in range(CHECK_EVERY):
            c = one_iter(j, c)
        _, py, px, convf, alivef = c
        go = jnp.max(jnp.where(convf < 0.5, alivef, 0.0)) > 0.5
        return it + CHECK_EVERY, go, py, px, convf, alivef

    def cond(carry):
        it, go, *_ = carry
        return (it < max_iters) & go

    # alive starts as status & ok_level & inbounds — the caller folds the
    # in-bounds test into ``status``; ok_level is folded here (matching
    # frontend.klt.klt_track's `status = status & ok_level & inb`).
    gatef = jnp.where(gate, 1.0, 0.0).astype(dt)
    conv0 = jnp.zeros_like(gatef)
    go0 = jnp.max(gatef) > 0.5
    it, _go, py, px, convf, alivef = lax.while_loop(
        cond, body, (jnp.int32(0), go0, gy0, gx0, conv0, gatef))
    alive = alivef > 0.5

    cur = sample_cur(py, px)
    err = jnp.mean(jnp.abs(cur - tmpl), axis=(0, 1))[None]

    out_ref[0:1, :] = py
    out_ref[1:2, :] = px
    out_ref[2:3, :] = jnp.where(alive, 1.0, 0.0).astype(dt)
    out_ref[3:4, :] = jnp.where(ok_level, 1.0, 0.0).astype(dt)
    out_ref[4:5, :] = err.astype(dt)
    out_ref[5:6, :] = jnp.full_like(py, 1.0) * it.astype(dt)


@functools.partial(jax.jit, static_argnames=(
    "win", "max_iters", "eps", "min_eig", "wander", "interpret"))
def lk_level_pallas(tp, ts, scal, *, win: int, max_iters: int, eps: float,
                    min_eig: float, wander: float, interpret: bool = False):
    """Run one LK pyramid level for all features.

    tp/ts: (TH, TW, Npad) packed template/search tiles (lane axis last,
    Npad a multiple of 128); scal: (8, Npad) per-feature rows (see kernel).
    Returns (8, Npad) output rows.  Feature-lane blocks of 128 map to a
    grid so VMEM usage is bounded at any feature budget.
    """
    TH, TW, Npad = tp.shape
    assert Npad % LANE == 0
    blocks = Npad // LANE
    kern = functools.partial(_lk_level_kernel, win=win, max_iters=max_iters,
                             eps=eps, min_eig=min_eig, wander=wander)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, Npad), tp.dtype),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((TH, TW, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tp, ts, scal)


def _subpix_kernel(tiles_ref, scal_ref, out_ref, *, win: int, iters: int):
    """cv::cornerSubPix refinement, lane-packed (cf. detector.corner_subpix).

    scal rows: 0 locy, 1 locx (tile coords).  out rows: 0 locy, 1 locx.
    One (size+2)^2 patch per iteration; central differences are shifted
    static slices of it.  Fixed ``iters`` trips, steps clipped to ±1.
    """
    T = tiles_ref[...]
    dt = T.dtype
    size = 2 * win + 1
    R, C = T.shape[0], T.shape[1]

    # Mosaic supports integer iota only; offsets built as int then cast.
    oy = (jax.lax.broadcasted_iota(jnp.int32, (size, 1, 1), 0)
          - win).astype(dt)
    ox = (jax.lax.broadcasted_iota(jnp.int32, (1, size, 1), 1)
          - win).astype(dt)
    wmask = jnp.exp(-(ox * ox + oy * oy) / (2.0 * (win / 2.0) ** 2)).astype(dt)

    py = scal_ref[0:1, :]
    px = scal_ref[1:2, :]
    for _ in range(iters):
        ly = jnp.clip(py, 0.0, float(R - 1))
        lx = jnp.clip(px, 0.0, float(C - 1))
        p = _sample(T, ly, lx, size + 2)             # (size+2, size+2, N)
        gx = (p[1:-1, 2:, :] - p[1:-1, :-2, :]) * 0.5
        gy = (p[2:, 1:-1, :] - p[:-2, 1:-1, :]) * 0.5
        gxx = jnp.sum(wmask * gx * gx, axis=(0, 1))[None]
        gxy = jnp.sum(wmask * gx * gy, axis=(0, 1))[None]
        gyy = jnp.sum(wmask * gy * gy, axis=(0, 1))[None]
        bx = jnp.sum(wmask * (gx * gx * ox + gx * gy * oy), axis=(0, 1))[None]
        by = jnp.sum(wmask * (gx * gy * ox + gy * gy * oy), axis=(0, 1))[None]
        det = gxx * gyy - gxy * gxy
        safe = jnp.abs(det) > 1e-12
        dets = jnp.where(safe, det, 1.0)
        dx = jnp.where(safe, (gyy * bx - gxy * by) / dets, 0.0)
        dy = jnp.where(safe, (-gxy * bx + gxx * by) / dets, 0.0)
        px = px + jnp.clip(dx, -1.0, 1.0)
        py = py + jnp.clip(dy, -1.0, 1.0)
    out_ref[0:1, :] = py
    out_ref[1:2, :] = px
    out_ref[2:8, :] = jnp.zeros((6, py.shape[1]), dt)


@functools.partial(jax.jit, static_argnames=("win", "iters", "interpret"))
def subpix_refine_pallas(img: jnp.ndarray, pts: jnp.ndarray, *, win: int = 7,
                         iters: int = 10, interpret: bool = False):
    """Batched corner refinement on an edge-padded image.

    img: (H, W); pts: (N, 2) xy pixel coords.  Returns refined (N, 2).
    Mirrors detector.corner_subpix numerics; window sampling uses the
    fused-KLT base-clamped bilinear (identical while the corner stays
    within ~±9 px of its detection, which clip(step)<=1 x iters bounds).
    """
    from rvio_tpu.frontend.klt import gather_edge_padded_tiles

    rup8 = lambda x: -(-x // 8) * 8
    # Tile sized so the (2*win+3)-tap sample window plus bilinear blend stays
    # interior under the 8-row origin alignment (+7), rounding (+0.5), and
    # the clip(step)<=1-per-iteration drift bound (+iters) — see the fused
    # LK sizing derivation; rows: TH/2 + 7.5 + iters + win + 2 <= TH - 1.
    TH = rup8(2 * iters + 2 * win + 21)
    TW = rup8(2 * iters + 2 * win + 7)
    N = pts.shape[0]
    Npad = -(-N // LANE) * LANE
    dtype = pts.dtype
    on_tpu = (not interpret) and jax.default_backend() in ("tpu", "axon")

    tiles, o_img = gather_edge_padded_tiles(img, pts, TH, TW, on_tpu)
    tp = jnp.pad(jnp.transpose(tiles.astype(jnp.float32), (1, 2, 0)),
                 ((0, 0), (0, 0), (0, Npad - N)))
    o_img = o_img.astype(dtype)
    loc = (pts - o_img).astype(jnp.float32)
    scal = (jnp.zeros((8, Npad), jnp.float32)
            .at[0, :N].set(loc[:, 1])
            .at[1, :N].set(loc[:, 0]))

    kern = functools.partial(_subpix_kernel, win=win, iters=iters)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, Npad), jnp.float32),
        grid=(Npad // LANE,),
        in_specs=[
            pl.BlockSpec((TH, TW, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tp, scal)
    py = out[0, :N].astype(dtype) + o_img[:, 1]
    px = out[1, :N].astype(dtype) + o_img[:, 0]
    return jnp.stack([px, py], axis=1)
