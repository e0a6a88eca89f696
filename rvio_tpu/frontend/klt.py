"""Batched pyramidal Lucas-Kanade optical flow — TPU speed-of-light design.

Replaces cv::calcOpticalFlowPyrLK (reference: src/rvio/Tracker.cc:237-244 —
15x15 window, 3 pyramid levels, 30 iterations, eps 1e-2, minEig 1e-3).

Design: per-iteration *gathers* are the TPU killer, so they are hoisted out
entirely.  Per pyramid level, a (TILE x TILE) neighborhood around each
feature is gathered ONCE (prev-image template + gradients, next-image
search tile).  Bilinear sampling is separable, so every iteration's patch
resample becomes two small matmuls per feature:

    patch = lerp(gather_rows(tile)) then lerp(gather_cols)   (N, win, win)

(separable 2-tap bilinear as fused gathers — batched tiny matmuls would
lower to per-element MXU dispatches on TPU).
All N features iterate together; a batch-level while_loop exits when every
feature has converged, recovering OpenCV's per-feature early exit.

Features whose iteration wanders outside its search tile (> ~(TILE-win)/2 px
from the initial guess at that level) are marked failed — the pyramid keeps
per-level corrections small, so this bound only trims genuinely lost tracks.

``klt_track_gather`` keeps the direct per-iteration-gather formulation as a
cross-check reference for tests.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from rvio_tpu.frontend.image import bilinear_sample, scharr_gradients

TILE = 32       # search/template tile width; margin = (TILE - win)/2 - 1 px
TILE_H = 40     # tile height: 32 + 8 slack so row origins can be 8-aligned
                # (TPU DMA/vector slices need sublane offsets divisible by 8)


def _align_origins(origin: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Clamp origins in-bounds and 8-align the row origin."""
    oy = jnp.clip(origin[:, 1], 0, max(H - TILE_H, 0))
    oy = (oy // 8) * 8
    ox = jnp.clip(origin[:, 0], 0, max(W - TILE, 0))
    return jnp.stack([ox, oy], axis=1)


def _gather_tiles(img: jnp.ndarray, origin: jnp.ndarray, th: int, tw: int
                  ) -> jnp.ndarray:
    """Gather (N, th, tw) neighborhoods at integer (x, y) origins (clamped)."""
    H, W = img.shape
    oy = jnp.clip(origin[:, 1], 0, max(H - th, 0))
    ox = jnp.clip(origin[:, 0], 0, max(W - tw, 0))
    rows = oy[:, None] + jnp.arange(th)[None, :]
    cols = ox[:, None] + jnp.arange(tw)[None, :]
    rows = jnp.minimum(rows, H - 1)
    cols = jnp.minimum(cols, W - 1)
    return img[rows[:, :, None], cols[:, None, :]]


def _tile_gather_dispatch(use_pallas: bool):
    """Pick the tile gather backend.

    Returns ``gather(img, ideal_origin) -> (tiles, actual_origin)``.  The
    Pallas DMA path (TPU) needs (8, 128)-aligned origins, so it pads the
    image, aligns the origin down, and returns wide (40, 256) tiles with the
    residual folded into ``actual_origin``; XLA advanced-indexing returns
    narrow (40, 32) tiles (row-aligned only).  XLA's general gather is a
    ~ms-scale scalar loop on TPU — the DMA path is the fast one there.
    """
    if use_pallas and jax.default_backend() in ("tpu", "axon"):
        from rvio_tpu.ops.tile_gather import gather_tiles_narrow_pallas

        def g(img, origin):
            H, W = img.shape
            # the kernel DMAs 256-wide bands: pad so every band fits
            wpad = max(W, (max(W - TILE, 0) // 128) * 128 + 256)
            hpad = max(TILE_H, -(-H // 8) * 8)
            o = _align_origins(origin, H, W)   # same geometry as XLA path
            if wpad > W or hpad > H:
                img = jnp.pad(img, ((0, hpad - H), (0, wpad - W)))
            tiles = gather_tiles_narrow_pallas(img, o, th=TILE_H, tw=TILE)
            return tiles, o

        return g

    def g(img, origin):
        H, W = img.shape
        o = _align_origins(origin, H, W)
        return _gather_tiles(img, o, TILE_H, TILE), o

    return g


def _window_indices(local: jnp.ndarray, win: int, tile: int):
    """Contiguous tap window start indices along one axis.

    Because the patch grid is unit-spaced, floor(local - r + i) =
    floor(local) - r + i: every tap shares the same fractional weight and
    the integer taps are consecutive.  Returns (idx (N, win), frac (N,))
    with idx clipped to [0, tile-2] (edge replication beyond the tile).
    """
    r = win // 2
    f = jnp.floor(local)
    frac = (local - f).astype(local.dtype)
    idx = f.astype(jnp.int32)[:, None] + (jnp.arange(win) - r)[None, :]
    return jnp.clip(idx, 0, tile - 2), frac


def _sample_patches(tiles: jnp.ndarray, loc_y: jnp.ndarray,
                    loc_x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(N,TH,TW) tiles sampled at fractional centers -> (N,win,win).

    Separable bilinear with the constant-fraction trick: the 2-tap lerp
    weight is identical for every row/column of the patch, so the blend is
    one elementwise pass over the whole tile and the per-tap gather becomes
    a single contiguous-window take_along_axis per axis (2 gathers total,
    the only dynamic ops in the LK iteration).
    """
    fy, wy = _window_indices(loc_y, win, tiles.shape[-2])
    fx, wx = _window_indices(loc_x, win, tiles.shape[-1])
    rows_b = (tiles[:, :-1, :] * (1 - wy)[:, None, None]
              + tiles[:, 1:, :] * wy[:, None, None])           # (N, TH-1, TW)
    rows = jnp.take_along_axis(rows_b, fy[:, :, None], axis=1)  # (N, win, TW)
    cols_b = (rows[:, :, :-1] * (1 - wx)[:, None, None]
              + rows[:, :, 1:] * wx[:, None, None])
    return jnp.take_along_axis(cols_b, fx[:, None, :], axis=2)


def _tile_scharr(tiles: jnp.ndarray):
    """Scharr gradients computed on gathered tiles (no full-image pass).

    Bitwise-matches frontend.image.scharr_gradients at every location the
    LK window can sample: patch taps stay >= 1 px inside the tile for
    unclamped origins, and for origin-clamped (image-border) features the
    tile edge IS the image edge, where the reflect pad reproduces the
    full-image filter's reflect border.
    """
    p = jnp.pad(tiles, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    a = jnp.asarray(3 / 32, tiles.dtype)
    b = jnp.asarray(10 / 32, tiles.dtype)
    sy = a * p[:, :-2, :] + b * p[:, 1:-1, :] + a * p[:, 2:, :]
    gx = sy[:, :, 2:] - sy[:, :, :-2]
    dy = p[:, 2:, :] - p[:, :-2, :]
    gy = a * dy[:, :, :-2] + b * dy[:, :, 1:-1] + a * dy[:, :, 2:]
    return gx, gy


def klt_track(prev_pyr: List[jnp.ndarray], next_pyr: List[jnp.ndarray],
              pts: jnp.ndarray, active: jnp.ndarray, *, win: int = 15,
              max_iters: int = 30, eps: float = 1e-2,
              min_eig: float = 1e-3, use_pallas: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track points from prev to next image through the pyramid.

    pts: (N, 2) pixel coords in the full-resolution previous image.
    active: (N,) bool — inactive lanes are skipped (status False).
    Returns (new_pts (N,2), status (N,), err (N,)).
    """
    gather = _tile_gather_dispatch(use_pallas)
    levels = len(prev_pyr) - 1
    N = pts.shape[0]
    dtype = pts.dtype
    area = win * win
    r = win // 2

    guess = pts / (2.0 ** levels)
    status = active
    err = jnp.zeros(N, dtype)

    for lvl in range(levels, -1, -1):
        prev_img = prev_pyr[lvl]
        next_img = next_pyr[lvl]
        H, W = prev_img.shape
        p_lvl = pts / (2.0 ** lvl)

        # --- template tiles (one gather; gradients computed on-tile) ---
        o0i = jnp.stack([jnp.round(p_lvl[:, 0]).astype(jnp.int32) - TILE // 2,
                         jnp.round(p_lvl[:, 1]).astype(jnp.int32) - TILE_H // 2],
                        axis=1)
        t_img, o0 = gather(prev_img, o0i)
        t_gx, t_gy = _tile_scharr(t_img)

        loc0 = p_lvl - o0.astype(dtype)
        tmpl = _sample_patches(t_img, loc0[:, 1], loc0[:, 0], win)
        gx = _sample_patches(t_gx, loc0[:, 1], loc0[:, 0], win)
        gy = _sample_patches(t_gy, loc0[:, 1], loc0[:, 0], win)

        gxx = jnp.sum(gx * gx, axis=(1, 2))
        gxy = jnp.sum(gx * gy, axis=(1, 2))
        gyy = jnp.sum(gy * gy, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        meig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (2 * area)
        ok_level = (meig > min_eig) & (det > 1e-12)
        dets = jnp.where(det == 0, 1.0, det)
        inv00 = jnp.where(ok_level, gyy / dets, 0.0)
        inv01 = jnp.where(ok_level, -gxy / dets, 0.0)
        inv11 = jnp.where(ok_level, gxx / dets, 0.0)

        # In-bounds: full window demanded only at level 0 (coarser levels
        # clamp-sample the border like OpenCV's padded pyramids).
        rb = r + 1 if lvl == 0 else 1
        inb = ((p_lvl[:, 0] > rb) & (p_lvl[:, 0] < W - rb - 1)
               & (p_lvl[:, 1] > rb) & (p_lvl[:, 1] < H - rb - 1))
        status = status & ok_level & inb

        # --- search tiles in the next image (gathered once per level) ---
        o1i = jnp.stack([jnp.round(guess[:, 0]).astype(jnp.int32) - TILE // 2,
                         jnp.round(guess[:, 1]).astype(jnp.int32) - TILE_H // 2],
                        axis=1)
        n_tiles, o1 = gather(next_img, o1i)
        o1f = o1.astype(dtype)
        margin_lo = float(r)
        margin_hi = float(TILE - r - 2)
        g_init = guess  # level-entry guess: wandering is measured from here
        wander = float(TILE - win) / 2.0 - 1.0

        def body(carry):
            it, g, conv, alive = carry
            # kill only genuinely wandering tracks — border features whose
            # tile origin was clamped must keep their clamp-sampled patch
            d = jnp.abs(g - g_init)
            alive = alive & (d[:, 0] <= wander) & (d[:, 1] <= wander)
            loc = g - o1f
            # clamp only to the tile itself; the 2-tap weights edge-replicate
            # beyond it (mirrors bilinear_sample's border clamping)
            locy = jnp.clip(loc[:, 1], 0.0, float(n_tiles.shape[1] - 1))
            locx = jnp.clip(loc[:, 0], 0.0, float(n_tiles.shape[2] - 1))
            cur = _sample_patches(n_tiles, locy, locx, win)
            di = cur - tmpl
            bx = jnp.sum(di * gx, axis=(1, 2))
            by = jnp.sum(di * gy, axis=(1, 2))
            dx = -(inv00 * bx + inv01 * by)
            dy = -(inv01 * bx + inv11 * by)
            step = jnp.stack([dx, dy], axis=-1)
            take = (~conv & alive)[:, None]
            g_new = jnp.where(take, g + step, g)
            conv_new = conv | (jnp.sum(step * step, axis=-1) < eps * eps)
            return it + 1, g_new, conv_new, alive

        def cond(carry):
            it, g, conv, alive = carry
            # exact early exit: a converged/dead lane's remaining trips are
            # no-ops (take=False freezes g), so stopping when none are live
            # is bitwise-identical to the fixed-trip loop
            return (it < max_iters) & jnp.any(~conv & alive & status)

        conv0 = jnp.zeros(N, bool)
        _, guess, _, alive = jax.lax.while_loop(
            cond, body, (jnp.int32(0), guess, conv0, status))
        status = status & alive

        if lvl > 0:
            guess = guess * 2.0
        else:
            inb2 = ((guess[:, 0] > rb) & (guess[:, 0] < W - rb - 1)
                    & (guess[:, 1] > rb) & (guess[:, 1] < H - rb - 1))
            status = status & inb2
            loc = guess - o1f
            cur = _sample_patches(n_tiles,
                                  jnp.clip(loc[:, 1], 0.0,
                                           float(n_tiles.shape[1] - 1)),
                                  jnp.clip(loc[:, 0], 0.0,
                                           float(n_tiles.shape[2] - 1)),
                                  win)
            err = jnp.mean(jnp.abs(cur - tmpl), axis=(1, 2))

    return guess, status, err


def gather_edge_padded_tiles(img: jnp.ndarray, pts_xy: jnp.ndarray,
                             th: int, tw: int, on_tpu: bool):
    """Per-feature (th x tw) tiles centered on pts from an edge-replicate
    padded image — tile origins never clamp at image borders, so sampling
    is interior everywhere and border pixels replicate (OpenCV-like).

    Returns (tiles (N, th, tw), origin (N, 2) in IMAGE coords, possibly
    negative near borders).  Row origins are 8-aligned (DMA tiling); the
    shared geometry for the fused LK and subpix kernels.
    """
    H, W = img.shape
    pady, padx = th // 2, tw // 2
    imgp = jnp.pad(img, ((pady, pady), (padx, padx)), mode="edge")
    Hp, Wp = H + 2 * pady, W + 2 * padx
    oy = jnp.round(pts_xy[:, 1]).astype(jnp.int32) + pady - th // 2
    oy = (jnp.clip(oy, 0, Hp - th) // 8) * 8
    ox = jnp.round(pts_xy[:, 0]).astype(jnp.int32) + padx - tw // 2
    ox = jnp.clip(ox, 0, Wp - tw)
    o = jnp.stack([ox, oy], axis=1)
    if on_tpu:
        from rvio_tpu.ops.tile_gather import gather_tiles_narrow_pallas
        wpad = max(Wp, (max(Wp - tw, 0) // 128) * 128 + 256)
        hpad = -(-Hp // 8) * 8
        if wpad > Wp or hpad > Hp:
            imgp = jnp.pad(imgp, ((0, hpad - Hp), (0, wpad - Wp)))
        tiles = gather_tiles_narrow_pallas(imgp, o, th=th, tw=tw)
    else:
        tiles = _gather_tiles(imgp, o, th, tw)
    o_img = o - jnp.asarray([padx, pady], jnp.int32)[None]
    return tiles, o_img


def klt_track_fused(prev_pyr: List[jnp.ndarray], next_pyr: List[jnp.ndarray],
                    pts: jnp.ndarray, active: jnp.ndarray, *, win: int = 15,
                    max_iters: int = 30, eps: float = 1e-2,
                    min_eig: float = 1e-3, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """klt_track with the per-level iteration loop fused into ONE Pallas
    kernel (ops/klt_iterate.py): tiles stay VMEM-resident, features are
    packed on the lane axis, and the ~120 LK iterations/frame run without
    any XLA gathers.  Same pyramid walk / status semantics as klt_track.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    testing); the tile gathers then use the XLA fallback path.
    """
    from rvio_tpu.ops.klt_iterate import (LANE, fused_tile_shape,
                                          lk_level_pallas)

    TH, TW = fused_tile_shape(win)
    levels = len(prev_pyr) - 1
    N = pts.shape[0]
    Npad = -(-N // LANE) * LANE
    dtype = pts.dtype
    r = win // 2
    wander = float(32 - win) / 2.0 - 1.0   # same bound as klt_track
    on_tpu = (not interpret) and jax.default_backend() in ("tpu", "axon")

    def gather(img, pts_xy):
        return gather_edge_padded_tiles(img, pts_xy, TH, TW, on_tpu)

    def pack(tiles):
        """(N, TH, TW) -> (TH, TW, Npad) lane-packed."""
        t = jnp.transpose(tiles, (1, 2, 0))
        return jnp.pad(t, ((0, 0), (0, 0), (0, Npad - N)))

    guess = pts / (2.0 ** levels)
    status = active
    err = jnp.zeros(N, dtype)

    for lvl in range(levels, -1, -1):
        prev_img = prev_pyr[lvl]
        next_img = next_pyr[lvl]
        H, W = prev_img.shape
        p_lvl = pts / (2.0 ** lvl)

        t_tiles, o0 = gather(prev_img, p_lvl)
        n_tiles, o1 = gather(next_img, guess)

        rb = r + 1 if lvl == 0 else 1
        inb = ((p_lvl[:, 0] > rb) & (p_lvl[:, 0] < W - rb - 1)
               & (p_lvl[:, 1] > rb) & (p_lvl[:, 1] < H - rb - 1))
        status_in = status & inb

        loc0 = (p_lvl - o0.astype(dtype)).astype(jnp.float32)
        gloc = (guess - o1.astype(dtype)).astype(jnp.float32)

        def row(v):
            return jnp.pad(v.astype(jnp.float32), (0, Npad - N))

        scal = jnp.stack([
            row(loc0[:, 1]), row(loc0[:, 0]),
            row(gloc[:, 1]), row(gloc[:, 0]),
            row(gloc[:, 1]), row(gloc[:, 0]),
            row(status_in.astype(jnp.float32)),
            jnp.zeros(Npad, jnp.float32)])

        out = lk_level_pallas(pack(t_tiles.astype(jnp.float32)),
                              pack(n_tiles.astype(jnp.float32)), scal,
                              win=win, max_iters=max_iters, eps=float(eps),
                              min_eig=float(min_eig), wander=wander,
                              interpret=interpret)
        py = out[0, :N].astype(dtype) + o1[:, 1].astype(dtype)
        px = out[1, :N].astype(dtype) + o1[:, 0].astype(dtype)
        alive = out[2, :N] > 0.5
        guess = jnp.stack([px, py], axis=1)
        status = alive

        if lvl > 0:
            guess = guess * 2.0
        else:
            inb2 = ((guess[:, 0] > rb) & (guess[:, 0] < W - rb - 1)
                    & (guess[:, 1] > rb) & (guess[:, 1] < H - rb - 1))
            status = status & inb2
            err = out[4, :N].astype(dtype)

    return guess, status, err


# ---------------------------------------------------------------------------
# Reference formulation (per-iteration gathers) — kept for cross-checking.
# ---------------------------------------------------------------------------

def _patch_coords(center: jnp.ndarray, win: int) -> jnp.ndarray:
    rr = win // 2
    off = jnp.arange(-rr, rr + 1, dtype=center.dtype)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    return center[None, None, :] + jnp.stack([ox, oy], axis=-1)


def _sample_patch(img: jnp.ndarray, center: jnp.ndarray, win: int
                  ) -> jnp.ndarray:
    return bilinear_sample(img, _patch_coords(center, win))


def klt_track_gather(prev_pyr, next_pyr, pts, active, *, win: int = 15,
                     max_iters: int = 30, eps: float = 1e-2,
                     min_eig: float = 1e-3):
    """Direct formulation sampling the full image every iteration."""
    levels = len(prev_pyr) - 1
    N = pts.shape[0]
    dtype = pts.dtype
    area = win * win

    guess = pts / (2.0 ** levels)
    status = active
    err = jnp.zeros(N, dtype)

    for lvl in range(levels, -1, -1):
        prev_img = prev_pyr[lvl]
        next_img = next_pyr[lvl]
        gx_img, gy_img = scharr_gradients(prev_img)
        H, W = prev_img.shape
        p_lvl = pts / (2.0 ** lvl)

        tmpl = jax.vmap(lambda c: _sample_patch(prev_img, c, win))(p_lvl)
        gx = jax.vmap(lambda c: _sample_patch(gx_img, c, win))(p_lvl)
        gy = jax.vmap(lambda c: _sample_patch(gy_img, c, win))(p_lvl)

        gxx = jnp.sum(gx * gx, axis=(1, 2))
        gxy = jnp.sum(gx * gy, axis=(1, 2))
        gyy = jnp.sum(gy * gy, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        meig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (2 * area)
        ok_level = (meig > min_eig) & (det > 1e-12)
        dets = jnp.where(det == 0, 1.0, det)
        inv00 = jnp.where(ok_level, gyy / dets, 0.0)
        inv01 = jnp.where(ok_level, -gxy / dets, 0.0)
        inv11 = jnp.where(ok_level, gxx / dets, 0.0)

        r = win // 2 + 1 if lvl == 0 else 1
        inb = ((p_lvl[:, 0] > r) & (p_lvl[:, 0] < W - r - 1)
               & (p_lvl[:, 1] > r) & (p_lvl[:, 1] < H - r - 1))
        status = status & ok_level & inb

        def body(it, carry):
            g, conv = carry
            cur = jax.vmap(lambda c: _sample_patch(next_img, c, win))(g)
            di = cur - tmpl
            bx = jnp.sum(di * gx, axis=(1, 2))
            by = jnp.sum(di * gy, axis=(1, 2))
            dx = -(inv00 * bx + inv01 * by)
            dy = -(inv01 * bx + inv11 * by)
            step = jnp.stack([dx, dy], axis=-1)
            take = (~conv & status)[:, None]
            g_new = jnp.where(take, g + step, g)
            conv_new = conv | (jnp.sum(step * step, axis=-1) < eps * eps)
            return g_new, conv_new

        guess, _ = jax.lax.fori_loop(
            0, max_iters, body, (guess, jnp.zeros(N, bool)))

        if lvl > 0:
            guess = guess * 2.0
        else:
            inb2 = ((guess[:, 0] > r) & (guess[:, 0] < W - r - 1)
                    & (guess[:, 1] > r) & (guess[:, 1] < H - r - 1))
            status = status & inb2
            cur = jax.vmap(lambda c: _sample_patch(next_img, c, win))(guess)
            err = jnp.mean(jnp.abs(cur - tmpl), axis=(1, 2))

    return guess, status, err
