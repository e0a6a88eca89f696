"""Batched pyramidal Lucas-Kanade optical flow — TPU speed-of-light design.

Replaces cv::calcOpticalFlowPyrLK (reference: src/rvio/Tracker.cc:237-244 —
15x15 window, 3 pyramid levels, 30 iterations, eps 1e-2, minEig 1e-3).

Design: per-iteration *gathers* are the TPU killer, so they are hoisted out
entirely.  Per pyramid level, a (TILE x TILE) neighborhood around each
feature is gathered ONCE (prev-image template + gradients, next-image
search tile).  Bilinear sampling is separable, so every iteration's patch
resample becomes two small matmuls per feature:

    patch = Wy(frac) @ tile @ Wx(frac)^T        (N, win, win)

with Wy/Wx banded interpolation matrices built from iota comparisons (VPU).
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

TILE = 32  # search/template tile side; margin = (TILE - win)/2 - 1 px


def _gather_tiles(img: jnp.ndarray, origin: jnp.ndarray, tile: int
                  ) -> jnp.ndarray:
    """Gather (N, tile, tile) neighborhoods at integer origins (clamped)."""
    H, W = img.shape
    oy = jnp.clip(origin[:, 1], 0, H - tile)
    ox = jnp.clip(origin[:, 0], 0, W - tile)
    rows = oy[:, None] + jnp.arange(tile)[None, :]
    cols = ox[:, None] + jnp.arange(tile)[None, :]
    return img[rows[:, :, None], cols[:, None, :]]


def _interp_weights(local: jnp.ndarray, win: int, tile: int) -> jnp.ndarray:
    """Banded bilinear row-weights: (N, win, tile).

    local: (N,) fractional coordinate of the patch center within the tile.
    Row i interpolates position local - win//2 + i.
    """
    r = win // 2
    pos = local[:, None] + (jnp.arange(win) - r)[None, :]      # (N, win)
    f = jnp.floor(pos)
    frac = (pos - f).astype(local.dtype)
    f = jnp.clip(f.astype(jnp.int32), 0, tile - 2)
    t = jnp.arange(tile)[None, None, :]
    w0 = (t == f[:, :, None]).astype(local.dtype) * (1.0 - frac)[:, :, None]
    w1 = (t == (f + 1)[:, :, None]).astype(local.dtype) * frac[:, :, None]
    return w0 + w1


def _sample_patches(tiles: jnp.ndarray, Wy: jnp.ndarray, Wx: jnp.ndarray
                    ) -> jnp.ndarray:
    """(N,T,T), (N,win,T), (N,win,T) -> (N,win,win) via two batched matmuls."""
    tmp = jnp.einsum("nit,nts->nis", Wy, tiles)
    return jnp.einsum("nis,njs->nij", tmp, Wx)


def klt_track(prev_pyr: List[jnp.ndarray], next_pyr: List[jnp.ndarray],
              pts: jnp.ndarray, active: jnp.ndarray, *, win: int = 15,
              max_iters: int = 30, eps: float = 1e-2,
              min_eig: float = 1e-3) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track points from prev to next image through the pyramid.

    pts: (N, 2) pixel coords in the full-resolution previous image.
    active: (N,) bool — inactive lanes are skipped (status False).
    Returns (new_pts (N,2), status (N,), err (N,)).
    """
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
        gx_img, gy_img = scharr_gradients(prev_img)
        H, W = prev_img.shape
        p_lvl = pts / (2.0 ** lvl)

        # --- template tiles (gathered once) ---
        o0 = (jnp.round(p_lvl).astype(jnp.int32) - TILE // 2)
        o0 = jnp.stack([jnp.clip(o0[:, 0], 0, max(W - TILE, 0)),
                        jnp.clip(o0[:, 1], 0, max(H - TILE, 0))], axis=1)
        t_img = _gather_tiles(prev_img, o0, TILE)
        t_gx = _gather_tiles(gx_img, o0, TILE)
        t_gy = _gather_tiles(gy_img, o0, TILE)

        loc0 = p_lvl - o0.astype(dtype)
        Wy0 = _interp_weights(loc0[:, 1], win, TILE)
        Wx0 = _interp_weights(loc0[:, 0], win, TILE)
        tmpl = _sample_patches(t_img, Wy0, Wx0)
        gx = _sample_patches(t_gx, Wy0, Wx0)
        gy = _sample_patches(t_gy, Wy0, Wx0)

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
        o1 = (jnp.round(guess).astype(jnp.int32) - TILE // 2)
        o1 = jnp.stack([jnp.clip(o1[:, 0], 0, max(W - TILE, 0)),
                        jnp.clip(o1[:, 1], 0, max(H - TILE, 0))], axis=1)
        n_tiles = _gather_tiles(next_img, o1, TILE)
        o1f = o1.astype(dtype)
        margin_lo = float(r)
        margin_hi = float(TILE - r - 2)

        def cond(carry):
            g, it, conv, alive = carry
            return (it < max_iters) & jnp.any(~conv & alive)

        def body(carry):
            g, it, conv, alive = carry
            loc = g - o1f
            in_tile = ((loc[:, 0] >= margin_lo) & (loc[:, 0] <= margin_hi)
                       & (loc[:, 1] >= margin_lo) & (loc[:, 1] <= margin_hi))
            alive = alive & in_tile
            locc = jnp.clip(loc, margin_lo, margin_hi)
            Wy = _interp_weights(locc[:, 1], win, TILE)
            Wx = _interp_weights(locc[:, 0], win, TILE)
            cur = _sample_patches(n_tiles, Wy, Wx)
            di = cur - tmpl
            bx = jnp.sum(di * gx, axis=(1, 2))
            by = jnp.sum(di * gy, axis=(1, 2))
            dx = -(inv00 * bx + inv01 * by)
            dy = -(inv01 * bx + inv11 * by)
            step = jnp.stack([dx, dy], axis=-1)
            take = (~conv & alive)[:, None]
            g_new = jnp.where(take, g + step, g)
            conv_new = conv | (jnp.sum(step * step, axis=-1) < eps * eps)
            return g_new, it + 1, conv_new, alive

        conv0 = jnp.zeros(N, bool)
        guess, _, _, alive = jax.lax.while_loop(
            cond, body, (guess, jnp.int32(0), conv0, status))
        status = status & alive

        if lvl > 0:
            guess = guess * 2.0
        else:
            inb2 = ((guess[:, 0] > rb) & (guess[:, 0] < W - rb - 1)
                    & (guess[:, 1] > rb) & (guess[:, 1] < H - rb - 1))
            status = status & inb2
            loc = jnp.clip(guess - o1f, margin_lo, margin_hi)
            Wy = _interp_weights(loc[:, 1], win, TILE)
            Wx = _interp_weights(loc[:, 0], win, TILE)
            cur = _sample_patches(n_tiles, Wy, Wx)
            err = jnp.mean(jnp.abs(cur - tmpl), axis=(1, 2))

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

        def cond(carry):
            g, it, conv = carry
            return (it < max_iters) & jnp.any(~conv & status)

        def body(carry):
            g, it, conv = carry
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
            return g_new, it + 1, conv_new

        guess, _, _ = jax.lax.while_loop(
            cond, body, (guess, jnp.int32(0), jnp.zeros(N, bool)))

        if lvl > 0:
            guess = guess * 2.0
        else:
            inb2 = ((guess[:, 0] > r) & (guess[:, 0] < W - r - 1)
                    & (guess[:, 1] > r) & (guess[:, 1] < H - r - 1))
            status = status & inb2
            cur = jax.vmap(lambda c: _sample_patch(next_img, c, win))(guess)
            err = jnp.mean(jnp.abs(cur - tmpl), axis=(1, 2))

    return guess, status, err
