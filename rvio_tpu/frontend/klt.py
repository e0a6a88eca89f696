"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for cv::calcOpticalFlowPyrLK
(reference: src/rvio/Tracker.cc:237-244 — 15x15 window, 3 pyramid levels,
30 iterations, eps 1e-2, minEig 1e-3).  All N features iterate together:
per level, the template patch + gradient normal matrix G come from the
previous image (computed once), then the 2x2 solve iterates with masked
convergence.  A batch-level while_loop exits as soon as every feature has
converged, recovering most of OpenCV's per-feature early-exit saving.

The Pallas kernel version of the inner sampling loop lives in
rvio_tpu/ops/; this XLA version is the reference implementation and the
fallback (identical math).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from rvio_tpu.frontend.image import bilinear_sample, scharr_gradients


def _patch_coords(center: jnp.ndarray, win: int) -> jnp.ndarray:
    """(win, win, 2) absolute coords of a patch around one center (x, y)."""
    r = win // 2
    off = jnp.arange(-r, r + 1, dtype=center.dtype)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    return center[None, None, :] + jnp.stack([ox, oy], axis=-1)


def _sample_patch(img: jnp.ndarray, center: jnp.ndarray, win: int
                  ) -> jnp.ndarray:
    return bilinear_sample(img, _patch_coords(center, win))


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

    guess = pts / (2.0 ** levels)        # start at the coarsest level
    status = active
    err = jnp.zeros(N, dtype)

    for lvl in range(levels, -1, -1):
        prev_img = prev_pyr[lvl]
        next_img = next_pyr[lvl]
        gx_img, gy_img = scharr_gradients(prev_img)
        H, W = prev_img.shape
        p_lvl = pts / (2.0 ** lvl)

        # template patch + gradients at the feature position in prev image
        tmpl = jax.vmap(lambda c: _sample_patch(prev_img, c, win))(p_lvl)
        gx = jax.vmap(lambda c: _sample_patch(gx_img, c, win))(p_lvl)
        gy = jax.vmap(lambda c: _sample_patch(gy_img, c, win))(p_lvl)

        gxx = jnp.sum(gx * gx, axis=(1, 2))
        gxy = jnp.sum(gx * gy, axis=(1, 2))
        gyy = jnp.sum(gy * gy, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        # min eigenvalue of G / window area (OpenCV's minEigThreshold check)
        tr = gxx + gyy
        meig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (2 * area)
        ok_level = (meig > min_eig) & (det > 1e-12)
        inv00 = jnp.where(ok_level, gyy / jnp.where(det == 0, 1.0, det), 0.0)
        inv01 = jnp.where(ok_level, -gxy / jnp.where(det == 0, 1.0, det), 0.0)
        inv11 = jnp.where(ok_level, gxx / jnp.where(det == 0, 1.0, det), 0.0)

        # in-bounds check for the template (OpenCV drops edge features)
        r = win // 2 + 1
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

        conv0 = jnp.zeros(N, bool)
        guess, _, _ = jax.lax.while_loop(cond, body, (guess, jnp.int32(0), conv0))

        if lvl > 0:
            guess = guess * 2.0
        else:
            # final status: target patch must be inside the image
            inb2 = ((guess[:, 0] > r) & (guess[:, 0] < W - r - 1)
                    & (guess[:, 1] > r) & (guess[:, 1] < H - r - 1))
            status = status & inb2
            cur = jax.vmap(lambda c: _sample_patch(next_img, c, win))(guess)
            err = jnp.mean(jnp.abs(cur - tmpl), axis=(1, 2))

    return guess, status, err
