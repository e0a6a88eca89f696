"""Shi-Tomasi corner detection with grid-based selection + subpixel refine.

TPU-native equivalent of FeatureDetector (reference:
src/rvio/FeatureDetector.cc) and the cv::goodFeaturesToTrack +
cv::cornerSubPix pair it wraps:

- min-eigenvalue response map (Sobel gradients, 3x3 block sum);
- quality threshold = nQualLvl * max response (goodFeaturesToTrack rule);
- min-distance enforcement recast as per-cell argmax over a minDist grid
  plus suppression by stronger neighbors — the sequential greedy loop
  becomes one parallel pass (the reference's chess-grid FindNewer,
  FeatureDetector.cc:78-150, is already block-structured: a natural tiling);
- batched iterative cornerSubPix refinement (FeatureDetector.cc:66-71);
- FindNewer admission: block occupancy < 75% of the per-block budget,
  min-distance from existing corners and from block borders.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rvio_tpu.frontend.image import sobel_gradients, box_filter


def shi_tomasi_response(img: jnp.ndarray, block: int = 3,
                        use_pallas: bool = True) -> jnp.ndarray:
    """Min-eigenvalue corner response (cv::cornerMinEigenVal semantics).

    A 2-px border is zeroed in every path: goodFeaturesToTrack ignores a
    border margin, grid_top_corners suppresses >= 4 px anyway, and it
    makes the XLA and Pallas paths bitwise-comparable on the full map.

    On TPU f32 the whole chain runs as one fused Pallas kernel
    (ops/shi_tomasi.py) — the XLA chain below is ~15 full-image stages
    (~0.18 ms/frame in-scan at VGA); the kernel is one HBM read + write.
    The XLA path remains the CPU/f64 oracle.
    """
    if (use_pallas and block == 3 and img.dtype == jnp.float32
            and jax.default_backend() in ("tpu", "axon")):
        from rvio_tpu.ops.shi_tomasi import shi_tomasi_pallas
        return shi_tomasi_pallas(img)
    ix, iy = sobel_gradients(img)
    sxx = box_filter(ix * ix, block)
    sxy = box_filter(ix * iy, block)
    syy = box_filter(iy * iy, block)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))
    resp = (tr - disc) * 0.5
    H, W = img.shape
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    inner = ((row >= 2) & (row < H - 2) & (col >= 2) & (col < W - 2))
    return jnp.where(inner, resp, 0.0)


def nms_masked_response(img: jnp.ndarray, use_pallas: bool = True
                        ) -> jnp.ndarray:
    """3x3-local-max-masked Shi-Tomasi response (-inf at non-maxima).

    On TPU f32 the response AND the 8-neighbor >=-test run fused in one
    Pallas kernel (ops/shi_tomasi.shi_tomasi_nms_pallas) — the separate
    NMS pass was 8 full-map padded compares (~10 us/frame of latency +
    traffic).  The XLA path below is the oracle; the two agree bitwise on
    the interior grid_top_corners keeps (border >= 4).
    """
    if (use_pallas and img.dtype == jnp.float32
            and jax.default_backend() in ("tpu", "axon")):
        from rvio_tpu.ops.shi_tomasi import shi_tomasi_nms_pallas
        return shi_tomasi_nms_pallas(img)
    m = shi_tomasi_response(img, use_pallas=use_pallas)
    H, W = m.shape
    mpad = jnp.pad(m, 1, constant_values=-jnp.inf)
    local_max = jnp.ones_like(m, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            local_max &= m >= mpad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
    return jnp.where(local_max, m, -jnp.inf)


def grid_top_corners(resp: jnp.ndarray, cell: int, max_corners: int,
                     quality_level: float, border: int = 4,
                     pre_nms: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spaced corner selection: per-cell argmax + stronger-neighbor NMS.

    Partitions the response map into (cell x cell) tiles; keeps each tile's
    peak if it (a) clears the quality threshold, (b) beats every peak within
    ``cell`` pixels in the 8 neighboring tiles (strict tie-break by index),
    guaranteeing >= cell*(something) spacing like goodFeaturesToTrack's
    minDistance loop but fully parallel.  Returns (pts (K,2) float32 xy,
    valid (K,)) with K = number of cells, sorted by response (strongest
    first) and truncated/padded to ``max_corners``.

    ``pre_nms``: the input is already the 3x3-local-max-masked response
    (:func:`nms_masked_response`, -inf at non-maxima) — the local-NMS pass
    here is skipped.  The quality threshold is unaffected: the global max
    is itself a local max, so max(masked) == max(raw).
    """
    H, W = resp.shape
    if pre_nms:
        m = resp
        thr = quality_level * jnp.max(m)
        cand = jnp.where(m > thr, m, -jnp.inf)
    else:
        # 3x3 local NMS first (goodFeaturesToTrack dilate step)
        m = resp
        mpad = jnp.pad(m, 1, constant_values=-jnp.inf)
        local_max = jnp.ones_like(m, bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                local_max &= m >= mpad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        thr = quality_level * jnp.max(m)
        cand = jnp.where(local_max & (m > thr), m, -jnp.inf)
    # suppress the image border
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    inb = ((row >= border) & (row < H - border)
           & (col >= border) & (col < W - border))
    cand = jnp.where(inb, cand, -jnp.inf)

    gh = H // cell
    gw = W // cell
    crop = cand[:gh * cell, :gw * cell]
    # Separable per-cell argmax (no (gh,cell,gw,cell) transpose — that
    # relayout alone cost ~20 us/frame at VGA): reduce lanes within each
    # cell column first, then sublanes within each cell row.  Tie-breaks
    # match the flattened row-major argmax exactly (earliest row, then
    # earliest column within the row).
    c3 = crop.reshape(gh * cell, gw, cell)
    colmax = jnp.max(c3, axis=2)                       # (H', gw)
    argcol = jnp.argmax(c3, axis=2)                    # (H', gw)
    r3 = colmax.reshape(gh, cell, gw)
    best_val = jnp.max(r3, axis=1).reshape(-1)         # (gh*gw,)
    argrow = jnp.argmax(r3, axis=1)                    # (gh, gw)
    acr = jnp.take_along_axis(argcol.reshape(gh, cell, gw),
                              argrow[:, None, :], axis=1)[:, 0, :]
    by = (argrow + jnp.arange(gh)[:, None] * cell).reshape(-1)
    bx = (acr + jnp.arange(gw)[None, :] * cell).reshape(-1)
    pts = jnp.stack([bx, by], axis=-1).astype(resp.dtype)

    # suppression by stronger peaks within `cell` px in neighboring tiles
    gy = jnp.arange(gh * gw) // gw
    gx = jnp.arange(gh * gw) % gw
    keep = best_val > -jnp.inf
    val_grid = best_val.reshape(gh, gw)
    y_grid = by.reshape(gh, gw)
    x_grid = bx.reshape(gh, gw)
    vpad = jnp.pad(val_grid, 1, constant_values=-jnp.inf)
    ypad = jnp.pad(y_grid, 1)
    xpad = jnp.pad(x_grid, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nv = vpad[1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            ny = ypad[1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            nx = xpad[1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            d2 = ((y_grid - ny) ** 2 + (x_grid - nx) ** 2).astype(resp.dtype)
            stronger = (nv > val_grid) | ((nv == val_grid)
                                          & ((ny * W + nx) < (y_grid * W + x_grid)))
            conflict = (d2 < cell * cell) & stronger & (nv > -jnp.inf)
            keep &= ~conflict.reshape(-1)

    score = jnp.where(keep, best_val, -jnp.inf)
    order = jnp.argsort(-score)
    k = min(max_corners, pts.shape[0])
    sel = order[:k]
    return pts[sel], score[sel] > -jnp.inf


def corner_subpix(img: jnp.ndarray, pts: jnp.ndarray, win: int = 7,
                  iters: int = 10, use_pallas: bool = False) -> jnp.ndarray:
    """Batched cv::cornerSubPix: gradient-product centroid iteration.

    win: half-window (reference uses floor(minDist/2)=7 -> 15x15 window,
    FeatureDetector.cc:68).  Iterations resample from per-corner tiles
    gathered once (the klt machinery) — per-iteration image gathers are
    ~ms-scale scalar loops on TPU.
    """
    from rvio_tpu.frontend.klt import (_tile_gather_dispatch, _sample_patches,
                                       TILE, TILE_H)

    if use_pallas and jax.default_backend() in ("tpu", "axon"):
        # fused lane-packed kernel: the XLA iteration loop costs ~0.3 ms
        # per frame in per-iteration patch gathers at N=200 on v5e
        from rvio_tpu.ops.klt_iterate import subpix_refine_pallas
        return subpix_refine_pallas(img, pts, win=win, iters=iters)

    size = 2 * win + 1
    N = pts.shape[0]
    dtype = pts.dtype
    off = jnp.arange(-win, win + 1, dtype=dtype)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    # Gaussian-ish weight mask (OpenCV uses an exponential taper)
    wmask = jnp.exp(-(ox ** 2 + oy ** 2) / (2.0 * (win / 2.0) ** 2))

    gather = _tile_gather_dispatch(use_pallas)
    o_ideal = jnp.stack(
        [jnp.round(pts[:, 0]).astype(jnp.int32) - TILE // 2,
         jnp.round(pts[:, 1]).astype(jnp.int32) - TILE_H // 2], axis=1)
    tiles, o = gather(img, o_ideal)
    of = o.astype(dtype)
    ylim = float(tiles.shape[1] - 1)
    xlim = float(tiles.shape[2] - 1)

    def body(it, c):
        # one (size+2)^2 patch per iteration; central differences are just
        # shifted slices of it (bilinear sampling commutes with the shift),
        # replacing 4 separate patch resamples.
        locy = jnp.clip(c[:, 1] - of[:, 1], 0.0, ylim)
        locx = jnp.clip(c[:, 0] - of[:, 0], 0.0, xlim)
        p = _sample_patches(tiles, locy, locx, size + 2)
        gx = (p[:, 1:-1, 2:] - p[:, 1:-1, :-2]) * 0.5
        gy = (p[:, 2:, 1:-1] - p[:, :-2, 1:-1]) * 0.5
        gxx = jnp.sum(wmask * gx * gx, axis=(1, 2))
        gxy = jnp.sum(wmask * gx * gy, axis=(1, 2))
        gyy = jnp.sum(wmask * gy * gy, axis=(1, 2))
        bx = jnp.sum(wmask * (gx * gx * ox + gx * gy * oy), axis=(1, 2))
        by = jnp.sum(wmask * (gx * gy * ox + gy * gy * oy), axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        safe = jnp.abs(det) > 1e-12
        dets = jnp.where(safe, det, 1.0)
        dx = jnp.where(safe, (gyy * bx - gxy * by) / dets, 0.0)
        dy = jnp.where(safe, (-gxy * bx + gxx * by) / dets, 0.0)
        step = jnp.clip(jnp.stack([dx, dy], axis=-1), -1.0, 1.0)
        return c + step

    return jax.lax.fori_loop(0, iters, body, pts)


def find_newer(cand_pts: jnp.ndarray, cand_valid: jnp.ndarray,
               ref_pts: jnp.ndarray, ref_valid: jnp.ndarray, *,
               img_w: int, img_h: int, block_w: int, block_h: int,
               min_dist: float, max_feats: int) -> jnp.ndarray:
    """Admission mask for new corners (reference FindNewer semantics).

    cand_pts: (C,2) detected candidates; ref_pts: (N,2) currently tracked.
    A candidate is admitted iff its chess-grid block is < 75% full, it is
    >= min_dist from every tracked corner in that block, and >= min_dist
    from the block borders (FeatureDetector.cc:97-150).  Candidate-to-
    candidate spacing is pre-enforced by detection at 2x min distance
    (Tracker.cc:350 passes s=2).
    """
    gw = img_w // block_w
    gh = img_h // block_h
    offx = 0.5 * (img_w - gw * block_w)
    offy = 0.5 * (img_h - gh * block_h)
    max_per_block = max_feats / (gw * gh)

    def block_of(pts):
        bx = jnp.floor((pts[:, 0] - offx) / block_w).astype(jnp.int32)
        by = jnp.floor((pts[:, 1] - offy) / block_h).astype(jnp.int32)
        inside = ((pts[:, 0] > offx) & (pts[:, 1] > offy)
                  & (pts[:, 0] < img_w - offx) & (pts[:, 1] < img_h - offy)
                  & (bx >= 0) & (bx < gw) & (by >= 0) & (by < gh))
        return by * gw + bx, inside

    cb, c_in = block_of(cand_pts)
    rb, r_in = block_of(ref_pts)
    rb = jnp.where(ref_valid & r_in, rb, -1)

    # occupancy per block from tracked features
    n_blocks = gw * gh
    occ = jnp.sum(jax.nn.one_hot(jnp.clip(rb, 0, n_blocks - 1), n_blocks,
                                 dtype=jnp.float32)
                  * (rb >= 0)[:, None].astype(jnp.float32), axis=0)

    # distance of each candidate to every tracked corner in the same block
    d2 = jnp.sum((cand_pts[:, None, :] - ref_pts[None, :, :]) ** 2, axis=-1)
    same_block = (cb[:, None] == rb[None, :]) & (rb >= 0)[None, :]
    too_close = jnp.any(same_block & (d2 <= min_dist ** 2), axis=1)

    # distance from block borders
    bxf = jnp.floor((cand_pts[:, 0] - offx) / block_w)
    byf = jnp.floor((cand_pts[:, 1] - offy) / block_h)
    xl = bxf * block_w + offx
    yt = byf * block_h + offy
    near_border = ((jnp.abs(cand_pts[:, 0] - xl) < min_dist)
                   | (jnp.abs(cand_pts[:, 0] - (xl + block_w)) < min_dist)
                   | (jnp.abs(cand_pts[:, 1] - yt) < min_dist)
                   | (jnp.abs(cand_pts[:, 1] - (yt + block_h)) < min_dist))

    # within-frame capacity: rank candidates per block; admit while the
    # block stays under 75% of its budget (incremental count, parallelized
    # as occupancy + rank < cap)
    cand_ok = cand_valid & c_in & ~too_close & ~near_border
    cb_safe = jnp.clip(cb, 0, n_blocks - 1)
    onehot = jax.nn.one_hot(cb_safe, n_blocks, dtype=jnp.float32) \
        * cand_ok[:, None].astype(jnp.float32)
    rank = jnp.cumsum(onehot, axis=0) - onehot       # prior admits per block
    my_rank = jnp.take_along_axis(rank, cb_safe[:, None], axis=1)[:, 0]
    my_occ = occ[cb_safe]
    under_cap = (my_occ + my_rank) < 0.75 * max_per_block
    return cand_ok & under_cap
