"""On-device feature lifecycle: the front-end driver.

TPU-native re-design of Tracker (reference: src/rvio/Tracker.cc:179-396).
The reference keeps a list-of-lists tracking history with reusable index
slots (Tracker.h:104-114); here every structure is a fixed-shape array over
N feature slots, and the whole per-frame front-end — KLT, undistortion,
gyro-RANSAC, lifecycle classification, update-batch assembly, detection
refill — is one jitted program with no host round-trips.

Lifecycle rules preserved (Tracker.cc:271-396):
- lost track with history >= nMinTrackingLength  -> type '1' update feature;
- reaching nMaxTrackingLength                    -> type '2' update feature,
  history truncated to the last ceil(L/2) entries (半-window rule) if it got
  into the update budget, else popped by one;
- update batch capped at ceil(N/2), lost features first;
- freed slots refilled from spaced Shi-Tomasi detections admitted by the
  chess-grid occupancy test.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from rvio_tpu.config import RVIOConfig
from rvio_tpu.filter.update import UpdateBatch
from rvio_tpu.frontend.detector import (corner_subpix, find_newer,
                                        grid_top_corners,
                                        nms_masked_response)
from rvio_tpu.frontend.image import build_pyramid, clahe
from rvio_tpu.frontend.klt import klt_track, klt_track_fused
from rvio_tpu.frontend.ransac import gyro_ransac, integrate_gyro_rotation
from rvio_tpu.frontend.undistort import undistort_normalize


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TrackerState:
    """Fixed-shape tracker state carried between frames."""

    pos: jnp.ndarray        # (N, 2) current distorted pixel positions
    hist: jnp.ndarray       # (N, L, 2) undistorted-normalized history
    length: jnp.ndarray     # (N,) int32 measurements in history
    active: jnp.ndarray     # (N,) bool slot in use
    pyramid: tuple          # previous frame's pyramid (tuple of arrays)


def _cam_kwargs(cfg: RVIOConfig):
    c = cfg.camera
    return dict(fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, k1=c.k1, k2=c.k2,
                p1=c.p1, p2=c.p2, k3=c.k3, fisheye=c.is_fisheye)


def make_tracker(cfg: RVIOConfig, dtype=jnp.float32, mesh=None):
    """Build (init_fn, track_fn) jitted front-end entry points.

    init_fn(image) -> TrackerState                       (first frame)
    track_fn(state, image, imu_w, imu_dt, imu_valid, key)
        -> (TrackerState, UpdateBatch, debug dict)

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``feat`` axis — the
    KLT stage (the tracker's only per-feature-heavy stage, ~0.4 of the
    ~1.4 ms frame at the flagship budget) then runs under ``shard_map``
    with the feature axis split over ``feat`` and the pyramids
    replicated.  Feature lanes are independent in KLT, so per-shard
    outputs equal the unsharded ones exactly (tests/test_parallel.py);
    the cheap global stages (RANSAC scoring, lifecycle compaction,
    refill occupancy) stay replicated — sharding them would trade a few
    microseconds of VPU work for all-gathers of the whole state.
    """
    N = cfg.tracker.num_features
    L = cfg.tracker.max_tracking_length
    Lmin = cfg.tracker.min_tracking_length
    F = cfg.tracker.max_update_features
    keep_after_t2 = L - (math.ceil(0.5 * L) - 1)
    min_dist = cfg.tracker.min_distance
    cell = max(4, int(min_dist))
    cell2 = max(4, int(2 * min_dist))
    cam = _cam_kwargs(cfg)
    R_bc = jnp.asarray(cfg.camera.R_bc, dtype)
    levels = cfg.tracker.klt_levels
    use_fused_klt = (cfg.tpu.use_pallas and cfg.tpu.klt_fused
                     and jax.default_backend() in ("tpu", "axon"))

    def preprocess(image):
        img = image.astype(dtype)
        if img.ndim == 3:
            # color input -> BT.601 luma; Camera.RGB picks the channel order
            # (reference: Tracker.cc:183-202 cvtColor RGB2GRAY/BGR2GRAY)
            r, g, b = ((img[..., 0], img[..., 1], img[..., 2])
                       if cfg.camera.is_rgb
                       else (img[..., 2], img[..., 1], img[..., 0]))
            img = 0.299 * r + 0.587 * g + 0.114 * b
        if cfg.tracker.enable_equalizer:
            img = clahe(img, 3.0, 5, use_pallas=cfg.tpu.use_pallas)
        return tuple(build_pyramid(img, levels))

    def detect(img, spacing, refine=True):
        resp = nms_masked_response(img, use_pallas=cfg.tpu.use_pallas)
        pts, valid = grid_top_corners(resp, spacing, N,
                                      cfg.tracker.quality_level,
                                      pre_nms=True)
        if refine:
            pts = corner_subpix(img, pts, win=int(min_dist) // 2,
                                iters=cfg.tracker.subpix_iters,
                                use_pallas=cfg.tpu.use_pallas)
        return pts, valid

    @jax.jit
    def init_fn(image) -> Tuple[TrackerState, jnp.ndarray]:
        pyr = preprocess(image)
        pts, valid = detect(pyr[0], cell)
        k = min(N, pts.shape[0])
        pos = jnp.zeros((N, 2), dtype).at[:k].set(pts[:k])
        active = jnp.zeros(N, bool).at[:k].set(valid[:k])
        zn = undistort_normalize(pos, **cam).astype(dtype)
        hist = jnp.zeros((N, L, 2), dtype)
        hist = hist.at[:, 0, :].set(jnp.where(active[:, None], zn, 0.0))
        length = jnp.where(active, 1, 0).astype(jnp.int32)
        return TrackerState(pos=pos, hist=hist, length=length, active=active,
                            pyramid=pyr), jnp.sum(active.astype(jnp.int32))

    def _klt(prev_pyr, next_pyr, pos, active):
        if use_fused_klt:
            return klt_track_fused(
                list(prev_pyr), list(next_pyr), pos, active,
                win=cfg.tracker.klt_window,
                max_iters=cfg.tracker.klt_max_iters,
                eps=cfg.tracker.klt_eps, min_eig=cfg.tracker.klt_min_eig)
        return klt_track(
            list(prev_pyr), list(next_pyr), pos, active,
            win=cfg.tracker.klt_window,
            max_iters=cfg.tracker.klt_max_iters,
            eps=cfg.tracker.klt_eps, min_eig=cfg.tracker.klt_min_eig,
            use_pallas=cfg.tpu.use_pallas)

    if mesh is not None and "feat" in mesh.axis_names:
        from functools import partial as _partial
        from jax import shard_map
        from jax.sharding import PartitionSpec as _P
        n_shards = mesh.shape["feat"]
        if N % n_shards:
            raise ValueError(f"num_features {N} must divide feat={n_shards}")
        pyr_spec = tuple(_P() for _ in range(levels + 1))
        _klt = _partial(
            shard_map, mesh=mesh,
            in_specs=(pyr_spec, pyr_spec, _P("feat"), _P("feat")),
            out_specs=(_P("feat"), _P("feat"), _P("feat")),
            check_vma=False)(_klt)

    @jax.jit
    def track_fn(ts: TrackerState, image, imu_w, imu_dt, imu_valid, key):
        pyr = preprocess(image)

        # --- KLT (Tracker.cc:237-244) ---
        new_pos, status, err = _klt(tuple(ts.pyramid), tuple(pyr),
                                    ts.pos, ts.active)

        zn = undistort_normalize(new_pos, **cam).astype(dtype)

        # --- gyro-aided RANSAC (Tracker.cc:264) ---
        # last history entry via an exact one-hot contraction (a
        # take_along_axis gather serializes per row on TPU)
        prev_idx = jnp.clip(ts.length - 1, 0, L - 1)
        ohp = (prev_idx[:, None] == jnp.arange(L)).astype(dtype)   # (N, L)
        prev_zn = jnp.einsum("nl,nlc->nc", ohp, ts.hist,
                             precision=jax.lax.Precision.HIGHEST)
        ones = jnp.ones((N, 1), dtype)
        p1h = jnp.concatenate([prev_zn, ones], axis=1)
        p2h = jnp.concatenate([zn, ones], axis=1)
        R_cam = integrate_gyro_rotation(imu_w.astype(dtype),
                                        imu_dt.astype(dtype), imu_valid,
                                        R_bc, cfg.imu.small_angle)
        inlier = gyro_ransac(key, p1h, p2h, status & ts.active, R_cam,
                             cfg.tracker.inlier_threshold,
                             n_hypotheses=cfg.tracker.ransac_iterations,
                             use_sampson=cfg.tracker.use_sampson)

        tracked = ts.active & inlier
        lost = ts.active & ~inlier

        # --- update batch assembly (Tracker.cc:271-342) ---
        # Budget selection: type-1 (lost) features first by slot index, then
        # type-2, capped at F.  Stable compaction by cumsum rank, realized
        # as a one-hot permutation MATMUL — an argsort over N is a bitonic
        # sort on TPU and a scatter serializes (~20 us per scatter on v5e);
        # the (F, N) selection matrix rides the MXU in one op.  HIGHEST
        # precision makes the one-hot selection exact in f32 (each output
        # row is 1.0 * one source row).
        type1 = lost & (ts.length >= Lmin)
        at_max = tracked & (ts.length == L)
        n_type1 = jnp.sum(type1.astype(jnp.int32))
        r1 = jnp.cumsum(type1.astype(jnp.int32)) - 1          # rank in type1
        r2 = n_type1 + jnp.cumsum(at_max.astype(jnp.int32)) - 1
        pos = jnp.where(type1, r1, jnp.where(at_max, r2, F))  # F -> dropped
        in_budget_any = (type1 | at_max) & (pos < F)
        ranks = jnp.arange(F, dtype=jnp.int32)
        selb = ((ranks[:, None] == pos[None, :])
                & in_budget_any[None, :]).astype(dtype)       # (F, N)
        n_sel = jnp.minimum(n_type1 + jnp.sum(at_max.astype(jnp.int32)), F)
        sel_valid = ranks < n_sel
        hp = jax.lax.dot(selb, ts.hist.reshape(N, L * 2),
                         precision=jax.lax.Precision.HIGHEST)
        tl = jax.lax.dot(selb, ts.length.astype(dtype)[:, None],
                         precision=jax.lax.Precision.HIGHEST)[:, 0]
        batch = UpdateBatch(
            meas=hp.reshape(F, L, 2),
            track_len=tl.astype(jnp.int32),
            is_type2=sel_valid & (ranks >= n_type1),
            valid=sel_valid)
        # which at_max slots made the budget
        in_budget = at_max & (pos < F)

        # --- history update (Tracker.cc:305-342) ---
        # per-slot front-shift: type-2 in budget -> drop to keep_after_t2
        # entries; type-2 over budget -> drop 1; others -> 0.  Only these
        # THREE shift values exist, so the per-row gather is a 3-way
        # select between statically shifted copies (clamp-at-end
        # semantics match the clipped gather it replaces).
        def shifted(s):
            if s == 0:
                return ts.hist
            body = ts.hist[:, s:]
            tail = jnp.repeat(ts.hist[:, -1:], s, axis=1)
            return jnp.concatenate([body, tail], axis=1)

        s2 = L - keep_after_t2
        hist = jnp.where((at_max & in_budget)[:, None, None],
                         shifted(s2) if s2 != 1 else shifted(1),
                         jnp.where(at_max[:, None, None], shifted(1),
                                   ts.hist))
        shift = jnp.where(at_max & in_budget, s2,
                          jnp.where(at_max, 1, 0)).astype(jnp.int32)
        new_len = ts.length - shift
        # append the new measurement for tracked slots: a per-row dynamic
        # write, expressed as a compare-select over the (N, L) grid instead
        # of a scatter (scatters serialize on TPU; this is one fused
        # elementwise op over 6 K elements)
        app_idx = jnp.clip(new_len, 0, L - 1)
        app_here = (jnp.arange(L)[None, :] == app_idx[:, None]) \
            & tracked[:, None]                                # (N, L)
        hist = jnp.where(app_here[:, :, None], zn[:, None, :], hist)
        new_len = jnp.where(tracked, new_len + 1, 0).astype(jnp.int32)
        active = tracked
        pos = jnp.where(tracked[:, None], new_pos, 0.0)

        # --- refill (Tracker.cc:344-387) ---
        cand_pts, cand_valid = detect(pyr[0], cell2,
                                      refine=cfg.tracker.subpix_refill)
        admit = find_newer(cand_pts, cand_valid, pos, active,
                           img_w=cfg.camera.width, img_h=cfg.camera.height,
                           block_w=cfg.tracker.block_size_x,
                           block_h=cfg.tracker.block_size_y,
                           min_dist=min_dist, max_feats=N)
        free = ~active
        n_free = jnp.sum(free.astype(jnp.int32))
        n_admit = jnp.sum(admit.astype(jnp.int32))
        # pair the i-th free slot with the i-th admitted candidate (stable,
        # slot/candidate-index order — the reference's FindNewer fill
        # order).  The pairing is a rank-equality one-hot (N, C) applied as
        # a matmul — the former dst/src compaction + 4 scatters serialized
        # at ~20 us each on v5e (~0.1 ms/frame of the in-scan pipeline);
        # this is two MXU ops + selects.  Pair ranks cap at
        # min(n_free, n_admit) by construction.
        rf = jnp.cumsum(free.astype(jnp.int32)) - 1           # rank of slot
        ra = jnp.cumsum(admit.astype(jnp.int32)) - 1          # rank of cand
        pair = ((rf[:, None] == ra[None, :])
                & free[:, None] & admit[None, :])             # (N, C)
        fill_slot = jnp.any(pair, axis=1)
        pairm = pair.astype(dtype)
        # Sanitize BEFORE the matmul: the combine touches ALL C candidates
        # (0-weight included), so one non-finite candidate entry would
        # poison every refilled slot via 0 * nan.  The detector emits
        # finite in-bounds coords today, but that invariant is load-bearing
        # here — make it local instead of relying on it.
        cand_f = jnp.where(jnp.isfinite(cand_pts), cand_pts, 0.0)
        cand_zn = undistort_normalize(cand_f, **cam).astype(dtype)
        cand_zn = jnp.where(jnp.isfinite(cand_zn), cand_zn, 0.0)
        new_pts = jax.lax.dot(pairm, cand_f.astype(dtype),
                              precision=jax.lax.Precision.HIGHEST)
        new_zn = jax.lax.dot(pairm, cand_zn,
                             precision=jax.lax.Precision.HIGHEST)
        pos = jnp.where(fill_slot[:, None], new_pts, pos)
        active = active | fill_slot
        hist = hist.at[:, 0].set(
            jnp.where(fill_slot[:, None], new_zn, hist[:, 0]))
        new_len = jnp.where(fill_slot, 1, new_len)

        debug = {"n_tracked": jnp.sum(tracked.astype(jnp.int32)),
                 "n_lost": jnp.sum(lost.astype(jnp.int32)),
                 "n_new": jnp.minimum(n_free, n_admit),
                 "klt_err": err}
        return (TrackerState(pos=pos, hist=hist, length=new_len,
                             active=active, pyramid=pyr), batch, debug)

    return init_fn, track_fn
