"""Batched multi-sequence replay: a dataset through one chip in lockstep.

The reference evaluates EuRoC one `rosbag play` at a time (reference:
README.md:70-86).  Replaying the full set is the natural batched workload
(BASELINE.json configs: "EuRoC V1/V2 easy+medium set, fixed 200-feature
window, single chip"): B sequences advance frame-by-frame through the
vmapped image-chunk scan, so every tracker kernel and filter op runs
batched and the chip's throughput is shared across the set instead of
latency-bound on one 200-feature stream.

Sequences may differ in length and initialization time; shorter/exhausted
streams are padded with ``ok=False`` frames whose results are dropped and
whose carries stay frozen (same masking the single-sequence scan uses for
degenerate frames).  Per-sequence outputs are bitwise what the
single-sequence driver produces for the same seed.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rvio_tpu.config import RVIOConfig
from rvio_tpu.frontend.tracker import make_tracker
from rvio_tpu.runtime.driver import DriverResult, bundle_imu
from rvio_tpu.runtime.image_driver import (_find_init_frame,
                                           make_batched_image_chunk_scan)


def _seq_image_getter(seq):
    mem = getattr(seq, "images", None)
    if mem is not None:
        return lambda k: np.asarray(mem[k])
    from rvio_tpu.dataio.euroc import load_image
    return lambda k: load_image(seq.cam_files[k])


def run_sequence_set(cfg: RVIOConfig, seqs: Sequence, dtype=jnp.float32,
                     chunk_size: int = 32, seed: int = 0,
                     progress: bool = False,
                     max_frames: Optional[int] = None) -> List[DriverResult]:
    """Replay B sequences batched on one chip; one DriverResult each.

    ``seqs`` entries need imu_t/imu_w/imu_a/cam_t plus frames as either
    in-memory ``images`` (rosbag loader) or ``cam_files`` (ASL loader).
    All sequences must share the camera geometry of ``cfg`` (static shapes).
    """
    B = len(seqs)
    if B == 0:
        return []
    K = cfg.tpu.imu_block
    H, W = cfg.camera.height, cfg.camera.width

    init_fn, _ = make_tracker(cfg, dtype)
    groups_l, frames_l, getters, t_states, f_states, cam_ts = \
        [], [], [], [], [], []
    for seq in seqs:
        groups = bundle_imu(seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t,
                            time_offset=cfg.camera.time_offset)
        n = len(seq.cam_t)
        if max_frames is not None:
            n = min(n, max_frames)
        fs, k0 = _find_init_frame(cfg, groups, n, dtype)
        get = _seq_image_getter(seq)
        ts, _ = init_fn(jnp.asarray(get(k0), dtype))
        groups_l.append(groups)
        frames_l.append(list(range(k0 + 1, n)))
        getters.append(get)
        t_states.append(ts)
        f_states.append(fs)
        cam_ts.append(seq.cam_t)

    L = max(len(f) for f in frames_l)
    scan = make_batched_image_chunk_scan(cfg, dtype)
    carry = (jax.tree.map(lambda *xs: jnp.stack(xs), *t_states),
             jax.tree.map(lambda *xs: jnp.stack(xs), *f_states),
             jnp.stack([jax.random.key(seed)] * B))

    rows: List[list] = [[] for _ in range(B)]
    zero_img = np.zeros((H, W), np.uint8)
    for c0 in range(0, L, chunk_size):
        T = min(chunk_size, L - c0)
        imgs = np.zeros((B, T, H, W), np.uint8)
        cw = np.zeros((B, T, K, 3), np.float64)
        ca = np.zeros((B, T, K, 3), np.float64)
        cdt = np.zeros((B, T, K), np.float64)
        cv = np.zeros((B, T, K), bool)
        ok = np.zeros((B, T), bool)
        ids = np.full((B, T), -1, np.int64)
        for i in range(B):
            for j in range(T):
                pos = c0 + j
                if pos >= len(frames_l[i]):
                    continue
                k = frames_l[i][pos]
                w, a, dts = groups_l[i][k]
                m = min(len(w), K)
                cw[i, j, :m] = w[:m]
                ca[i, j, :m] = a[:m]
                cdt[i, j, :m] = dts[:m]
                cv[i, j, :m] = True
                ok[i, j] = len(w) >= 2
                ids[i, j] = k
                imgs[i, j] = getters[i](k)
        chunk = {"image": jnp.asarray(imgs),
                 "imu_w": jnp.asarray(cw, dtype),
                 "imu_a": jnp.asarray(ca, dtype),
                 "imu_dt": jnp.asarray(cdt, dtype),
                 "imu_valid": jnp.asarray(cv),
                 "ok": jnp.asarray(ok)}
        t0 = time.perf_counter()
        carry, outs = scan(carry, chunk)
        okh = np.asarray(outs["ok"])
        be_ms = (time.perf_counter() - t0) * 1e3 / max(int(ok.sum()), 1)
        p = np.asarray(outs["p_Gk"])
        q = np.asarray(outs["q_kG"])
        v = np.asarray(outs["v_k"])
        g = np.asarray(outs["n_good"])
        for i in range(B):
            for j in range(T):
                if okh[i, j] and ids[i, j] >= 0:
                    rows[i].append((cam_ts[i][ids[i, j]], p[i, j], q[i, j],
                                    v[i, j], int(g[i, j]), 0.0, be_ms))
        if progress:
            print(f"chunk {c0 // chunk_size}: {c0 + T}/{L} frames x {B} seqs")

    results = []
    for i in range(B):
        if not rows[i]:
            raise RuntimeError(f"sequence {i} produced no frames")
        ts, ps, qs, vs, ng, fe, be = zip(*rows[i])
        results.append(DriverResult(np.asarray(ts), np.asarray(ps),
                                    np.asarray(qs), np.asarray(vs),
                                    np.asarray(ng), np.asarray(fe),
                                    np.asarray(be)))
    return results
