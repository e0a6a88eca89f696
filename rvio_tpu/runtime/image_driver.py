"""Full-pipeline driver: images -> tracker -> filter (the EuRoC path).

The complete equivalent of the reference node's per-image callback chain
(reference: rvio_mono.cc:54-79 -> System::MonoVIO, System.cc:173-437):
preprocess + track on device, assemble the update batch, run the filter
step — two jitted programs per frame, images streamed through the native
batch loader when available.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rvio_tpu.config import RVIOConfig
from rvio_tpu.filter.propagation import ImuBlock, make_imu_block
from rvio_tpu.frontend.tracker import make_tracker
from rvio_tpu.runtime.driver import (DriverResult, InitializationGate,
                                     bundle_imu)
from rvio_tpu.runtime.step import FrameBundle, make_filter_step

# per-frame acceptance counters surfaced by the scan drivers (see
# DriverResult.acceptance_stats)
_DIAG_KEYS = ("n_tracked", "n_lost", "n_new", "n_usable", "tl_good_sum")


class ImagePipeline:
    """Stateful image-in, pose-out pipeline (one instance per sequence)."""

    def __init__(self, cfg: RVIOConfig, dtype=jnp.float32, seed: int = 0):
        self.cfg = cfg
        self.dtype = dtype
        self.init_fn, self.track_fn = make_tracker(cfg, dtype)
        self.step = make_filter_step(cfg, donate=cfg.tpu.donate_state)
        self.gate = InitializationGate(cfg, dtype)
        self.key = jax.random.key(seed)
        self.tracker_state = None
        self.filter_state = None
        # propagation-only step for frames whose IMU group overflows the
        # static block (dropped-frame gaps): extra blocks pre-integrate, the
        # final block runs the full step — same math as the reference's
        # per-sample loop over however many samples arrived
        from rvio_tpu.filter.propagation import propagate
        imu_kw = dict(gravity=cfg.imu.gravity, small_angle=cfg.imu.small_angle,
                      sigma_g=cfg.imu.sigma_g, sigma_wg=cfg.imu.sigma_wg,
                      sigma_a=cfg.imu.sigma_a, sigma_wa=cfg.imu.sigma_wa,
                      parallel=cfg.tpu.parallel_propagation)
        self._prop_fn = jax.jit(lambda st, blk: propagate(st, blk, **imu_kw))
        # pack the per-frame core outputs into ONE small vector so the live
        # path pays a single device->host transfer (through a remote-TPU
        # tunnel every readback costs ~25 ms of RPC latency; a dict of 9
        # arrays converted one-by-one dominates end-to-end latency)
        self._pack = jax.jit(lambda o: jnp.concatenate([
            o["q_kG"], o["p_Gk"], o["v_k"],
            jnp.stack([o["n_good"].astype(jnp.float32),
                       o["did_update"].astype(jnp.float32),
                       o["n_usable"].astype(jnp.float32),
                       o["tl_good_sum"].astype(jnp.float32)])]))

    def process_device(self, t, image, imu_w, imu_a, imu_dts):
        """Run one frame and return the packed outputs as a DEVICE array.

        No device->host synchronization happens here — the caller decides
        when to pay the readback (see :meth:`unpack`), which lets a
        pipelined consumer overlap frame k-1's readback RPC with frame k's
        H2D + compute (the transfers ride the link while the readback
        round-trip is in flight).
        """
        out = self.process(t, image, imu_w, imu_a, imu_dts)
        if out is None:
            return None
        return self._pack(out)

    @staticmethod
    def unpack(v) -> dict:
        """Host dict from a packed output vector (ONE device->host read)."""
        v = np.asarray(v)
        return {"q_kG": v[0:4], "p_Gk": v[4:7], "v_k": v[7:10],
                "n_good": int(v[10]), "did_update": bool(v[11] > 0.5),
                "n_usable": int(v[12]), "tl_good_sum": int(v[13])}

    def process_packed(self, t, image, imu_w, imu_a, imu_dts):
        """Like :meth:`process` but returns a host dict from ONE transfer.

        Keys: q_kG, p_Gk, v_k, n_good, did_update, n_usable, tl_good_sum
        (no per-feature diagnostics — use :meth:`process` for those).
        """
        dev = self.process_device(t, image, imu_w, imu_a, imu_dts)
        if dev is None:
            return None
        return self.unpack(dev)

    def process(self, t: float, image: np.ndarray, imu_w, imu_a, imu_dts):
        """Feed one frame; returns (q_kG, p_Gk, v, n_good) or None pre-init."""
        cfg = self.cfg
        if len(imu_w) < 2:
            return None
        if self.filter_state is None:
            self.filter_state = self.gate.feed(imu_w, imu_a, imu_dts)
            if self.filter_state is None:
                return None

        # transfer the image in its native dtype (uint8 for real footage —
        # 4x less host->device traffic); the tracker casts on device
        img = jnp.asarray(image)
        K = cfg.tpu.imu_block
        imu_w = np.asarray(imu_w)
        imu_a = np.asarray(imu_a)
        imu_dts = np.asarray(imu_dts)
        # dropped-frame gap: more samples than the static block — integrate
        # the surplus through propagation-only sub-steps (oldest first), the
        # trailing block feeds the normal full step below
        while len(imu_w) > K:
            blk = make_imu_block(imu_w[:K], imu_a[:K], imu_dts[:K], K,
                                 self.dtype)
            self.filter_state = self._prop_fn(self.filter_state, blk)
            imu_w, imu_a, imu_dts = imu_w[K:], imu_a[K:], imu_dts[K:]
        n = min(len(imu_w), K)
        # pad on host, transfer once (device .at[].set would be 3 extra
        # round-trips per frame)
        wn = np.zeros((K, 3), np.float64); wn[:n] = imu_w[:n]
        an = np.zeros((K, 3), np.float64); an[:n] = imu_a[:n]
        dn = np.zeros((K,), np.float64); dn[:n] = imu_dts[:n]
        wj = jnp.asarray(wn, self.dtype)
        aj = jnp.asarray(an, self.dtype)
        dj = jnp.asarray(dn, self.dtype)
        vj = jnp.asarray(np.arange(K) < n)

        if self.tracker_state is None:
            self.tracker_state, _ = self.init_fn(img)
            return None  # first frame: detection only (Tracker.cc:204-234)

        self.key, sub = jax.random.split(self.key)
        self.tracker_state, batch, dbg = self.track_fn(
            self.tracker_state, img, wj, dj, vj, sub)

        imu = make_imu_block(np.asarray(imu_w), np.asarray(imu_a),
                             np.asarray(imu_dts), K, self.dtype)
        self.filter_state, out = self.step(
            self.filter_state, FrameBundle(imu=imu, batch=batch))
        return out


def make_image_chunk_scan(cfg: RVIOConfig, dtype=jnp.float32, mesh=None):
    """Fused tracker+filter scan over a chunk of frames — ONE dispatch.

    The per-frame host loop pays a device-dispatch + synchronization cost
    per frame (several ms through a remote-TPU tunnel); scanning a chunk of
    B frames on-device amortizes it B-fold and lets the host decode/prefetch
    the next chunk concurrently.  This is the TPU-native streaming shape of
    the reference's per-image callback chain (rvio_mono.cc:54-79).

    Returns ``scan(carry, chunk) -> (carry, outputs)`` (jitted, carry
    donated) with

    - carry = (TrackerState, FilterState, rng key),
    - chunk = dict of stacked arrays: image (B,H,W), imu_w (B,K,3),
      imu_a (B,K,3), imu_dt (B,K), imu_valid (B,K), ok (B,) — ``ok=False``
      frames (e.g. <2 IMU samples, InputBuffer.cc:75-76 semantics) leave the
      carry untouched, like the reference skipping the frame,
    - outputs = per-frame {q_kG, p_Gk, v_k, n_good, ok} stacked over B.

    ``mesh``: optional mesh with a ``feat`` axis — the tracker's KLT stage
    then runs feat-sharded (see make_tracker); outputs are identical to the
    unsharded scan (KLT feature lanes are independent).
    """
    body = _chunk_body(cfg, dtype, mesh=mesh)

    @jax.jit
    def scan(carry, chunk):
        return jax.lax.scan(body, carry, chunk)

    return scan


def _chunk_body(cfg: RVIOConfig, dtype, mesh=None):
    """One frame of the fused tracker+filter scan (shared by both scans)."""
    _, track_fn = make_tracker(cfg, dtype, mesh=mesh)
    step = make_filter_step(cfg, donate=False)

    def body(carry, frame):
        ts, fs, key = carry
        key, sub = jax.random.split(key)
        new_ts, batch, dbg = track_fn(ts, frame["image"], frame["imu_w"],
                                      frame["imu_dt"], frame["imu_valid"],
                                      sub)
        imu = ImuBlock(w=frame["imu_w"], a=frame["imu_a"],
                       dt=frame["imu_dt"], valid=frame["imu_valid"])
        new_fs, out = step(fs, FrameBundle(imu=imu, batch=batch))
        ok = frame["ok"]
        ts = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_ts, ts)
        fs = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_fs, fs)
        # acceptance-distribution counters ride along (all tiny scalars):
        # RANSAC survival, refill count, chi2-gate candidates, and the
        # accepted-track-length sum — so replay surfaces front-end quality,
        # not just poses (VERDICT r2: regressions must not hide behind ATE)
        outputs = {"q_kG": out["q_kG"], "p_Gk": out["p_Gk"],
                   "v_k": out["v_k"], "n_good": out["n_good"], "ok": ok,
                   "n_tracked": dbg["n_tracked"], "n_lost": dbg["n_lost"],
                   "n_new": dbg["n_new"], "n_usable": out["n_usable"],
                   "tl_good_sum": out["tl_good_sum"]}
        return (ts, fs, key), outputs

    return body


def make_frontend_chunk_scan(cfg: RVIOConfig, dtype=jnp.float32):
    """Tracker-only chunk scan: images -> stacked UpdateBatches.

    Same per-frame math and RNG chain as the fused scan, so running this
    followed by ``make_backend_chunk_scan`` reproduces the fused trajectory
    exactly — used to measure the front-end/back-end per-frame time split the
    reference records in time_cost.dat (System.cc:376-379).
    """
    _, track_fn = make_tracker(cfg, dtype)

    def body(carry, frame):
        ts, key = carry
        key, sub = jax.random.split(key)
        new_ts, batch, _dbg = track_fn(ts, frame["image"], frame["imu_w"],
                                       frame["imu_dt"], frame["imu_valid"],
                                       sub)
        ok = frame["ok"]
        ts = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_ts, ts)
        return (ts, key), batch

    @jax.jit
    def scan(carry, chunk):
        return jax.lax.scan(body, carry, chunk)

    return scan


def make_backend_chunk_scan(cfg: RVIOConfig, dtype=jnp.float32):
    """Filter-only chunk scan: stacked UpdateBatches + IMU -> poses."""
    step = make_filter_step(cfg, donate=False)

    def body(fs, frame):
        imu = ImuBlock(w=frame["imu_w"], a=frame["imu_a"],
                       dt=frame["imu_dt"], valid=frame["imu_valid"])
        new_fs, out = step(fs, FrameBundle(imu=imu, batch=frame["batch"]))
        ok = frame["ok"]
        fs = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_fs, fs)
        outputs = {"q_kG": out["q_kG"], "p_Gk": out["p_Gk"],
                   "v_k": out["v_k"], "n_good": out["n_good"], "ok": ok,
                   "n_usable": out["n_usable"],
                   "tl_good_sum": out["tl_good_sum"]}
        return fs, outputs

    @jax.jit
    def scan(fs, chunk):
        return jax.lax.scan(body, fs, chunk)

    return scan


def make_batched_image_chunk_scan(cfg: RVIOConfig, dtype=jnp.float32):
    """`make_image_chunk_scan` vmapped over a leading segment-batch axis.

    Single-chip throughput mode for the FULL pipeline (images -> poses):
    B independent sequence segments advance in lockstep, so the tracker's
    image kernels and the filter's small linear algebra all become batched
    ops — the image-level analogue of ``make_batched_sequence_scan``
    (amortizes VPU/MXU dispatch latency that dominates a lone 200-feature
    tracker + 108-dim filter).  Segments never interact; outputs are
    identical to running ``make_image_chunk_scan`` per segment.

    Returns ``scan(carry, chunk) -> (carry, outputs)`` with
    - carry = (TrackerState, FilterState, rng keys) — every leaf (B, ...),
    - chunk leaves (B, T, ...): image (B,T,H,W), imu_* (B,T,K,...), ok (B,T),
    - outputs leaves (B, T, ...).
    """
    vbody = jax.vmap(_chunk_body(cfg, dtype))

    @jax.jit
    def scan(carry, chunk):
        swapped = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), chunk)
        final, outs = jax.lax.scan(vbody, carry, swapped)
        outs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)
        return final, outs

    return scan


def _find_init_frame(cfg: RVIOConfig, groups, n: int, dtype):
    """Host-side init gate: first frame index with a built filter state."""
    gate = InitializationGate(cfg, dtype)
    for k in range(n):
        w, a, dts = groups[k]
        if len(w) < 2:
            continue
        st = gate.feed(w, a, dts)
        if st is not None:
            return st, k
    raise RuntimeError("sequence never initialized")


def _imu_chunk_arrays(groups, ks, K: int, dtype):
    """Pad one chunk's IMU groups into stacked device arrays."""
    B = len(ks)
    cw = np.zeros((B, K, 3), np.float64)
    ca = np.zeros((B, K, 3), np.float64)
    cdt = np.zeros((B, K), np.float64)
    cv = np.zeros((B, K), bool)
    ok = np.zeros(B, bool)
    for i, k in enumerate(ks):
        w, a, dts = groups[k]
        m = min(len(w), K)
        cw[i, :m] = w[:m]
        ca[i, :m] = a[:m]
        cdt[i, :m] = dts[:m]
        cv[i, :m] = True
        ok[i] = len(w) >= 2
    return {"imu_w": jnp.asarray(cw, dtype), "imu_a": jnp.asarray(ca, dtype),
            "imu_dt": jnp.asarray(cdt, dtype), "imu_valid": jnp.asarray(cv),
            "ok": jnp.asarray(ok)}


def _replay_chunks(cfg: RVIOConfig, dtype, chunk_size: int, seed: int,
                   groups, cam_t, frame_ids, tracker_state, filter_state,
                   get_images, timing_split: bool,
                   progress: bool, checkpoint_path: Optional[str] = None,
                   rng_key=None) -> DriverResult:
    """Chunked-scan replay core shared by the file and rendered drivers.

    With ``timing_split`` the tracker and filter run as two timed dispatches
    per chunk (identical math/RNG to the fused scan), giving the real
    per-frame front-end/back-end ms split the reference writes to
    time_cost.dat (System.cc:376-379); otherwise one fused dispatch with the
    whole chunk time attributed to the back-end column.

    ``checkpoint_path``: save the complete session (filter + tracker + RNG
    + frame cursor) after the last chunk — resuming from it continues the
    exact trajectory (runtime/checkpoint.py; the reference cannot resume
    at all, System.cc:83-88).  ``rng_key`` overrides the seed-derived key
    (resume path).
    """
    K = cfg.tpu.imu_block
    key = rng_key if rng_key is not None else jax.random.key(seed)
    if timing_split:
        fe_scan = make_frontend_chunk_scan(cfg, dtype)
        be_scan = make_backend_chunk_scan(cfg, dtype)
    else:
        scan = make_image_chunk_scan(cfg, dtype)
    carry = (tracker_state, filter_state, key)

    rows = []
    n = frame_ids[-1] + 1 if frame_ids else 0
    for c0 in range(0, len(frame_ids), chunk_size):
        ks = frame_ids[c0:c0 + chunk_size]
        imgs = get_images(ks)
        chunk = _imu_chunk_arrays(groups, ks, K, dtype)
        chunk["image"] = jnp.asarray(imgs)
        if timing_split:
            ts_c, fs_c, key = carry
            t0 = time.perf_counter()
            (ts_c, key), batches = fe_scan((ts_c, key), chunk)
            jax.block_until_ready(batches)
            t1 = time.perf_counter()
            be_chunk = {k: v for k, v in chunk.items() if k != "image"}
            be_chunk["batch"] = batches
            fs_c, outs = be_scan(fs_c, be_chunk)
            jax.block_until_ready(outs["p_Gk"])
            t2 = time.perf_counter()
            carry = (ts_c, fs_c, key)
            fe_ms = (t1 - t0) * 1e3 / max(len(ks), 1)
            be_ms = (t2 - t1) * 1e3 / max(len(ks), 1)
        else:
            t0 = time.perf_counter()
            carry, outs = scan(carry, chunk)
            fe_ms = 0.0
            be_ms = (time.perf_counter() - t0) * 1e3 / max(len(ks), 1)
        ok = np.asarray(outs["ok"])
        p = np.asarray(outs["p_Gk"])
        q = np.asarray(outs["q_kG"])
        v = np.asarray(outs["v_k"])
        g = np.asarray(outs["n_good"])
        dg = {k_: np.asarray(outs[k_]) for k_ in _DIAG_KEYS if k_ in outs}
        for i, k in enumerate(ks):
            if ok[i]:
                rows.append((cam_t[k], p[i], q[i], v[i], int(g[i]),
                             fe_ms, be_ms,
                             {k_: int(v_[i]) for k_, v_ in dg.items()}))
        if progress and (c0 // chunk_size) % 5 == 0:
            print(f"chunk {c0 // chunk_size}: frame {ks[-1]}/{n}")
    if checkpoint_path and frame_ids:
        from rvio_tpu.runtime.checkpoint import save_checkpoint
        ts_f, fs_f, key_f = carry
        last = frame_ids[-1]
        save_checkpoint(checkpoint_path, fs_f, tracker_state=ts_f,
                        rng_key=key_f, frame_cursor=last,
                        timestamp=float(cam_t[last]))
    if not rows:
        raise RuntimeError("no frames processed")
    ts, ps, qs, vs, ng, fe, be, dgs = zip(*rows)
    diag = ({k_: np.asarray([d[k_] for d in dgs]) for k_ in dgs[0]}
            if dgs[0] else None)
    return DriverResult(np.asarray(ts), np.asarray(ps), np.asarray(qs),
                        np.asarray(vs), np.asarray(ng), np.asarray(fe),
                        np.asarray(be), diag=diag)


def run_euroc_sequence_scan(cfg: RVIOConfig, seq, dtype=jnp.float32,
                            chunk_size: int = 32, seed: int = 0,
                            progress: bool = False,
                            timing_split: bool = False,
                            max_frames: Optional[int] = None,
                            checkpoint_path: Optional[str] = None,
                            resume_from: Optional[str] = None
                            ) -> DriverResult:
    """Replay a sequence through the chunked on-device scan pipeline.

    Matches ``run_euroc_sequence`` semantics (same init gate, same per-frame
    math, same RNG chain) at chunk-amortized dispatch cost.

    ``checkpoint_path`` saves the complete session after the run;
    ``resume_from`` continues a prior run from its checkpoint (same
    sequence!) — the resumed trajectory continues the checkpointed run's
    exactly (filter + tracker + RNG restored; frames before the cursor
    skipped).
    """
    from rvio_tpu.dataio.euroc import load_image

    groups = bundle_imu(seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t,
                        time_offset=cfg.camera.time_offset)
    n = len(seq.cam_t) if max_frames is None else min(max_frames, len(seq.cam_t))
    rng_key = None
    if resume_from is not None:
        from rvio_tpu.runtime.checkpoint import load_checkpoint
        filter_state, tracker_state, rng_key, cursor, _ts = \
            load_checkpoint(resume_from, dtype)
        if tracker_state is None:
            raise ValueError(f"{resume_from}: checkpoint has no tracker "
                             "state (not an image-pipeline session)")
        k0 = cursor
    else:
        filter_state, k0 = _find_init_frame(cfg, groups, n, dtype)

    mem = getattr(seq, "images", None)  # in-memory frames (rosbag loader)
    loader = None
    if mem is None:
        try:
            from rvio_tpu.dataio.native_loader import BatchLoader
            loader = BatchLoader(n_threads=2)
        except Exception:
            loader = None

    if resume_from is None:
        init_fn, _ = make_tracker(cfg, dtype)
        img0 = mem[k0] if mem is not None else load_image(seq.cam_files[k0])
        tracker_state, _ = init_fn(jnp.asarray(img0, dtype))

    def get_images(ks):
        if mem is not None:
            return np.stack([mem[k] for k in ks])
        files = [seq.cam_files[k] for k in ks]
        if loader is not None and len(files) > 1:
            probe = load_image(files[0])
            loader.submit(files[1:], width=probe.shape[1],
                          height=probe.shape[0])
            return np.concatenate([probe[None], loader.collect()], axis=0)
        return np.stack([load_image(f) for f in files])

    try:
        return _replay_chunks(cfg, dtype, chunk_size, seed, groups, seq.cam_t,
                              list(range(k0 + 1, n)), tracker_state,
                              filter_state, get_images, timing_split,
                              progress, checkpoint_path=checkpoint_path,
                              rng_key=rng_key)
    finally:
        if loader is not None:
            loader.close()


def run_rendered_sequence_scan(cfg: RVIOConfig, sim, dtype=jnp.float32,
                               chunk_size: int = 32, seed: int = 0,
                               progress: bool = False,
                               timing_split: bool = False,
                               max_frames: Optional[int] = None,
                               photometric=None) -> DriverResult:
    """Run the FULL image pipeline on simulator-rendered frames.

    The flagship accuracy workload: frames are rendered at the configured
    resolution from the synthetic sequence's landmarks and replayed through
    the complete production path (CLAHE, pyramid, KLT, RANSAC, lifecycle,
    filter) — the image-level stand-in for real-EuRoC replay
    (reference: README.md:70-86) when no dataset is reachable.

    ``photometric``: optional :class:`~rvio_tpu.dataio.synthetic.
    PhotometricStress` applied to every rendered frame (exposure steps,
    vignetting, motion blur along the true image motion, noise bursts).
    """
    from rvio_tpu.dataio.synthetic import (apply_photometric, mean_flow,
                                           render_frame)

    groups = bundle_imu(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t,
                        time_offset=cfg.camera.time_offset)
    n = len(sim.frame_t) if max_frames is None else min(max_frames,
                                                        len(sim.frame_t))
    filter_state, k0 = _find_init_frame(cfg, groups, n, dtype)

    def render_u8(k):
        img = render_frame(cfg, sim, k)
        if photometric is not None:
            img = apply_photometric(
                img, k, float(sim.frame_t[k]), photometric,
                flow=mean_flow(cfg, sim, k), fps=cfg.camera.fps)
        return np.clip(img, 0, 255).astype(np.uint8)

    init_fn, _ = make_tracker(cfg, dtype)
    tracker_state, _ = init_fn(jnp.asarray(render_u8(k0), dtype))

    def get_images(ks):
        return np.stack([render_u8(k) for k in ks])

    return _replay_chunks(cfg, dtype, chunk_size, seed, groups, sim.frame_t,
                          list(range(k0 + 1, n)), tracker_state, filter_state,
                          get_images, timing_split, progress)


def run_euroc_sequence(cfg: RVIOConfig, seq, dtype=jnp.float32,
                       progress: bool = False,
                       max_frames: Optional[int] = None) -> DriverResult:
    """Replay a loaded EuRoC sequence through the full image pipeline."""
    from rvio_tpu.dataio.euroc import load_image

    pipe = ImagePipeline(cfg, dtype)
    groups = bundle_imu(seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t,
                        time_offset=cfg.camera.time_offset)
    rows = []
    n = len(seq.cam_t) if max_frames is None else min(max_frames, len(seq.cam_t))

    mem = getattr(seq, "images", None)  # in-memory frames (rosbag loader)
    # threaded prefetch of the next image while the filter runs
    loader = None
    if mem is None:
        try:
            from rvio_tpu.dataio.native_loader import BatchLoader
            loader = BatchLoader(n_threads=2)
        except Exception:
            loader = None

    next_img = mem[0] if mem is not None else load_image(seq.cam_files[0])
    for k in range(n):
        img = next_img
        if loader is not None and k + 1 < n:
            loader.submit([seq.cam_files[k + 1]], width=img.shape[1],
                          height=img.shape[0])
        t0 = time.perf_counter()
        w, a, dts = groups[k]
        out = pipe.process(seq.cam_t[k], img, w, a, dts)
        t1 = time.perf_counter()
        if out is not None:
            rows.append((seq.cam_t[k], np.asarray(out["p_Gk"]),
                         np.asarray(out["q_kG"]), np.asarray(out["v_k"]),
                         int(out["n_good"]), 0.0, (t1 - t0) * 1e3))
        if mem is not None and k + 1 < n:
            next_img = mem[k + 1]
        elif loader is not None and k + 1 < n:
            next_img = loader.collect()[0]
        elif k + 1 < n:
            next_img = load_image(seq.cam_files[k + 1])
        if progress and k % 200 == 0:
            print(f"frame {k}/{n}")
    if loader is not None:
        loader.close()
    if not rows:
        raise RuntimeError("sequence never initialized")
    ts, ps, qs, vs, ng, fe, be = zip(*rows)
    return DriverResult(np.asarray(ts), np.asarray(ps), np.asarray(qs),
                        np.asarray(vs), np.asarray(ng), np.asarray(fe),
                        np.asarray(be))
