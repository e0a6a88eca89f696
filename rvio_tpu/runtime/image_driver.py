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
from rvio_tpu.filter.propagation import make_imu_block
from rvio_tpu.frontend.tracker import make_tracker
from rvio_tpu.runtime.driver import (DriverResult, InitializationGate,
                                     bundle_imu)
from rvio_tpu.runtime.step import FrameBundle, make_filter_step


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

    def process(self, t: float, image: np.ndarray, imu_w, imu_a, imu_dts):
        """Feed one frame; returns (q_kG, p_Gk, v, n_good) or None pre-init."""
        cfg = self.cfg
        if len(imu_w) < 2:
            return None
        if self.filter_state is None:
            self.filter_state = self.gate.feed(imu_w, imu_a, imu_dts)
            if self.filter_state is None:
                return None

        img = jnp.asarray(image, self.dtype)
        K = cfg.tpu.imu_block
        n = min(len(imu_w), K)
        wj = jnp.zeros((K, 3), self.dtype).at[:n].set(
            jnp.asarray(imu_w[:n], self.dtype))
        aj = jnp.zeros((K, 3), self.dtype).at[:n].set(
            jnp.asarray(imu_a[:n], self.dtype))
        dj = jnp.zeros((K,), self.dtype).at[:n].set(
            jnp.asarray(imu_dts[:n], self.dtype))
        vj = jnp.arange(K) < n

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

    # threaded prefetch of the next image while the filter runs
    try:
        from rvio_tpu.dataio.native_loader import BatchLoader
        loader = BatchLoader(n_threads=2)
    except Exception:
        loader = None

    next_img = load_image(seq.cam_files[0])
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
        if loader is not None and k + 1 < n:
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
