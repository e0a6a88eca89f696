"""Sequence driver: sensor bundling, init gate, and offline execution.

Replaces the reference's ROS shell (rvio_mono.cc + InputBuffer): pairs each
image with all IMU samples up to the image time (+ configurable offset,
needing >= 2 samples — reference: InputBuffer.cc:53-81, per-sample dt from
consecutive timestamps with dt=0 for the first sample, rvio_mono.cc:99-107),
runs the static-init motion gate (System.cc:182-249), then drives the jitted
per-frame step and records TUM poses + per-stage timing, matching the
reference's instrumentation (System.cc:369-380).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rvio_tpu.config import RVIOConfig
from rvio_tpu.core.so3 import rodrigues_np
from rvio_tpu.filter.propagation import make_imu_block
from rvio_tpu.filter.update import UpdateBatch
from rvio_tpu.runtime.step import FrameBundle, make_filter_step
from rvio_tpu.state import FilterState, static_initialize


class InitializationGate:
    """Static-window motion detector + bias initializer.

    Host-side replica of the reference's init state machine
    (System.cc:182-249): accumulate the static-window gyro/accel averages;
    on the first frame whose integrated angle/displacement exceeds the
    thresholds, build the initial filter state.
    """

    def __init__(self, cfg: RVIOConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.w_sum = np.zeros(3)
        self.a_sum = np.zeros(3)
        self.n_imu = 0
        self.moving = False
        # motion-onset detector for the bias-average freeze
        # (init.freeze_bias_average): detrended cumulative angle
        self.cum_dev = np.zeros(3)
        self.frozen = False
        # per-frame sums so the freeze can retroactively trim the
        # onset-to-detection lag (~0.5 s of sub-threshold rotation)
        self._frames: list = []
        # body rotation accumulated between the frozen average window and
        # the gate-fire frame (init.forward_rotate_attitude): the frozen
        # gravity/axes are transported through it so sub-threshold
        # pre-fire rotation cannot become a constant {G}-frame error
        self.dR = np.eye(3)

    def feed(self, w: np.ndarray, a: np.ndarray, dts: np.ndarray
             ) -> Optional[FilterState]:
        """Feed one frame's IMU; returns the initial state once moving."""
        cfg = self.cfg
        if not self.moving:
            ang = np.zeros(3)
            vel = np.zeros(3)
            displ = np.zeros(3)
            for wi, ai, dt in zip(w, a, dts):
                a_c = ai - cfg.imu.gravity * ai / max(np.linalg.norm(ai), 1e-12)
                ang = ang + dt * wi
                vel = vel + dt * a_c
                displ = displ + dt * vel + 0.5 * dt ** 2 * a_c
            if (np.linalg.norm(ang) > cfg.init.threshold_angle
                    or np.linalg.norm(displ) > cfg.init.threshold_displ):
                self.moving = True

        if not self.moving:
            if cfg.init.freeze_bias_average and not self.frozen:
                # deviation of this frame's rotation from the running mean
                # rate: a true constant gyro bias cancels, a slow motion
                # onset accumulates — freeze the bias averages at onset so
                # sub-threshold rotation cannot poison the init (the
                # reference averages every pre-gate sample, System.cc:
                # 217-230, which costs ~deg/min yaw drift on gentle ramps)
                w_mean = (self.w_sum / self.n_imu if self.n_imu > 0
                          else np.asarray(w[0], float))
                self.cum_dev = self.cum_dev + (
                    dts[:, None] * (np.asarray(w) - w_mean)).sum(axis=0)
                if (np.linalg.norm(self.cum_dev)
                        > 0.5 * cfg.init.threshold_angle):
                    self.frozen = True
                    # retroactively drop the detection lag: the onset
                    # ramped for ~the trailing 0.6 s before the detrended
                    # deviation crossed the trip level
                    drop_t = 0.0
                    dropped = []
                    while (self._frames and drop_t < 0.6
                           and self.n_imu - self._frames[-1][2] >= 20):
                        ws, as_, n, dt_f = self._frames.pop()
                        self.w_sum -= ws
                        self.a_sum -= as_
                        self.n_imu -= n
                        drop_t += dt_f
                        dropped.append((ws, n, dt_f))
                    # rotation over the trimmed lag (oldest first): each
                    # trimmed frame contributes its bias-corrected mean
                    # rate — sub-0.2 deg rotations, so per-frame constant-
                    # rate integration is exact to rounding
                    w_mean = (self.w_sum / self.n_imu if self.n_imu > 0
                              else np.zeros(3))
                    for ws, n, dt_f in reversed(dropped):
                        self.dR = self.dR @ rodrigues_np(
                            ws / max(n, 1) - w_mean, dt_f)
            if not self.frozen:
                self.w_sum += w.sum(axis=0)
                self.a_sum += a.sum(axis=0)
                self.n_imu += len(w)
                if cfg.init.freeze_bias_average:
                    self._frames.append((w.sum(axis=0), a.sum(axis=0),
                                         len(w), float(np.sum(dts))))
            else:
                # frozen, gate not yet fired: keep integrating the body
                # rotation sample-by-sample (bias-corrected by the frozen
                # gyro average)
                w_mean = (self.w_sum / self.n_imu if self.n_imu > 0
                          else np.zeros(3))
                for wi, dt in zip(w, dts):
                    self.dR = self.dR @ rodrigues_np(wi - w_mean, dt)
            return None

        if self.n_imu == 0:
            w_avg, a_avg, n = w[0], a[0], 1
        else:
            w_avg = self.w_sum / self.n_imu
            a_avg = self.a_sum / self.n_imu
            n = self.n_imu
        dR = (self.dR if (cfg.init.freeze_bias_average
                          and cfg.init.forward_rotate_attitude) else None)
        return static_initialize(
            jnp.asarray(w_avg, self.dtype), jnp.asarray(a_avg, self.dtype), n,
            gravity=cfg.imu.gravity, imu_rate=cfg.imu.rate_hz,
            sigma_a=cfg.imu.sigma_a, sigma_wg=cfg.imu.sigma_wg,
            sigma_wa=cfg.imu.sigma_wa,
            enable_alignment=cfg.init.enable_alignment,
            max_clones=cfg.window_size, sigma_v0=cfg.init.sigma_v0,
            use_bias_estimates=n > 1, dR_since_avg=dR)


def bundle_imu(imu_t: np.ndarray, imu_w: np.ndarray, imu_a: np.ndarray,
               frame_t: np.ndarray, *, time_offset: float = 0.0
               ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Split the IMU stream into per-frame groups (InputBuffer semantics).

    Each frame gets all IMU samples with t <= t_frame + offset that were not
    consumed by an earlier frame; per-sample dt comes from consecutive
    timestamps (first overall sample gets dt 0, rvio_mono.cc:102-107).
    Frames with < 2 samples yield empty groups (skipped upstream).
    """
    dts = np.diff(imu_t, prepend=imu_t[0])
    out = []
    start = 0
    for tf in frame_t:
        end = int(np.searchsorted(imu_t, tf + time_offset, side="right"))
        if end - start < 2:
            out.append((np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0)))
            # do not consume: the reference waits for >=2 samples
            continue
        out.append((imu_w[start:end], imu_a[start:end], dts[start:end]))
        start = end
    return out


@dataclass
class DriverResult:
    timestamps: np.ndarray     # (T,)
    positions: np.ndarray      # (T,3) p_Gk
    quaternions: np.ndarray    # (T,4) q_kG (JPL xyzw)
    velocities: np.ndarray     # (T,3)
    n_good: np.ndarray         # (T,)
    frontend_ms: np.ndarray    # (T,) per-frame front-end wall time
    backend_ms: np.ndarray     # (T,) per-frame back-end wall time
    landmarks: Optional[np.ndarray] = None  # (NL,3) world-frame cloud
    # acceptance-distribution series (image-pipeline drivers only): keys
    # n_tracked, n_lost, n_new, n_usable, tl_good_sum — each (T,) int
    diag: Optional[dict] = None

    def acceptance_stats(self) -> dict:
        """Aggregate front-end quality rates over the run.

        ransac_inlier_rate: KLT+RANSAC survivors / active features;
        gate_reject_rate: chi2-gate rejections / gate candidates
        (Updater.cc:404-454 anchor); track_len_mean: mean track length of
        accepted update features.  NaN when the underlying counters are
        absent (feature-level replay has no tracker counters).
        """
        out = {"n_good_mean": float(self.n_good.mean())}
        d = self.diag or {}
        if "n_tracked" in d:
            att = d["n_tracked"] + d["n_lost"]
            out["ransac_inlier_rate"] = float(d["n_tracked"].sum()
                                              / max(att.sum(), 1))
        if "n_usable" in d:
            out["gate_reject_rate"] = float(
                1.0 - self.n_good.sum() / max(d["n_usable"].sum(), 1))
        if "tl_good_sum" in d:
            out["track_len_mean"] = float(d["tl_good_sum"].sum()
                                          / max(self.n_good.sum(), 1))
        return out


def _quat_to_rot_np(q: np.ndarray) -> np.ndarray:
    """JPL (x,y,z,w) quaternion -> rotation matrix, host-side numpy."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)],
        [2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)],
        [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)],
    ])


class SequenceDriver:
    """Offline sequence executor over pre-bundled frames."""

    def __init__(self, cfg: RVIOConfig, dtype=None):
        self.cfg = cfg
        self.dtype = dtype or jnp.float32
        self.step = make_filter_step(cfg, donate=cfg.tpu.donate_state)

    def run(self, imu_t, imu_w, imu_a, frame_t, batches,
            progress: bool = False,
            collect_landmarks: bool = False) -> DriverResult:
        """Run a full sequence.

        batches: per-frame UpdateBatch pytrees (host arrays fine).
        collect_landmarks: record the accepted landmark cloud in the world
        frame, decimated to ``landmark.pub_rate`` Hz (the reference publishes
        an rviz cloud in frame "imu" with lifetime 1/nPubRate,
        Updater.cc:79-85,431-447; here it is accumulated into a map).
        """
        cfg = self.cfg
        gate = InitializationGate(cfg, self.dtype)
        groups = bundle_imu(imu_t, imu_w, imu_a, frame_t,
                            time_offset=cfg.camera.time_offset)
        state = None
        rows = []
        lm_rows = []
        pub_every = max(1, int(round(
            cfg.camera.fps / max(cfg.landmark.pub_rate, 1e-9))))
        for k, (tf, (w, a, dts)) in enumerate(zip(frame_t, groups)):
            if len(w) < 2:
                continue
            if state is None:
                state = gate.feed(w, a, dts)
                if state is None:
                    continue
            t0 = time.perf_counter()
            imu = make_imu_block(w, a, dts, cfg.tpu.imu_block, self.dtype)
            b = batches[k]
            batch = UpdateBatch(
                meas=jnp.asarray(b.meas, self.dtype),
                track_len=jnp.asarray(b.track_len, jnp.int32),
                is_type2=jnp.asarray(b.is_type2, bool),
                valid=jnp.asarray(b.valid, bool))
            t1 = time.perf_counter()
            state, out = self.step(state, FrameBundle(imu=imu, batch=batch))
            p = np.asarray(out["p_Gk"])
            q = np.asarray(out["q_kG"])
            t2 = time.perf_counter()
            rows.append((tf, p, q, np.asarray(out["v_k"]),
                         int(out["n_good"]), (t1 - t0) * 1e3, (t2 - t1) * 1e3))
            if collect_landmarks and len(rows) % pub_every == 0:
                # accept gate-passing features with positive inverse depth
                # (Updater.cc:431: publish only if rho > 0)
                ok = np.asarray(out["landmark_ok"]) & (np.asarray(out["rho"]) > 0)
                if ok.any():
                    pfk = np.asarray(out["landmarks"])[ok]
                    lm_rows.append(p + pfk @ _quat_to_rot_np(q))
            if progress and k % 100 == 0:
                print(f"frame {k}/{len(frame_t)} p={p}")
        if not rows:
            raise RuntimeError("sequence never initialized (no motion?)")
        ts, ps, qs, vs, ng, fe, be = zip(*rows)
        lms = np.concatenate(lm_rows, axis=0) if lm_rows else None
        return DriverResult(np.asarray(ts), np.asarray(ps), np.asarray(qs),
                            np.asarray(vs), np.asarray(ng), np.asarray(fe),
                            np.asarray(be), landmarks=lms)


def batches_from_sim(sim) -> List[UpdateBatch]:
    """Per-frame UpdateBatch list from a SyntheticSequence."""
    return [UpdateBatch(meas=sim.feat_meas[k], track_len=sim.feat_len[k],
                        is_type2=sim.feat_type2[k], valid=sim.feat_valid[k])
            for k in range(len(sim.frame_t))]
