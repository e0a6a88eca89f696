"""Synthetic VIO sequence generator (host-side numpy).

Replaces dataset replay as the primary end-to-end validation workload (the
reference validates only by replaying EuRoC rosbags + visual inspection,
README.md:70-86 — it has no simulator).  Generates a physically-consistent
IMU stream + landmark feature tracks for a smooth 3D trajectory:

- closed-form position p(t) (sum of sines) with a smoothstep motion ramp so
  the sequence starts static (exercises the init gate);
- orientation from closed-form Euler-angle curves; body rates extracted by
  exact central differencing of R(t);
- accelerometer = R_WB(t)^T (a_W + G z_W) + bias + noise (specific force);
- feature tracks driven by the same slot lifecycle as the tracker
  (slots, loss on leaving the FOV, max-length type-2 recycling, refill),
  producing per-frame UpdateBatch arrays exactly as the front-end would.

Can also render simple textured images for front-end (KLT) testing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List

import numpy as np

from rvio_tpu.config import RVIOConfig


def _smoothstep(t, t0, t1):
    x = np.clip((t - t0) / (t1 - t0), 0.0, 1.0)
    s = x ** 3 * (10 - 15 * x + 6 * x ** 2)
    # first/second derivatives of the quintic smoothstep (chain rule)
    d = (30 * x ** 2 - 60 * x ** 3 + 30 * x ** 4) / (t1 - t0)
    dd = (60 * x - 180 * x ** 2 + 120 * x ** 3) / (t1 - t0) ** 2
    return s, d, dd


def _euler_to_R(yaw, pitch, roll):
    """World-from-body rotation from ZYX Euler angles."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


@dataclass
class SyntheticSequence:
    """Generated sequence: IMU stream, frame bundles, and ground truth."""

    # IMU stream (rate cfg.imu.rate_hz)
    imu_t: np.ndarray          # (Ni,)
    imu_w: np.ndarray          # (Ni,3) gyro measurements
    imu_a: np.ndarray          # (Ni,3) accel measurements
    # frames (rate cfg.camera.fps)
    frame_t: np.ndarray        # (T,)
    # per-frame update batches (what the tracker would emit)
    feat_meas: np.ndarray      # (T, F, L, 2)
    feat_len: np.ndarray       # (T, F)
    feat_type2: np.ndarray     # (T, F) bool
    feat_valid: np.ndarray     # (T, F) bool
    # ground truth at frame times
    gt_p: np.ndarray           # (T,3) body position in world
    gt_R: np.ndarray           # (T,3,3) world-from-body rotation
    gt_v: np.ndarray           # (T,3) body velocity in world
    # truth parameters
    bg: np.ndarray
    ba: np.ndarray
    landmarks: np.ndarray      # (NL,3)
    # per-frame raw tracker-state (for image rendering / front-end tests)
    slot_landmark: np.ndarray  # (T, N) landmark id per slot (-1 free)
    slot_px: np.ndarray        # (T, N, 2) distorted pixel coords per slot


def simulate_sequence(cfg: RVIOConfig, *, duration: float = 20.0,
                      static_time: float = 1.5, ramp_time: float = 2.0,
                      rotation_lead: float = 0.5,
                      seed: int = 0, n_landmarks: int = 600,
                      meas_noise: float = 0.0, imu_noise: bool = False,
                      motion_scale: float = 1.0,
                      drop_prob: float = 0.0) -> SyntheticSequence:
    rng = np.random.default_rng(seed)
    G = cfg.imu.gravity
    imu_dt = 1.0 / cfg.imu.rate_hz
    frame_dt = 1.0 / cfg.camera.fps

    amp = np.array([1.2, 0.9, 0.45]) * motion_scale
    om = 2 * np.pi * np.array([0.21, 0.17, 0.31])
    ph = np.array([0.0, 1.1, 2.3])
    e_amp = np.array([0.45, 0.3, 0.25]) * motion_scale   # yaw/pitch/roll amps
    e_om = 2 * np.pi * np.array([0.13, 0.23, 0.19])
    e_ph = np.array([0.5, 1.7, 0.2])

    # Rotation onset leads translation (a platform tilts before it
    # accelerates): the motion gate then fires on the gyro while the true
    # velocity is still near zero, like a real EuRoC takeoff.
    rot_t0, rot_t1 = static_time, static_time + ramp_time
    ramp_t0 = static_time + rotation_lead
    ramp_t1 = ramp_t0 + ramp_time

    def pos_vel_acc(t):
        s, sd, sdd = _smoothstep(t, ramp_t0, ramp_t1)
        q = amp * np.sin(om * t + ph)
        qd = amp * om * np.cos(om * t + ph)
        qdd = -amp * om ** 2 * np.sin(om * t + ph)
        q0 = amp * np.sin(om * ramp_t0 + ph)  # anchor so p(t0)=0 shift-free
        p = s * (q - q0)
        v = sd * (q - q0) + s * qd
        a = sdd * (q - q0) + 2 * sd * qd + s * qdd
        return p, v, a

    def R_wb(t):
        s, _, _ = _smoothstep(t, rot_t0, rot_t1)
        ang = s * e_amp * np.sin(e_om * t + e_ph)
        ang0 = s * e_amp * np.sin(e_om * rot_t0 + e_ph)
        yaw, pitch, roll = ang - ang0
        return _euler_to_R(yaw, pitch, roll)

    def body_rate(t, h=1e-6):
        R0 = R_wb(t)
        Rp = R_wb(t + h)
        Rm = R_wb(t - h)
        W = R0.T @ (Rp - Rm) / (2 * h)   # skew(omega_B)
        return np.array([W[2, 1], W[0, 2], W[1, 0]])

    # --- IMU stream ---
    n_imu = int(round(duration / imu_dt))
    imu_t = (np.arange(n_imu) + 1) * imu_dt
    bg = np.array([0.003, -0.002, 0.004]) if imu_noise else np.zeros(3)
    ba = np.array([0.02, -0.015, 0.01]) if imu_noise else np.zeros(3)
    z_w = np.array([0.0, 0.0, 1.0])
    imu_w = np.zeros((n_imu, 3))
    imu_a = np.zeros((n_imu, 3))
    for i, t in enumerate(imu_t):
        # Midpoint sampling over the integration interval (t-dt, t]: real
        # IMUs average over the sample period, and the filter integrates
        # each sample as piecewise-constant — midpoint keeps the simulated
        # stream 2nd-order consistent with that convention (endpoint
        # sampling injects a systematic O(dt) rate error at the gyro).
        tm = t - 0.5 * imu_dt
        _, _, a_w = pos_vel_acc(tm)
        R = R_wb(tm)
        imu_w[i] = body_rate(tm) + bg
        imu_a[i] = R.T @ (a_w + G * z_w) + ba
        if imu_noise:
            # discrete-time noise: sigma/sqrt(dt)
            imu_w[i] += cfg.imu.sigma_g / math.sqrt(imu_dt) * rng.normal(size=3)
            imu_a[i] += cfg.imu.sigma_a / math.sqrt(imu_dt) * rng.normal(size=3)

    # --- landmarks: shell around the trajectory workspace ---
    centers = rng.uniform(-1, 1, size=(n_landmarks, 3))
    radii = rng.uniform(4.0, 9.0, size=(n_landmarks, 1))
    dirs = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    landmarks = dirs * radii

    # --- frames + tracker-equivalent lifecycle ---
    N = cfg.tracker.num_features
    L = cfg.tracker.max_tracking_length
    Lmin = cfg.tracker.min_tracking_length
    F = cfg.tracker.max_update_features
    R_bc, t_bc = cfg.camera.R_bc, cfg.camera.t_bc
    fx, fy = cfg.camera.fx, cfg.camera.fy
    cx, cy = cfg.camera.cx, cfg.camera.cy
    wpx, hpx = cfg.camera.width, cfg.camera.height

    n_frames = int(duration * cfg.camera.fps) - 1
    frame_t = (np.arange(n_frames) + 1) * frame_dt

    slot_lm = -np.ones(N, dtype=np.int64)      # landmark id per slot
    history: List[List[np.ndarray]] = [[] for _ in range(N)]

    feat_meas = np.zeros((n_frames, F, L, 2))
    feat_len = np.zeros((n_frames, F), np.int32)
    feat_type2 = np.zeros((n_frames, F), bool)
    feat_valid = np.zeros((n_frames, F), bool)
    gt_p = np.zeros((n_frames, 3))
    gt_R = np.zeros((n_frames, 3, 3))
    gt_v = np.zeros((n_frames, 3))
    slot_lm_out = -np.ones((n_frames, N), np.int64)
    slot_px_out = np.zeros((n_frames, N, 2))

    def project_all(t):
        """Normalized coords + visibility for all landmarks at time t."""
        p_w, _, _ = pos_vel_acc(t)
        R = R_wb(t)
        p_cam_w = p_w + R @ t_bc
        R_wc = R @ R_bc
        pc = (landmarks - p_cam_w) @ R_wc       # (NL,3) camera coords
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            xn = pc[:, 0] / z
            yn = pc[:, 1] / z
        u = fx * xn + cx
        v = fy * yn + cy
        vis = (z > 0.4) & (z < 25.0) & (u > 10) & (u < wpx - 10) \
            & (v > 10) & (v < hpx - 10)
        return np.stack([xn, yn], 1), np.stack([u, v], 1), vis

    for k, t in enumerate(frame_t):
        zn, px, vis = project_all(t)
        if meas_noise > 0:
            zn = zn + meas_noise * rng.normal(size=zn.shape)

        tracked = np.zeros(N, bool)
        for s in range(N):
            lm = slot_lm[s]
            if lm >= 0 and vis[lm] and rng.uniform() >= drop_prob:
                tracked[s] = True

        # classify: lost slots -> type 1 candidates; max-length -> type 2
        batch_meas = np.zeros((F, L, 2))
        batch_len = np.zeros(F, np.int32)
        batch_t2 = np.zeros(F, bool)
        batch_ok = np.zeros(F, bool)
        nmeas = 0
        for s in range(N):          # lost features first (Tracker.cc:283-303)
            if slot_lm[s] >= 0 and not tracked[s]:
                if len(history[s]) >= Lmin and nmeas < F:
                    T = len(history[s])
                    batch_meas[nmeas, :T] = np.asarray(history[s])
                    batch_len[nmeas] = T
                    batch_ok[nmeas] = True
                    nmeas += 1
                history[s] = []
                slot_lm[s] = -1
        for s in range(N):          # tracked features (Tracker.cc:305-342)
            if tracked[s]:
                lm = slot_lm[s]
                if len(history[s]) == L:
                    if nmeas < F:
                        T = len(history[s])
                        batch_meas[nmeas, :T] = np.asarray(history[s])
                        batch_len[nmeas] = T
                        batch_t2[nmeas] = True
                        batch_ok[nmeas] = True
                        nmeas += 1
                        keep = L - (math.ceil(0.5 * L) - 1)
                        history[s] = history[s][-keep:]
                    else:
                        history[s] = history[s][1:]
                history[s].append(zn[lm].copy())

        # refill free slots from unassigned visible landmarks
        assigned = set(slot_lm[slot_lm >= 0].tolist())
        free = [s for s in range(N) if slot_lm[s] < 0]
        if free:
            candidates = [i for i in np.flatnonzero(vis) if i not in assigned]
            rng.shuffle(candidates)
            for s, lm in zip(free, candidates):
                slot_lm[s] = lm
                history[s] = [zn[lm].copy()]

        feat_meas[k], feat_len[k] = batch_meas, batch_len
        feat_type2[k], feat_valid[k] = batch_t2, batch_ok
        p_w, v_w, _ = pos_vel_acc(t)
        gt_p[k], gt_R[k], gt_v[k] = p_w, R_wb(t), v_w
        slot_lm_out[k] = slot_lm
        slot_px_out[k] = np.where(slot_lm[:, None] >= 0,
                                  px[np.clip(slot_lm, 0, None)], 0.0)

    return SyntheticSequence(
        imu_t=imu_t, imu_w=imu_w, imu_a=imu_a, frame_t=frame_t,
        feat_meas=feat_meas, feat_len=feat_len, feat_type2=feat_type2,
        feat_valid=feat_valid, gt_p=gt_p, gt_R=gt_R, gt_v=gt_v,
        bg=bg, ba=ba, landmarks=landmarks,
        slot_landmark=slot_lm_out, slot_px=slot_px_out)


def _project_to_pixels_np(xn, yn, c):
    """Forward-distorted pixel projection, host-side numpy.

    Same models as frontend/undistort.py (radtan + equidistant fisheye) —
    duplicated in numpy so rendering never dispatches to the device (a jit
    compile through a remote-TPU tunnel costs minutes)."""
    if c.is_fisheye:
        r = np.sqrt(np.maximum(xn * xn + yn * yn, 1e-18))
        theta = np.arctan(r)
        th2 = theta * theta
        # fisheye coefficients ride in the (k1,k2,p1,p2) slots as k1..k4
        theta_d = theta * (1 + th2 * (c.k1 + th2 * (c.k2 + th2 * (c.p1 + th2 * c.p2))))
        s = theta_d / r
        xd, yd = xn * s, yn * s
    else:
        r2 = xn * xn + yn * yn
        radial = 1.0 + r2 * (c.k1 + r2 * (c.k2 + r2 * c.k3))
        xd = xn * radial + 2.0 * c.p1 * xn * yn + c.p2 * (r2 + 2.0 * xn * xn)
        yd = yn * radial + c.p1 * (r2 + 2.0 * yn * yn) + 2.0 * c.p2 * xn * yn
    return np.stack([xd * c.fx + c.cx, yd * c.fy + c.cy], axis=1)


def project_landmarks(cfg: RVIOConfig, sim: SyntheticSequence, k: int):
    """Distorted pixel positions + visibility of all landmarks at frame k."""
    R = sim.gt_R[k]
    p_cam_w = sim.gt_p[k] + R @ cfg.camera.t_bc
    R_wc = R @ cfg.camera.R_bc
    pc = (sim.landmarks - p_cam_w) @ R_wc
    z = pc[:, 2]
    zs = np.where(np.abs(z) < 1e-6, 1e-6, z)
    xn = pc[:, 0] / zs
    yn = pc[:, 1] / zs
    c = cfg.camera
    px = _project_to_pixels_np(xn, yn, c)
    vis = (z > 0.4) & (z < 25.0) & (px[:, 0] > 12) & (px[:, 0] < c.width - 12) \
        & (px[:, 1] > 12) & (px[:, 1] < c.height - 12)
    return px, vis


def render_frame(cfg: RVIOConfig, sim: SyntheticSequence, k: int,
                 blob: int = 4, base: float = 80.0) -> np.ndarray:
    """Render frame k: a checker-cross corner at every visible landmark.

    Each landmark paints a 2x2 checkerboard tile centered at its projected
    pixel — a maximal Shi-Tomasi corner — so the real front-end (detection,
    KLT, RANSAC, lifecycle) can run on synthetic imagery with known
    geometry.  Returns (H, W) float32 in [0, 255].
    """
    H, W = cfg.camera.height, cfg.camera.width
    img = np.full((H, W), base, np.float32)
    # mild vignette so the background is not perfectly flat
    yy, xx = np.mgrid[0:H, 0:W]
    img += 20.0 * np.cos(2 * np.pi * xx / W) * np.cos(2 * np.pi * yy / H)

    px, vis = project_landmarks(cfg, sim, k)
    for (x, y) in px[vis]:
        xi, yi = int(round(x)), int(round(y))
        x0, x1 = max(xi - blob, 0), min(xi + blob, W)
        y0, y1 = max(yi - blob, 0), min(yi + blob, H)
        for sy in (0, 1):
            for sx in (0, 1):
                val = 230.0 if (sx + sy) % 2 == 0 else 20.0
                ya = yi if sy else y0
                yb = y1 if sy else yi
                xa = xi if sx else x0
                xb = x1 if sx else xi
                img[ya:yb, xa:xb] = val
    return img
