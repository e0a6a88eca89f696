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
                      drop_prob: float = 0.0,
                      drift_velocity=None) -> SyntheticSequence:
    """Generate a synthetic VIO sequence (see module docstring).

    ``drift_velocity``: optional (3,) m/s — adds a sustained cruise on top
    of the sum-of-sines excitation (velocity ramps in with the smoothstep,
    consistent accelerometer), turning the bounded workspace into a
    drive-style corridor (the 9.8 km urban-drive workload class,
    reference README.md:52).  Landmarks are then laid out along the
    corridor instead of a shell around the origin.
    """
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

    v_drift = (None if drift_velocity is None
               else np.asarray(drift_velocity, float))

    def _drift_terms(t):
        """Closed-form (p, v, a) of the cruise: v(t) = s(t) * v_drift.

        Position is the exact integral of the quintic smoothstep,
        int_0^x s = 2.5 x^4 - 3 x^5 + x^6 (0.5 at x=1), scaled by the
        ramp span, plus linear motion past the ramp.
        """
        span = ramp_t1 - ramp_t0
        x = np.clip((t - ramp_t0) / span, 0.0, 1.0)
        S1 = (2.5 * x ** 4 - 3.0 * x ** 5 + x ** 6) * span
        if t > ramp_t1:
            S1 += t - ramp_t1
        s, sd, _ = _smoothstep(t, ramp_t0, ramp_t1)
        return v_drift * S1, v_drift * s, v_drift * sd

    def pos_vel_acc(t):
        s, sd, sdd = _smoothstep(t, ramp_t0, ramp_t1)
        q = amp * np.sin(om * t + ph)
        qd = amp * om * np.cos(om * t + ph)
        qdd = -amp * om ** 2 * np.sin(om * t + ph)
        q0 = amp * np.sin(om * ramp_t0 + ph)  # anchor so p(t0)=0 shift-free
        p = s * (q - q0)
        v = sd * (q - q0) + s * qd
        a = sdd * (q - q0) + 2 * sd * qd + s * qdd
        if v_drift is not None:
            dp, dv, da = _drift_terms(t)
            p, v, a = p + dp, v + dv, a + da
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

    # --- landmarks: shell around the trajectory workspace, or (with a
    # drift velocity) a corridor of shells following the cruise path so
    # features remain visible the whole drive ---
    if v_drift is None:
        centers = rng.uniform(-1, 1, size=(n_landmarks, 3))
        radii = rng.uniform(4.0, 9.0, size=(n_landmarks, 1))
        dirs = centers / np.linalg.norm(centers, axis=1, keepdims=True)
        landmarks = dirs * radii
    else:
        t_anchor = rng.uniform(0.0, duration, size=n_landmarks)
        anchors = np.stack([pos_vel_acc(t)[0] for t in t_anchor])
        centers = rng.uniform(-1, 1, size=(n_landmarks, 3))
        dirs = centers / np.linalg.norm(centers, axis=1, keepdims=True)
        radii = rng.uniform(4.0, 9.0, size=(n_landmarks, 1))
        landmarks = anchors + dirs * radii

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

    # Corridor pruning (drift runs): a km-scale drive needs ~1e6 corridor
    # landmarks, and projecting all of them every frame is O(NL * T) —
    # candidates are pre-binned by their coordinate along the drift axis so
    # each frame projects only landmarks within visible range.  Non-drift
    # runs use the identity candidate set, which preserves the exact RNG
    # stream of the original implementation.
    if v_drift is not None:
        d_unit = v_drift / max(np.linalg.norm(v_drift), 1e-12)
        s_lm = landmarks @ d_unit
        s_order = np.argsort(s_lm)
        s_sorted = s_lm[s_order]
        # The window must cover the worst-case landmark-to-camera DISTANCE
        # a visible landmark can have: visibility bounds depth z < 25 m but
        # the ray length is z*sqrt(1+xn^2+yn^2) at the frame corners —
        # derived from the intrinsics (not hard-coded) + 1 m margin, so no
        # visible landmark is ever excluded (or dropped mid-track).
        xn_max = max(abs(10 - cx), abs(wpx - 10 - cx)) / fx
        yn_max = max(abs(10 - cy), abs(hpx - 10 - cy)) / fy
        s_window = 25.0 * float(np.sqrt(1 + xn_max ** 2 + yn_max ** 2)) + 1.0

    def project_candidates(t):
        """(ids, zn, px, vis) for this frame's candidate landmarks."""
        p_w, _, _ = pos_vel_acc(t)
        R = R_wb(t)
        p_cam_w = p_w + R @ t_bc
        R_wc = R @ R_bc
        if v_drift is None:
            ids = slice(None)
            pts = landmarks
        else:
            s_rig = p_cam_w @ d_unit
            lo = np.searchsorted(s_sorted, s_rig - s_window)
            hi = np.searchsorted(s_sorted, s_rig + s_window)
            ids = np.sort(s_order[lo:hi])
            pts = landmarks[ids]
        pc = (pts - p_cam_w) @ R_wc             # (C,3) camera coords
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            xn = pc[:, 0] / z
            yn = pc[:, 1] / z
        u = fx * xn + cx
        v = fy * yn + cy
        vis = (z > 0.4) & (z < 25.0) & (u > 10) & (u < wpx - 10) \
            & (v > 10) & (v < hpx - 10)
        return ids, np.stack([xn, yn], 1), np.stack([u, v], 1), vis

    # global-id -> per-frame local index, stamped per frame (drift mode)
    if v_drift is not None:
        map_idx = np.zeros(n_landmarks, np.int64)
        map_ver = np.full(n_landmarks, -1, np.int64)

    for k, t in enumerate(frame_t):
        ids, zn, px, vis = project_candidates(t)
        if meas_noise > 0:
            zn = zn + meas_noise * rng.normal(size=zn.shape)

        if v_drift is None:
            def loc(lm):
                return lm
            vis_ids = np.flatnonzero(vis)
        else:
            map_idx[ids] = np.arange(len(ids))
            map_ver[ids] = k

            def loc(lm):
                return map_idx[lm] if map_ver[lm] == k else -1
            vis_ids = ids[vis]

        tracked = np.zeros(N, bool)
        for s in range(N):
            lm = slot_lm[s]
            if lm >= 0:
                li = loc(lm)
                if li >= 0 and vis[li] and rng.uniform() >= drop_prob:
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
                history[s].append(zn[loc(lm)].copy())

        # refill free slots from unassigned visible landmarks
        assigned = set(slot_lm[slot_lm >= 0].tolist())
        free = [s for s in range(N) if slot_lm[s] < 0]
        if free:
            candidates = [i for i in vis_ids if i not in assigned]
            rng.shuffle(candidates)
            for s, lm in zip(free, candidates):
                slot_lm[s] = lm
                history[s] = [zn[loc(lm)].copy()]

        feat_meas[k], feat_len[k] = batch_meas, batch_len
        feat_type2[k], feat_valid[k] = batch_t2, batch_ok
        p_w, v_w, _ = pos_vel_acc(t)
        gt_p[k], gt_R[k], gt_v[k] = p_w, R_wb(t), v_w
        slot_lm_out[k] = slot_lm
        if v_drift is None:
            slot_px_out[k] = np.where(slot_lm[:, None] >= 0,
                                      px[np.clip(slot_lm, 0, None)], 0.0)
        else:
            for s in range(N):
                li = loc(slot_lm[s]) if slot_lm[s] >= 0 else -1
                slot_px_out[k, s] = px[li] if li >= 0 else 0.0

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


@dataclass(frozen=True)
class PhotometricStress:
    """Photometric degradation model for rendered frames.

    The strongest available stand-in for real-EuRoC photometric conditions
    (auto-exposure steps, lens vignetting, motion blur, sensor noise) in a
    network-free environment — each term targets a specific front-end
    failure mode:

    - exposure steps: abrupt global gain changes (AE hunting) break KLT's
      brightness-constancy assumption between template and search frame;
      CLAHE (Tracker.cc:183-202 equivalent) must absorb them;
    - vignetting: radial gain falloff makes brightness constancy violated
      anisotropically as features move outward;
    - motion blur: directional smear along the true inter-frame image
      motion destroys corner sharpness exactly when motion is fastest;
    - noise bursts: frames of heavy Gaussian noise (sensor gain spikes).

    All effects are deterministic in (seed, frame index).
    """

    exposure_gains: tuple = (1.0,)    # cycled every exposure_period_s
    exposure_period_s: float = 4.0
    vignette_strength: float = 0.0    # 0..1 corner darkening
    blur_px: float = 0.0              # max directional blur length [px]
    noise_sigma: float = 0.0          # per-pixel gaussian, gray levels
    burst_period_s: float = 0.0       # 0 = no bursts
    burst_sigma: float = 25.0
    seed: int = 0


def apply_photometric(img: np.ndarray, k: int, t: float,
                      stress: PhotometricStress,
                      flow: np.ndarray | None = None,
                      fps: float = 20.0) -> np.ndarray:
    """Apply the stress model to one rendered frame (float, gray levels).

    ``flow``: mean inter-frame image motion (dx, dy) in pixels, used to
    orient the motion blur; None disables blur for this frame.
    """
    H, W = img.shape
    out = img.astype(np.float32)

    if stress.blur_px > 0 and flow is not None:
        n = float(np.hypot(flow[0], flow[1]))
        length = min(n, stress.blur_px)
        if length > 0.5:
            d = np.asarray(flow) / max(n, 1e-9)
            S = 5
            acc = np.zeros_like(out)
            yy = np.arange(H)[:, None]
            xx = np.arange(W)[None, :]
            for i in range(S):
                f = (i / (S - 1) - 0.5) * length
                sx = np.clip(xx - int(round(f * d[0])), 0, W - 1)
                sy = np.clip(yy - int(round(f * d[1])), 0, H - 1)
                acc += out[sy, sx]
            out = acc / S

    if stress.vignette_strength > 0:
        yy, xx = np.mgrid[0:H, 0:W]
        r2 = (((xx - W / 2) / (W / 2)) ** 2 + ((yy - H / 2) / (H / 2)) ** 2)
        out = out * (1.0 - stress.vignette_strength * np.minimum(r2, 1.0))

    gains = stress.exposure_gains
    if len(gains) > 1 or gains[0] != 1.0:
        out = out * gains[int(t / stress.exposure_period_s) % len(gains)]

    sigma = stress.noise_sigma
    if stress.burst_period_s > 0:
        period_frames = max(int(round(stress.burst_period_s * fps)), 1)
        if k % period_frames == 0:
            sigma = max(sigma, stress.burst_sigma)
    if sigma > 0:
        rng = np.random.default_rng((stress.seed * 1_000_003 + k) & 0x7FFFFFFF)
        out = out + sigma * rng.standard_normal(out.shape).astype(np.float32)

    return np.clip(out, 0.0, 255.0)


def mean_flow(cfg: RVIOConfig, sim: SyntheticSequence, k: int) -> np.ndarray:
    """Mean projected landmark motion (dx, dy) px between frames k-1 and k."""
    if k == 0:
        return np.zeros(2)
    px0, v0 = project_landmarks(cfg, sim, k - 1)
    px1, v1 = project_landmarks(cfg, sim, k)
    both = v0 & v1
    if not both.any():
        return np.zeros(2)
    return (px1[both] - px0[both]).mean(axis=0)


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
