"""Decompose drive-workload end drift: trajectory and attitude channels.

Two modes over the same drive workload (select with DIAG_MODE):

- ``trajectory`` (default): heading vs scale vs random walk —
  - heading: angle between est and gt displacement directions over time
    (a yaw error rotates the remaining path -> drift ~ path * yaw);
  - scale: ratio of est to gt distance-travelled (a scale error stretches
    the path -> drift ~ path * |1 - s|);
- ``attitude``: per-frame attitude error (world-frame rotation log; z ~
  yaw) + gyro/accel bias estimates vs simulated truth (clean runs: any
  bias error is systematic), via a custom scan exposing (q_kG, bg, ba, g).

    DIAG_MINUTES=5 DIAG_CLEAN=1 DIAG_FEJ=0 python scripts/drift_diagnose.py
    DIAG_MODE=attitude DIAG_CLEAN=1 python scripts/drift_diagnose.py
"""

import dataclasses
import json
import os
import sys
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from bench import build_bundles
from rvio_tpu.config import RVIOConfig
from rvio_tpu.core.quaternion import quat_to_rot
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.filter.propagation import propagate
from rvio_tpu.filter.update import msckf_update
from rvio_tpu.runtime.step import make_sequence_scan
from rvio_tpu.state import augment_window, compose_state


def _setup():
    minutes = float(os.environ.get("DIAG_MINUTES", "5"))
    clean = os.environ.get("DIAG_CLEAN") == "1"
    fej = os.environ.get("DIAG_FEJ", "0") == "1"
    seed = int(os.environ.get("DIAG_SEED", "7"))
    duration = minutes * 60.0

    base = RVIOConfig()
    cfg = base.replace(tpu=dataclasses.replace(base.tpu, fej=fej))
    v = np.array([5.2, 0.8, 0.0])
    sim = simulate_sequence(cfg, duration=duration, static_time=1.5,
                            ramp_time=5.0, seed=seed, meas_noise=0.001,
                            imu_noise=not clean,
                            n_landmarks=int(105 * np.linalg.norm(v) * duration),
                            drift_velocity=v)
    s0, b0, i0 = build_bundles(cfg, sim, jnp.float32)
    return dict(minutes=minutes, clean=clean, fej=fej, seed=seed), \
        cfg, sim, s0, b0, i0


def trajectory_mode():
    meta, cfg, sim, s0, b0, i0 = _setup()
    run = make_sequence_scan(cfg)
    st, out = run(jax.tree.map(jnp.copy, s0), b0)
    est = np.asarray(out["p_Gk"])
    gt = sim.gt_p[i0:]
    T = est.shape[0]

    path_cum_gt = np.concatenate(
        [[0], np.cumsum(np.linalg.norm(np.diff(gt, axis=0), axis=1))])
    path_cum_est = np.concatenate(
        [[0], np.cumsum(np.linalg.norm(np.diff(est, axis=0), axis=1))])
    path = path_cum_gt[-1]

    # heading error over time: angle between horizontal displacement
    # directions measured over a sliding 30 s baseline
    fps = cfg.camera.fps
    w = int(30 * fps)
    rows = []
    for k in range(w, T, w):
        de = est[k] - est[k - w]
        dg = gt[k] - gt[k - w]
        de2, dg2 = de[:2], dg[:2]
        cosang = np.dot(de2, dg2) / max(
            np.linalg.norm(de2) * np.linalg.norm(dg2), 1e-12)
        ang = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
        sgn = np.sign(np.cross(dg2, de2))
        scale = np.linalg.norm(de) / max(np.linalg.norm(dg), 1e-12)
        rows.append((k / fps, sgn * ang, scale))
    rows = np.array(rows)

    end_err = float(np.linalg.norm(est[-1] - gt[-1]))
    # error split: scale-induced = |path_est - path_gt| along track;
    # heading-induced = residual lateral deviation
    de_end = est[-1] - est[0]
    dg_end = gt[-1] - gt[0]
    along = np.dot(de_end, dg_end) / max(np.linalg.norm(dg_end), 1e-12)
    lateral = float(np.sqrt(max(np.linalg.norm(de_end) ** 2 - along ** 2, 0)))
    along_err = float(along - np.linalg.norm(dg_end))

    print(json.dumps({
        **meta,
        "path_m": round(float(path), 1),
        "end_err_m": round(end_err, 2),
        "end_drift_pct": round(100 * end_err / path, 3),
        "along_track_err_m": round(along_err, 2),
        "lateral_err_m": round(lateral, 2),
        "path_scale_est_over_gt": round(
            float(path_cum_est[-1] / path), 5),
        "final_heading_err_deg": round(float(rows[-1, 1]), 3),
        "final_window_scale": round(float(rows[-1, 2]), 5),
        "n_good_mean": round(float(np.asarray(out["n_good"]).mean()), 1),
    }), flush=True)
    print("# t[s]  heading_err[deg]  window_scale")
    for t, a, s in rows[:: max(1, len(rows) // 12)]:
        print(f"#  {t:7.0f}  {a:+8.3f}  {s:.5f}")


def attitude_mode():
    meta, cfg, sim, s0, b0, i0 = _setup()
    clean = meta["clean"]

    imu_kw = dict(gravity=cfg.imu.gravity, small_angle=cfg.imu.small_angle,
                  sigma_g=cfg.imu.sigma_g, sigma_wg=cfg.imu.sigma_wg,
                  sigma_a=cfg.imu.sigma_a, sigma_wa=cfg.imu.sigma_wa,
                  parallel=cfg.tpu.parallel_propagation)
    upd_kw = dict(R_bc=cfg.camera.R_bc, t_bc=cfg.camera.t_bc,
                  sigma_im=cfg.camera.sigma_image,
                  min_clone_states=cfg.min_clone_states,
                  compression=cfg.tpu.compression,
                  use_pallas=cfg.tpu.use_pallas, fej=cfg.tpu.fej)

    def body(state, bundle):
        st = propagate(state, bundle.imu, **imu_kw)
        st, diag = msckf_update(st, bundle.batch, **upd_kw)
        st = augment_window(st)
        st, (q_kG, p_Gk, vk) = compose_state(st)
        return st, {"q_kG": q_kG, "p_Gk": p_Gk, "bg": st.bg, "ba": st.ba,
                    "g": st.g, "n_good": diag["n_good"]}

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, bundles):
        return jax.lax.scan(body, state, bundles)

    st, out = run(jax.tree.map(jnp.copy, s0), b0)
    q = np.asarray(out["q_kG"])      # JPL, {G} -> body
    bg = np.asarray(out["bg"])
    ba = np.asarray(out["ba"])
    T = q.shape[0]
    fps = cfg.camera.fps
    frame_t = sim.frame_t[i0:i0 + T]

    R_est = np.asarray(jax.vmap(quat_to_rot)(jnp.asarray(q)))  # G->b
    rows = []
    for k in range(0, T, int(15 * fps)):
        t = frame_t[k]
        idx = np.searchsorted(sim.frame_t, t)
        Rt = sim.gt_R[idx]           # truth body->world
        Re = R_est[k].T              # est body->{G} (~world when aligned)
        dR = Rt @ Re.T
        cosang = np.clip((np.trace(dR) - 1) / 2, -1, 1)
        ang = np.arccos(cosang)
        if ang > 1e-9:
            axis = (1 / (2 * np.sin(ang))) * np.array(
                [dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]])
        else:
            axis = np.zeros(3)
        err_vec = np.degrees(ang * axis)  # deg, world frame; z ~ yaw
        rows.append((t, err_vec[0], err_vec[1], err_vec[2],
                     bg[k] * 180 / np.pi * 60))  # deg/min

    bg_true = np.zeros(3) if clean else np.array([0.003, -0.002, 0.004])
    print(json.dumps({
        **meta,
        "bg_final_err_deg_per_min": [
            round(float(x), 4) for x in
            (bg[-1] - bg_true) * 180 / np.pi * 60],
        "ba_final": [round(float(x), 4) for x in ba[-1]],
    }), flush=True)
    print("# t[s]  rot_err world x/y/z [deg]   bg_est [deg/min]")
    for t, ex, ey, ez, bgv in rows:
        print(f"#  {t:6.0f}  {ex:+7.3f} {ey:+7.3f} {ez:+7.3f}   "
              f"[{bgv[0]:+6.3f} {bgv[1]:+6.3f} {bgv[2]:+6.3f}]")


if __name__ == "__main__":
    if os.environ.get("DIAG_MODE", "trajectory") == "attitude":
        attitude_mode()
    else:
        trajectory_mode()
