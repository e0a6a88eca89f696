"""Attitude-level drift diagnosis: yaw/roll/pitch error + bias estimates.

Runs the drive with a custom scan exposing (q_kG, bg, ba, g) per frame and
compares against simulator truth: is the systematic heading drift an
attitude-state yaw error, and does the gyro-bias estimate wander from truth
(clean runs: truth is exactly zero)?

    DIAG_MINUTES=5 DIAG_CLEAN=1 python scripts/drift_diagnose2.py
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
from rvio_tpu.state import augment_window, compose_state


def main():
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
    est_p = np.asarray(out["p_Gk"])
    q = np.asarray(out["q_kG"])  # JPL: rotation {G} -> body? (q_kG = qk x qG)
    bg = np.asarray(out["bg"])
    ba = np.asarray(out["ba"])
    T = est_p.shape[0]
    fps = cfg.camera.fps
    frame_t = sim.frame_t[i0:i0 + T]

    # R_est maps {G} coords -> body coords (JPL q_kG); truth R_wb maps
    # body -> world, so R_err = R_wb_est^T ... careful: compare body->world
    # R_est_bw = quat_to_rot(q)^T when alignment made {G} ~ world.
    R_est = np.asarray(jax.vmap(quat_to_rot)(jnp.asarray(q)))  # G->b
    rows = []
    for k in range(0, T, int(15 * fps)):
        t = frame_t[k]
        # truth body->world at frame time
        idx = np.searchsorted(sim.frame_t, t)
        Rt = sim.gt_R[idx] if hasattr(sim, "gt_R") else None
        Re = R_est[k].T  # body->G
        dR = Rt @ Re.T if Rt is not None else np.eye(3)
        # rotation error vector (world frame): log(dR)
        cosang = np.clip((np.trace(dR) - 1) / 2, -1, 1)
        ang = np.arccos(cosang)
        if ang > 1e-9:
            axis = (1 / (2 * np.sin(ang))) * np.array(
                [dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]])
        else:
            axis = np.zeros(3)
        err_vec = np.degrees(ang * axis)  # deg, world frame; z ~ yaw
        rows.append((t, err_vec[0], err_vec[1], err_vec[2],
                     bg[k] * 180 / np.pi * 60,  # deg/min
                     ba[k]))

    bg_true = np.zeros(3) if clean else np.array([0.003, -0.002, 0.004])
    print(json.dumps({
        "minutes": minutes, "clean": clean, "fej": fej,
        "bg_final_err_deg_per_min": [
            round(float(x), 4) for x in
            (bg[-1] - bg_true) * 180 / np.pi * 60],
        "ba_final": [round(float(x), 4) for x in ba[-1]],
    }), flush=True)
    print("# t[s]  rot_err world x/y/z [deg]   bg_est [deg/min]")
    for r in rows:
        t, ex, ey, ez, bgv, bav = r
        print(f"#  {t:6.0f}  {ex:+7.3f} {ey:+7.3f} {ez:+7.3f}   "
              f"[{bgv[0]:+6.3f} {bgv[1]:+6.3f} {bgv[2]:+6.3f}]")


if __name__ == "__main__":
    main()
