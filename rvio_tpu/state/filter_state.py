"""The robocentric filter state — the central data structure.

Layout mirrors the reference exactly (verified from System.cc:142-149,
326-331 and PreIntegrator.cc:55-60; see SURVEY.md section 2.1), but with the
clone window held at its *maximum* size M at all times and masked by
``n_clones`` during the growth phase, so every jitted program has static
shapes.  With the EuRoC config (M=14): x is 124 floats, P is 108x108.

Full state x (structured):
    q_G  (4)  global-frame orientation in current robocentric frame {Rk} (JPL)
    p_G  (3)  global origin position in {Rk}
    g    (3)  unit gravity direction in {Rk} (gravity is a state)
    q_R  (4)  relative rotation {Rk} -> current IMU frame (identity at frame start)
    p_R  (3)  relative translation (zero at frame start)
    v_R  (3)  velocity in current IMU frame
    bg   (3)  gyro bias
    ba   (3)  accel bias
    clones (M, 7)  relative poses (q, p) of the window frames, oldest first

Error state / covariance P (24 + 6M square):
    [dθG, dpG, dg, dθR, dpR, dvR, dbg, dba] (3 each), then 6 per clone.
Invalid clone rows/cols of P are identically zero; invalid clone quats are
identity.  This keeps every operation (propagation Psi product, update
Jacobian stacking, augmentation-by-gather) correct without shape changes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rvio_tpu.core.quaternion import rot_to_quat
from rvio_tpu.core.so3 import skew


class StateIndex:
    """Error-state block indices (reference: PreIntegrator.cc:123-131)."""

    TH_G = 0    # dθG
    P_G = 3     # dpG
    G = 6       # dg
    TH_R = 9    # dθR
    P_R = 12    # dpR
    V_R = 15    # dvR
    BG = 18     # dbg
    BA = 21     # dba
    CORE = 24   # clones start here; 6 per clone
    CLONE = 6


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FilterState:
    """Pytree filter state; all leaves fixed-shape."""

    q_G: jnp.ndarray        # (4,)
    p_G: jnp.ndarray        # (3,)
    g: jnp.ndarray          # (3,)
    q_R: jnp.ndarray        # (4,)
    p_R: jnp.ndarray        # (3,)
    v_R: jnp.ndarray        # (3,)
    bg: jnp.ndarray         # (3,)
    ba: jnp.ndarray         # (3,)
    clones: jnp.ndarray     # (M, 7) [qx qy qz qw px py pz], oldest first
    P: jnp.ndarray          # (24+6M, 24+6M)
    n_clones: jnp.ndarray   # () int32 — valid clones
    frame_idx: jnp.ndarray  # () int32 — images processed since init
    # First-estimate (FEJ) clone transitions: each slot holds the clone's
    # value at augmentation time and is NEVER corrected by EKF updates (it
    # shifts with the window like ``clones``).  With ``tpu.fej`` the update
    # Jacobians linearize the window chain here while residuals use the
    # current ``clones`` — pinning the chain's linearization point so
    # repeated relinearization of shared clones across frames cannot
    # inject spurious relative-pose/scale information (the consistency
    # defect the reference inherits by re-deriving chains from the current
    # state every frame, Updater.cc:118-141).  No reference equivalent.
    clones_fej: jnp.ndarray  # (M, 7)
    # Adaptive measurement-noise scale (tpu.adaptive_noise): multiplicative
    # factor on sigma_im^2, EMA-driven toward whitened innovations
    # (E[r^T S^-1 r] = DOF).  A mis-specified image noise feeds the classic
    # weak-direction (yaw/bias) drift equilibrium — the reference pins
    # sigma to the config value forever (Updater.cc:44).  1.0 = nominal.
    sigma2_scale: jnp.ndarray  # () scalar

    @property
    def max_clones(self) -> int:
        return self.clones.shape[0]

    @property
    def err_dim(self) -> int:
        return self.P.shape[0]

    @property
    def dtype(self):
        return self.P.dtype

    def flat_x(self) -> jnp.ndarray:
        """Reference-layout flat state vector (26 + 7M,) for parity checks."""
        return jnp.concatenate([
            self.q_G, self.p_G, self.g, self.q_R, self.p_R, self.v_R,
            self.bg, self.ba, self.clones.reshape(-1),
        ])


def make_initial_state(max_clones: int, dtype=jnp.float32) -> FilterState:
    """Zero state with identity quaternions (pre-initialization placeholder)."""
    qid = jnp.array([0, 0, 0, 1], dtype=dtype)
    clones = jnp.tile(jnp.array([0, 0, 0, 1, 0, 0, 0], dtype=dtype),
                      (max_clones, 1))
    d = 24 + 6 * max_clones
    return FilterState(
        q_G=qid, p_G=jnp.zeros(3, dtype), g=jnp.array([0, 0, 1], dtype=dtype),
        q_R=qid, p_R=jnp.zeros(3, dtype), v_R=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype), ba=jnp.zeros(3, dtype), clones=clones,
        P=jnp.zeros((d, d), dtype), n_clones=jnp.int32(0),
        frame_idx=jnp.int32(0), clones_fej=jnp.copy(clones),
        sigma2_scale=jnp.ones((), dtype),
    )


def static_initialize(w_avg: jnp.ndarray, a_avg: jnp.ndarray, n_imu,
                      *, gravity: float, imu_rate: float,
                      sigma_a: float, sigma_wg: float, sigma_wa: float,
                      enable_alignment: bool, max_clones: int,
                      sigma_v0: float = 0.0,
                      use_bias_estimates=True,
                      dR_since_avg=None) -> FilterState:
    """Build the initial filter state from a static-window IMU average.

    Mirrors System::initialize (reference: System.cc:115-170):
    - gravity direction g = a_avg / |a_avg| in {R0};
    - optional gravity-aligned {G} axes -> q_G;
    - biases bg = w_avg, ba = a_avg - G*g when >1 static samples were seen;
    - P0 diagonal scaled by the static duration n_imu/imu_rate.

    ``dR_since_avg``: optional (3,3) body rotation accumulated between the
    (frozen) static-average window and the gate-fire frame, from gyro
    integration (init.forward_rotate_attitude).  The reference initializes
    the attitude directly from the running average (System.cc:119-140), so
    any sub-threshold rotation before the motion gate fires becomes a
    CONSTANT unobservable attitude/gauge error of the {G} frame (measured:
    ~1.5 deg on the drive workload's gentle ramp -> ~2 % of path as pure
    lateral drift).  Transporting the averaged gravity/axes into the fire
    frame (v_fire = dR^T v_onset) removes it; bias components are
    body-fixed and need no transport.

    ``n_imu`` and ``use_bias_estimates`` may be traced values.
    """
    dtype = w_avg.dtype
    g = a_avg / jnp.linalg.norm(a_avg)

    # Gravity-aligned {G}: z along g, x = e_x orthogonalized, y = z × x
    # (reference: System.cc:122-140).
    zv = g
    ex = jnp.array([1.0, 0.0, 0.0], dtype=dtype)
    xv = ex - zv * jnp.dot(zv, ex)
    xv = xv / jnp.linalg.norm(xv)
    yv = skew(zv) @ xv
    yv = yv / jnp.linalg.norm(yv)
    R_aligned = jnp.stack([xv, yv, zv], axis=-1)
    R = R_aligned if enable_alignment else jnp.eye(3, dtype=dtype)

    st = make_initial_state(max_clones, dtype)
    use_bias = jnp.asarray(use_bias_estimates)
    bg = jnp.where(use_bias, w_avg, jnp.zeros(3, dtype))
    ba = jnp.where(use_bias, a_avg - gravity * g, jnp.zeros(3, dtype))

    if dR_since_avg is not None:
        # transport gravity + {G} axes from the average window's body frame
        # into the fire frame: v_fire = dR^T v_onset (biases are body-fixed)
        dRT = jnp.asarray(dR_since_avg, dtype).T
        g = dRT @ g
        g = g / jnp.linalg.norm(g)
        R = dRT @ R

    n_imu = jnp.asarray(n_imu, dtype=dtype)
    dt = 1.0 / imu_rate
    diag = jnp.zeros(24 + 6 * max_clones, dtype)
    diag = diag.at[0:6].set(1e-3 ** 2)                      # qG, pG
    diag = diag.at[6:9].set(n_imu * dt * sigma_a ** 2)      # g
    diag = diag.at[15:18].set(sigma_v0 ** 2)                # vR (see config)
    diag = diag.at[18:21].set(n_imu * dt * sigma_wg ** 2)   # bg
    diag = diag.at[21:24].set(n_imu * dt * sigma_wa ** 2)   # ba
    P = jnp.diag(diag)

    return FilterState(
        q_G=rot_to_quat(R), p_G=st.p_G, g=g, q_R=st.q_R, p_R=st.p_R,
        v_R=st.v_R, bg=bg, ba=ba, clones=st.clones, P=P,
        n_clones=jnp.int32(0), frame_idx=jnp.int32(0),
        clones_fej=jnp.copy(st.clones), sigma2_scale=st.sigma2_scale,
    )


def clone_err_slice(i: int) -> slice:
    """Error-state rows of clone i."""
    return slice(StateIndex.CORE + 6 * i, StateIndex.CORE + 6 * i + 6)
