"""Batched inverse-depth MSCKF update — the filter back-end.

TPU-native re-design of reference Updater::update (src/rvio/Updater.cc:72-628).
The reference loops feature-by-feature with dynamic track lengths; here every
per-feature stage is ``vmap``-ed over a fixed feature budget F with track
length masks, so one compiled program handles every frame:

1. window-relative pose chains  — one prefix-composition scan over the clone
   window + per-feature gathers (equivalent to Updater.cc:118-141, which
   rebuilds each feature's chain sequentially);
2. inverse-depth initialization + LM refinement — fixed 10 iterations with
   masked up/down lambda logic (Updater.cc:144-263);
3. residual/Jacobian construction (Updater.cc:278-368) — built as dense
   (2L, ·) blocks with an index-mask einsum scattering chain columns to
   global clone columns;
4. feature marginalization — 3 explicit Householder reflections applied to
   [Hf | Hx | r] (orthogonally equivalent to the reference's Givens sweep,
   Updater.cc:370-402, and exactly identity on padded zero rows);
5. Mahalanobis gating against chi2(0.95, DOF) (Updater.cc:404-454);
6. measurement compression of the stacked system (Updater.cc:460-536) via
   thin QR (zero rows from masked-out features are free);
7. EKF update with multiplicative quaternion retraction and Joseph-form
   covariance (Updater.cc:538-619).

Padded/rejected lanes are masked with ``jnp.where`` (never multiply-by-mask)
so NaNs from degenerate geometry cannot leak; NaN Mahalanobis distances
auto-reject (NaN < thr is False), mirroring the reference's skip paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rvio_tpu.core.chi2 import chi2_gate_thresholds
from rvio_tpu.core.quaternion import quat_mul, quat_to_rot, small_quat_from_dtheta
from rvio_tpu.core.so3 import skew
from rvio_tpu.state.filter_state import FilterState

_EPS_DEPTH = 1e-12     # guard for divisions by h_z in projections
_ANGLE_BOUND = 0.5 * 3.14  # reference's validity bound on phi/psi (Updater.cc:154)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class UpdateBatch:
    """Fixed-shape batch of update features (the tracker's output).

    Mirrors mvFeatTypesForUpdate / mvlFeatMeasForUpdate
    (reference: Tracker.h:65-74) with static shapes: F feature lanes, each
    with up to L undistorted-normalized measurements ordered oldest first.
    """

    meas: jnp.ndarray       # (F, L, 2) normalized image points
    track_len: jnp.ndarray  # (F,) int32 — measurements in lane (0 if unused)
    is_type2: jnp.ndarray   # (F,) bool — reached-max-length feature ('2')
    valid: jnp.ndarray      # (F,) bool — lane holds a real feature


class _LMState(NamedTuple):
    phi: jnp.ndarray
    psi: jnp.ndarray
    rho: jnp.ndarray
    lam: jnp.ndarray
    last_cost: jnp.ndarray
    done: jnp.ndarray


def _unit_from_angles(phi, psi):
    """epfinv = [cos(phi)sin(psi), sin(phi), cos(phi)cos(psi)] (Updater.cc:165)."""
    return jnp.stack([jnp.cos(phi) * jnp.sin(psi), jnp.sin(phi),
                      jnp.cos(phi) * jnp.cos(psi)], axis=-1)


def _jang(phi, psi):
    """d epfinv / d [phi, psi] (reference: Updater.cc:168-171)."""
    return jnp.stack([
        jnp.stack([-jnp.sin(phi) * jnp.sin(psi), jnp.cos(phi) * jnp.cos(psi)], -1),
        jnp.stack([jnp.cos(phi), jnp.zeros_like(phi)], -1),
        jnp.stack([-jnp.sin(phi) * jnp.cos(psi), -jnp.cos(phi) * jnp.sin(psi)], -1),
    ], axis=-2)


def _safe_z(h):
    """Clamp |h_z| away from zero so projections never divide by 0."""
    z = h[..., 2]
    return jnp.where(jnp.abs(z) < _EPS_DEPTH,
                     jnp.where(z < 0, -_EPS_DEPTH, _EPS_DEPTH), z)


def _hproj(h):
    """2x3 perspective Jacobian [[1/z,0,-x/z^2],[0,1/z,-y/z^2]] (Updater.cc:191)."""
    z = _safe_z(h)
    zi = 1.0 / z
    zero = jnp.zeros_like(zi)
    row0 = jnp.stack([zi, zero, -h[..., 0] * zi * zi], axis=-1)
    row1 = jnp.stack([zero, zi, -h[..., 1] * zi * zi], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _project(h):
    z = _safe_z(h)
    return h[..., :2] / z[..., None]


def window_pose_chain(clones: jnp.ndarray, n_clones, parallel: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prefix-compose the clone window into first-window-frame-relative poses.

    Returns (Rw, tw) of shape (M+1, 3, 3)/(M+1, 3): pose transform taking
    window-frame-0 coordinates into window-frame i (x_i = Rw_i x_0 + tw_i).
    Clone c stores the frame c -> c+1 transition (q, p) with
    x_{c+1} = R(q)(x_c - p), matching the recursion at Updater.cc:125-132.
    Slots >= n_clones are identity transitions and simply extend the chain
    with its last value (harmless — masked downstream).

    ``parallel`` runs the chain as a ``lax.associative_scan`` over affine
    maps A_c: x -> R_c x + t_c (t_c = -R_c p_c), whose composition
    (R_l, t_l)∘(R_e, t_e) = (R_l R_e, R_l t_e + t_l) is associative —
    log2(M) levels of batched 3x3 matmuls instead of M serial steps (the
    same restructure as the parallel-prefix IMU propagation; single-stream
    TPU scans are latency-bound on chains of tiny ops).  Same math,
    different fp summation order (~1e-15 parity, tested).
    """
    M = clones.shape[0]
    Rc = quat_to_rot(clones[:, :4])
    pc = clones[:, 4:7]
    dtype = clones.dtype
    init = (jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype))

    if parallel:
        tc = -jnp.einsum("cij,cj->ci", Rc, pc)

        def combine(e, l):
            Re, te = e
            Rl, tl = l
            return (jnp.einsum("...ij,...jk->...ik", Rl, Re),
                    jnp.einsum("...ij,...j->...i", Rl, te) + tl)

        Rs, ts = jax.lax.associative_scan(combine, (Rc, tc))
    else:
        def step(carry, x):
            Rw, tw = carry
            R, p = x
            Rn = R @ Rw
            tn = R @ (tw - p)
            return (Rn, tn), (Rn, tn)

        _, (Rs, ts) = jax.lax.scan(step, init, (Rc, pc))
    Rw = jnp.concatenate([init[0][None], Rs], axis=0)
    tw = jnp.concatenate([init[1][None], ts], axis=0)
    return Rw, tw


def _feature_chain(Rw, tw, c0, L):
    """Per-feature chain: pose of measurement frame m relative to frame 0.

    Measurement frame m corresponds to window frame c0+m.  Returns
    (Rrel, trel) with shape (L, 3, 3)/(L, 3); entry 0 is identity, entry m
    equals the reference's mRelPosesToFirst[m-1] (Updater.cc:125-132).
    """
    idx = jnp.clip(c0 + jnp.arange(L), 0, Rw.shape[0] - 1)
    R_m = Rw[idx]            # (L,3,3) window-frame-0 -> frame c0+m
    t_m = tw[idx]
    R0, t0 = R_m[0], t_m[0]
    Rrel = R_m @ R0.T
    trel = t_m - jnp.einsum("lij,j->li", Rrel, t0)
    return Rrel, trel


def _lm_triangulate(z, Rc, tc, track_len, sigma_im, L):
    """LM refinement of [phi, psi, rho] (reference: Updater.cc:144-263).

    z: (L, 2) measurements; Rc/tc: camera-frame chain with entry 0 identity.
    Fixed 10 iterations; per-iteration up/down lambda logic expressed with
    jnp.where.  Returns (phi, psi, rho, ok).
    """
    z0 = z[0]
    phi0 = jnp.arctan2(z0[1], jnp.sqrt(z0[0] ** 2 + 1.0))
    psi0 = jnp.arctan2(z0[0], jnp.ones_like(z0[0]))
    ok0 = (jnp.abs(phi0) <= _ANGLE_BOUND) & (jnp.abs(psi0) <= _ANGLE_BOUND)

    rinv = 1.0 / sigma_im ** 2
    mmask = jnp.arange(L) < track_len  # (L,)

    def cost_and_normal(phi, psi, rho):
        epf = _unit_from_angles(phi, psi)
        Ja = _jang(phi, psi)
        h = jnp.einsum("lij,j->li", Rc, epf) + rho * tc     # (L,3); l=0 -> epf
        e = z - _project(h)                                  # (L,2)
        Hp = _hproj(h)                                       # (L,2,3)
        HJ = jnp.einsum("lab,lbc,cd->lad", Hp, Rc, Ja)       # (L,2,2)
        Ht = jnp.einsum("lab,lb->la", Hp, tc)                # (L,2) d/d rho
        Hfull = jnp.concatenate([HJ, Ht[..., None]], axis=-1)  # (L,2,3)
        # First measurement: d/d rho is exactly zero (Updater.cc:195).
        Hfull = Hfull.at[0, :, 2].set(0.0)
        e_m = jnp.where(mmask[:, None], e, 0.0)
        H_m = jnp.where(mmask[:, None, None], Hfull, 0.0)
        cost = rinv * jnp.sum(e_m * e_m)
        HTH = rinv * jnp.einsum("lab,lac->bc", H_m, H_m)
        HTe = rinv * jnp.einsum("lab,la->b", H_m, e_m)
        return cost, HTH, HTe

    def _solve3(A, b):
        """Closed-form 3x3 solve (Cramer/adjugate) — batched LU is a
        sequential LAPACK-style loop on TPU, this is pure elementwise."""
        c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
        c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
        c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
        det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
        dets = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        x0 = (c00 * b[0]
              + (A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]) * b[1]
              + (A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]) * b[2]) / dets
        x1 = (c01 * b[0]
              + (A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]) * b[1]
              + (A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]) * b[2]) / dets
        x2 = (c02 * b[0]
              + (A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]) * b[1]
              + (A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]) * b[2]) / dets
        return jnp.stack([x0, x1, x2])

    def body(s: _LMState, _):
        cost, HTH, HTe = cost_and_normal(s.phi, s.psi, s.rho)
        down = cost <= s.last_cost
        A = HTH + s.lam * jnp.diag(jnp.diag(HTH))
        dp = _solve3(A, HTe)
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0)
        take = down & ~s.done
        phi = jnp.where(take, s.phi + dp[0], s.phi)
        psi = jnp.where(take, s.psi + dp[1], s.psi)
        rho = jnp.where(take, s.rho + dp[2], s.rho)
        conv = (jnp.abs(s.last_cost - cost) < 1e-6) & (dp[2] < 1e-6)
        done = s.done | (take & conv)
        lam = jnp.where(s.done, s.lam,
                        jnp.where(down, s.lam * 0.1, s.lam * 10.0))
        last = jnp.where(s.done, s.last_cost, cost)
        return _LMState(phi, psi, rho, lam, last, done), None

    dtype = z.dtype
    init = _LMState(phi0, psi0, jnp.zeros((), dtype),
                    jnp.asarray(0.01, dtype), jnp.asarray(jnp.inf, dtype),
                    jnp.zeros((), bool))
    out, _ = jax.lax.scan(body, init, None, length=10, unroll=True)

    ok = (ok0 & (jnp.abs(out.phi) <= _ANGLE_BOUND)
          & (jnp.abs(out.psi) <= _ANGLE_BOUND)
          & jnp.isfinite(out.rho) & (out.rho >= 0)
          & jnp.isfinite(out.phi) & jnp.isfinite(out.psi))
    return out.phi, out.psi, out.rho, ok


def _build_jacobians(z, phi, psi, rho, Rrel, trel, Rc, tc, c0, t_eff,
                     R_bc, t_bc, M, Rc_res, tc_res):
    """Residual + measurement Jacobians for one feature (Updater.cc:278-368).

    Returns r (2L,), Hf (2L,3), Hx (2L, 6M); rows i>=t_eff are zero.

    The residual is always evaluated on the *current-estimate* camera chain
    (Rc_res, tc_res); the Jacobian blocks use (Rrel, trel, Rc, tc), which
    under FEJ mode is the chain built from the first-estimate clone values
    (identical arrays otherwise — XLA CSEs the duplicate work away).
    """
    L = z.shape[0]
    dtype = z.dtype
    epf = _unit_from_angles(phi, psi)
    Ja = _jang(phi, psi)
    R_cb = R_bc.T
    t_cb = -R_cb @ t_bc

    h_res = jnp.einsum("lij,j->li", Rc_res, epf) + rho * tc_res
    e = z - _project(h_res)                                   # (L,2)
    h = jnp.einsum("lij,j->li", Rc, epf) + rho * tc          # (L,3) lin. pt
    Hp = _hproj(h)                                            # (L,2,3)

    rmask = jnp.arange(L) < t_eff
    r = jnp.where(rmask[:, None], e, 0.0).reshape(2 * L)

    # Hf rows: [Hproj Rc Jang | Hproj tc]; first row pair uses rho-col = 0.
    HJ = jnp.einsum("lab,lbc,cd->lad", Hp, Rc, Ja)
    Ht = jnp.einsum("lab,lb->la", Hp, tc)
    Hf = jnp.concatenate([HJ, Ht[..., None]], axis=-1)        # (L,2,3)
    Hf = Hf.at[0, :, 2].set(0.0)
    Hf = jnp.where(rmask[:, None, None], Hf, 0.0).reshape(2 * L, 3)

    # Hx blocks: measurement i (>=1), chain column j in [0, i-1]
    # (reference: Updater.cc:341-362).  Uniform formula with R_{-1} := I:
    #   dpx_j = skew(R_bc epf + rho t_bc + rho Rrel_j^T trel_j)   [frame j+1]
    #   subH_j = [dpx_j Rrel_j^T | -rho Rprev_j^T],  Rprev_j = Rrel_{j-1}
    #   block(i, j) = Hproj_i R_cb Rrel_{i-1} subH_j
    # Chain entries here are 1-indexed by measurement: Rrel[m] = pose of
    # measurement frame m w.r.t. frame 0 (Rrel[0] = I).
    J = L - 1
    Rj = Rrel[1:]                                             # (J,3,3) chain j
    tj = trel[1:]
    Rprev = Rrel[:-1]                                         # (J,3,3) chain j-1
    pb = R_bc @ epf + rho * t_bc
    dpx = skew(pb[None] + rho * jnp.einsum("jki,jk->ji", Rj, tj))  # R_j^T t_j
    subL = jnp.einsum("jab,jcb->jac", dpx, Rj)                # dpx_j @ Rj^T
    subR = -rho * jnp.swapaxes(Rprev, -1, -2)                 # -rho Rprev^T
    subH = jnp.concatenate([subL, subR], axis=-1)             # (J,3,6)

    # Left factor per measurement i: Hproj_i @ R_cb @ Rrel[i-1]... careful:
    # reference uses R = QuatToRot(chain[i-1]) = pose of frame i (i>=1).
    left = jnp.einsum("lab,bc,lcd->lad", Hp[1:], R_cb, Rrel[1:])  # (J,2,3)
    blocks = jnp.einsum("iad,jdb->ijab", left, subH)          # (J,J,2,6)

    i_idx = jnp.arange(1, L)[:, None]                         # measurement i
    j_idx = jnp.arange(J)[None, :]                            # chain column j
    bmask = (j_idx < i_idx) & (i_idx < t_eff)
    blocks = jnp.where(bmask[..., None, None], blocks, 0.0)

    # Scatter chain column j to global clone column c0 + j via one-hot einsum.
    onehot = (j_idx.T + c0 == jnp.arange(M)[None, :]).astype(dtype)  # (J, M)
    Hx = jnp.einsum("ijab,jm->iamb", blocks, onehot)          # (J,2,M,6)
    Hx = Hx.reshape(2 * J, 6 * M)
    Hx = jnp.concatenate([jnp.zeros((2, 6 * M), dtype), Hx], axis=0)
    return r, Hf, Hx


def _householder_project(Hf, Hx, r):
    """Left-multiply [Hx | r] by Q^T from the QR of Hf (2L x 3).

    Three Householder reflections — orthogonally equivalent to the
    reference's Givens sweep (Updater.cc:381-402).  Reflection vectors have
    zero entries on padded zero rows, so padding is preserved exactly.
    Returns (R_hf, Hx_proj, r_proj); rows >= N of the projected system form
    the marginalized measurement model.

    (A compact-WY/blocked application was tried and measured SLOWER on
    TPU — at these shapes the stage is op-count/latency-bound, not
    traffic-bound, and WY adds ~15 small ops for 3 saved wide passes.)
    """
    m = Hf.shape[0]
    A = jnp.concatenate([Hf, Hx, r[:, None]], axis=1)
    rows = jnp.arange(m)
    for k in range(3):
        x = A[:, k]
        x = jnp.where(rows >= k, x, 0.0)
        normx = jnp.linalg.norm(x)
        alpha = jnp.where(x[k] >= 0, -normx, normx)
        v = x.at[k].add(-alpha)
        vnorm2 = jnp.sum(v * v)
        safe = vnorm2 > 1e-30
        beta = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        A = A - beta * jnp.outer(v, v @ A)
    return A[:, :3], A[:, 3:-1], A[:, -1]


def _cholqr2(A: jnp.ndarray, r: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tall-skinny QR of one block via two-pass Cholesky (CholeskyQR2).

    Returns (R, Q^T r) for A (b, C), r (b,) using ONLY matmuls, Cholesky,
    and triangular solves — the MXU-native factorization.  XLA's TPU
    Householder-QR lowering hangs the compiler / faulted the runtime at
    these shapes (root cause of the round-1 stress fault, see BASELINE.md),
    so the QR path never calls it on TPU.

    Exactness: with L1 from pass one and G2 = L1^-1 A^T A L1^-T,
    R = L2^T L1^T satisfies R^T R = L1 G2c L1^T = A^T A exactly (up to
    rounding) for ANY invertible pass-one factor — first-pass conditioning
    errors are repaired algebraically, so the safety completion below never
    biases the EKF.  Exactly-zero columns (masked-out clones) are completed
    with unit diagonals, which propagates to unit rows of R in those
    columns; such rows have zero residual and meet identically-zero
    covariance rows, so the update is unaffected (P's invalid-clone rows
    are zero by construction, state/filter_state.py).
    """
    dtype = A.dtype
    C = A.shape[-1]
    eye = jnp.eye(C, dtype=dtype)
    G = A.T @ A
    dead = jnp.diag(G) == 0
    # identity-complete dead columns + relative ridge for chol robustness
    # (both repaired exactly by the second pass).  The ridge must dominate
    # the Gram's accumulated rounding noise (~sqrt(rows)*eps relative), so
    # it scales with the dtype eps: ~1e-3 relative in f32, ~2e-12 in f64.
    ridge = (100 * C * jnp.finfo(dtype).eps) * jnp.maximum(
        jnp.trace(G) / C, 1.0)
    Gc = G + jnp.diag(jnp.where(dead, 1.0, ridge).astype(dtype))
    L1 = jnp.linalg.cholesky(Gc)
    Q1t = jax.scipy.linalg.solve_triangular(L1, A.T, lower=True)   # (C, b)
    q1r = jax.scipy.linalg.solve_triangular(L1, A.T @ r, lower=True)
    G2 = Q1t @ Q1t.T
    # live diag(G2) is ~1 by construction; entries far below are columns
    # whose information is dominated by the pass-one ridge (or exactly
    # dead) — complete them and strip below, a rank cut like Updater.cc:516
    dead2 = jnp.diag(G2) < 1e-6
    # G2's spectrum lies in [0, 1], but cross-column rank deficiency makes
    # its smallest eigenvalues exact zeros (minus rounding) — an eps-scale
    # ridge keeps the Cholesky finite; info error is delta2 * Gc, far below
    # measurement noise
    delta2 = 4 * C * jnp.finfo(dtype).eps
    G2c = G2 + jnp.diag(jnp.where(dead2, 1.0, delta2).astype(dtype))
    L2 = jnp.linalg.cholesky(G2c)
    R = L2.T @ L1.T
    rn = jax.scipy.linalg.solve_triangular(L2, q1r, lower=True)
    # Completed dead columns produced exact unit rows e_c in R; strip them
    # so a column dead in THIS block (but live in a sibling block of the
    # TSQR tree) contributes nothing — matching Householder's zero rows.
    gone = dead | dead2
    R = jnp.where(gone[:, None], 0.0, R)
    rn = jnp.where(gone, 0.0, rn)
    return R, rn


def tsqr_compress(Hw: jnp.ndarray, ro: jnp.ndarray, block_rows: int = 0,
                  method: str = "householder"
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked TSQR measurement compression: (R, Q^T r) of the stacked model.

    Equivalent to the reference's monolithic Givens QR (Updater.cc:474-529)
    up to an orthogonal left factor — the EKF update depends only on
    R^T R = H^T H and R^T (Q^T r) = H^T r, so the result is identical.
    Instead of one tall (F*2L, 6M) factorization, rows are reduced in a
    tree: batched block factorizations, stack the R factors, repeat — and
    the same tree is the Schur-style reduction used when the feature axis
    is sharded (each shard reduces its rows locally).

    method "householder" uses jnp.linalg.qr per block (bitwise-clean, the
    CPU/f64 choice); "cholqr2" uses the two-pass Cholesky factorization
    (:func:`_cholqr2`) — mandatory on TPU, where XLA's Householder-QR
    lowering hangs the compiler at these shapes (see BASELINE.md).
    """
    def block_qr(A, r):
        if method == "cholqr2":
            return _cholqr2(A, r)
        Q, R = jnp.linalg.qr(A, mode="reduced")
        return R, Q.T @ r

    C = Hw.shape[1]
    b = block_rows if block_rows > 0 else 8 * C
    while Hw.shape[0] > b:
        N = Hw.shape[0]
        nb = -(-N // b)
        Hp = jnp.pad(Hw, ((0, nb * b - N), (0, 0)))
        rp = jnp.pad(ro, (0, nb * b - N))
        R, rn = jax.vmap(block_qr)(Hp.reshape(nb, b, C), rp.reshape(nb, b))
        Hw = R.reshape(nb * C, C)
        ro = rn.reshape(nb * C)
    return block_qr(Hw, ro)


def msckf_update(state: FilterState, batch: UpdateBatch, *,
                 R_bc: np.ndarray, t_bc: np.ndarray, sigma_im: float,
                 min_clone_states: int, compression: str = "qr",
                 use_pallas: bool = True, parallel_chains: bool = False,
                 fej: bool = False, adaptive_noise: bool = False,
                 adaptive_alpha: float = 0.02, adaptive_rampup: int = 0,
                 ekf_tail_fused: bool = False):
    """Full measurement update; returns (new_state, diagnostics).

    Equivalent to Updater::update (reference: Updater.cc:72-628) plus the
    System-level gate that skips the update until the window has more than
    ``min_clone_states`` clones (System.cc:266).

    ``adaptive_noise`` enables innovation-based online calibration of the
    image-noise variance (no reference equivalent — the reference pins
    sigma to the config value forever, Updater.cc:44): the squared
    Mahalanobis distance of accepted features has expectation DOF when S
    is consistent, so the running ratio sum(D)/sum(dof) drives a slow
    multiplicative EMA on ``state.sigma2_scale``; the effective variance
    sigma_im^2 * scale whitens the innovations.  A conservative
    (over-stated) config sigma inflates the gain denominator, which the
    weakly-observable yaw/gyro-bias subspace integrates into a systematic
    drift equilibrium — measured 16x end-drift reduction on the clean
    drive workload when sigma matches reality (scripts/drift_diagnose, attitude mode).

    ``fej`` enables first-estimates-Jacobian mode (a consistency
    improvement over the reference, which rebuilds the chains from the
    current state every frame, Updater.cc:118-141): Hf/Hx linearize the
    window chain at the clones' augmentation-time values
    (``state.clones_fej``) while residuals, triangulation and landmark
    outputs keep using the current estimates.  Repeatedly relinearizing
    the SAME clone at different estimates across frames injects spurious
    relative-pose/scale information (the global-yaw/position directions
    are already structurally safe here: H's first 24 columns are zero);
    pinning the linearization point removes that leak.  ``fej=False`` is
    strict reference parity.
    """
    dtype = state.dtype
    F, L, _ = batch.meas.shape
    M = state.max_clones
    D = state.err_dim
    n = state.n_clones
    # static extrinsics tuples for the fused jacobian kernel (config
    # constants, not traced values)
    Rbc_t = tuple(tuple(float(v) for v in row) for row in np.asarray(R_bc))
    tbc_t = tuple(float(v) for v in np.asarray(t_bc))
    R_bc = jnp.asarray(R_bc, dtype)
    t_bc = jnp.asarray(t_bc, dtype)
    chi2 = jnp.asarray(chi2_gate_thresholds(2 * L, np.float64), dtype)

    if adaptive_noise:
        scale = jnp.clip(state.sigma2_scale, 0.01, 25.0).astype(dtype)
    else:
        scale = jnp.ones((), dtype)
    sig2_eff = (sigma_im ** 2) * scale

    # ---- window chains (shared across features) ----
    Rw, tw = window_pose_chain(state.clones, n, parallel=parallel_chains)

    tlen = batch.track_len
    c0 = jnp.where(batch.is_type2, 0, n - (tlen - 1))
    c0 = jnp.clip(c0, 0, M)

    on_tpu_f32_chains = (use_pallas and dtype == jnp.float32
                         and jax.default_backend() in ("tpu", "axon"))

    def make_chains(Rw_, tw_):
        R_cb = R_bc.T
        t_cb = -R_cb @ t_bc

        if on_tpu_f32_chains:
            # Batched one-hot window selection instead of F vmapped
            # gathers: Rw is tiny ((M+1) 3x3s), so selecting each
            # feature's L window entries is one (F*L, M+1) x (M+1, 12)
            # MXU contraction — exact (HIGHEST one-hot: every output
            # element is 1.0 * one source) and one op instead of the
            # vmapped gather's per-feature dynamic-slice chains.
            Mp1 = Rw_.shape[0]
            idx = jnp.clip(c0[:, None] + jnp.arange(L)[None, :], 0, Mp1 - 1)
            oh = (idx[..., None] == jnp.arange(Mp1)).astype(dtype)  # (F,L,Mp1)
            flat = jnp.concatenate([Rw_.reshape(Mp1, 9), tw_], axis=1)
            sel = jnp.einsum("flm,mk->flk", oh, flat,
                             precision=jax.lax.Precision.HIGHEST)
            R_m = sel[..., :9].reshape(F, L, 3, 3)
            t_m = sel[..., 9:12]
            R0 = R_m[:, 0]
            t0 = t_m[:, 0]
            Rrel = jnp.einsum("flab,fcb->flac", R_m, R0)
            trel = t_m - jnp.einsum("flab,fb->fla", Rrel, t0)
            Rc = jnp.einsum("ab,flbc,cd->flad", R_cb, Rrel, R_bc)
            tc = (jnp.einsum("ab,flbc,c->fla", R_cb, Rrel, t_bc)
                  + jnp.einsum("ab,flb->fla", R_cb, trel) + t_cb)
            return Rrel, trel, Rc, tc

        def chains(c0_f):
            Rrel, trel = _feature_chain(Rw_, tw_, c0_f, L)
            # Camera-frame chain (Updater.cc:135-141).
            Rc = jnp.einsum("ab,lbc,cd->lad", R_cb, Rrel, R_bc)
            tc = (jnp.einsum("ab,lbc,c->la", R_cb, Rrel, t_bc)
                  + jnp.einsum("ab,lb->la", R_cb, trel) + t_cb)
            return Rrel, trel, Rc, tc

        return jax.vmap(chains)(c0)

    Rrel_a, trel_a, Rc_a, tc_a = make_chains(Rw, tw)
    if fej:
        Rw_j, tw_j = window_pose_chain(state.clones_fej, n,
                                       parallel=parallel_chains)
        Rrel_j, trel_j, Rc_j, tc_j = make_chains(Rw_j, tw_j)
    else:
        Rrel_j, trel_j, Rc_j, tc_j = Rrel_a, trel_a, Rc_a, tc_a

    on_tpu_f32 = (use_pallas and dtype == jnp.float32
                  and jax.default_backend() in ("tpu", "axon"))
    if on_tpu_f32:
        # lane-packed Pallas LM (ops/lm_triangulate.py): the vmapped XLA
        # path costs ~0.35 ms/frame in small-op overhead at F=100 on v5e
        from rvio_tpu.ops.lm_triangulate import lm_triangulate_pallas
        phi_a, psi_a, rho_a, ok_lm = lm_triangulate_pallas(
            batch.meas, Rc_a, tc_a, tlen, sigma_im=sigma_im)
    else:
        phi_a, psi_a, rho_a, ok_lm = jax.vmap(
            lambda z, Rc, tc, tl: _lm_triangulate(z, Rc, tc, tl, sigma_im, L)
        )(batch.meas, Rc_a, tc_a, tlen)

    def per_feature(z, tl, typ2, c0_f, Rrel, trel, Rc, tc,
                    RrelJ, trelJ, RcJ, tcJ, phi, psi, rho, ok):
        # Type-2 truncation: only the first half of the track updates
        # (Updater.cc:271-275; Tracker.cc:317-334).
        t_eff = jnp.where(typ2, (tl + 1) // 2, tl)

        r, Hf, Hx = _build_jacobians(z, phi, psi, rho, RrelJ, trelJ, RcJ,
                                     tcJ, c0_f, t_eff, R_bc, t_bc, M, Rc, tc)

        # Rank check on the rho column before projection (Updater.cc:374-378).
        Ncols = jnp.where(jnp.linalg.norm(Hf[:, 2]) < 1e-4, 2, 3)

        _, Hx_p, r_p = _householder_project(Hf, Hx, r)
        rows = jnp.arange(2 * L)
        res_mask = (rows >= Ncols) & (rows < 2 * t_eff)
        Hx_p = jnp.where(res_mask[:, None], Hx_p, 0.0)
        r_p = jnp.where(res_mask, r_p, 0.0)
        dof = 2 * t_eff - Ncols

        # Landmark estimate in the newest window frame (Updater.cc:431-447).
        rho_safe = jnp.maximum(rho, _EPS_DEPTH)
        pfc = _unit_from_angles(phi, psi) / rho_safe
        pf1 = R_bc @ pfc + t_bc
        lastR = Rrel[jnp.clip(tl - 1, 0, L - 1)]
        lastT = trel[jnp.clip(tl - 1, 0, L - 1)]
        pfk = lastR @ pf1 + lastT
        return r_p, Hx_p, dof, ok, pfk, rho

    if on_tpu_f32:
        # Fused jacobian + nullspace projection (ops/jac_project.py):
        # the vmapped XLA chain above is ~40 small fusions whose dispatch
        # latency dominates the filter scan (stubbing it: 1855 -> 2563
        # frames/s on v5e).  The kernel emits the projected system with
        # Hx in CHAIN-RELATIVE columns; the per-feature shift to absolute
        # clone columns (c0 + jj) is one exact one-hot batched matmul.
        # Equivalence to per_feature is orthogonal (same pivot rows, fp
        # sign of a reflector may differ near zero pivots): the masked
        # rows span the identical complement of col(Hf), so the gate's
        # D and the Gram/QR-compressed information agree to rounding
        # (pinned in tests/test_ops.py::TestJacProjectKernel).
        from rvio_tpu.ops.jac_project import jac_project_pallas
        J = L - 1
        t_eff_a = jnp.where(batch.is_type2, (tlen + 1) // 2, tlen)
        r_p, Hxrel, hfn = jac_project_pallas(
            batch.meas, Rc_j, tc_j, Rrel_j, trel_j, Rc_a, tc_a,
            phi_a, psi_a, rho_a, t_eff_a,
            Rbc_t=Rbc_t, tbc_t=tbc_t, L=L)
        Ncols_a = jnp.where(hfn < 1e-4, 2, 3)
        rows_i = jnp.arange(2 * L)
        res_mask = ((rows_i[None, :] >= Ncols_a[:, None])
                    & (rows_i[None, :] < 2 * t_eff_a[:, None]))
        r_all = jnp.where(res_mask, r_p, 0.0)
        # column shift: onehot(c0 + jj == m) applied at CLONE-BLOCK level
        # — each output block receives exactly one input block, so
        # HIGHEST-precision selection is exact in f32.  (The earlier
        # (F, 6J, 6M) onehot-kron-I6 form materialized a 2.8 MB selection
        # tensor and cost 6x the MACs for the same permutation.)
        oh = (c0[:, None, None] + jnp.arange(J)[None, :, None]
              == jnp.arange(M)[None, None, :]).astype(dtype)   # (F, J, M)
        Hr = Hxrel.reshape(F, 2 * L, J, 6)
        Hx_all = jnp.einsum("frjc,fjm->frmc", Hr, oh,
                            precision=jax.lax.Precision.HIGHEST
                            ).reshape(F, 2 * L, 6 * M)
        Hx_all = jnp.where(res_mask[:, :, None], Hx_all, 0.0)
        dof_all = 2 * t_eff_a - Ncols_a
        ok_all = ok_lm
        rho_all = rho_a

        # newest-window-frame landmark (Updater.cc:431-447); the last
        # chain entry is selected with the same exact one-hot contraction
        # as the chains (vmapped gathers serialize on TPU)
        rho_safe = jnp.maximum(rho_a, _EPS_DEPTH)
        pfc = _unit_from_angles(phi_a, psi_a) / rho_safe[:, None]
        pf1 = pfc @ R_bc.T + t_bc
        ohl = (jnp.clip(tlen - 1, 0, L - 1)[:, None]
               == jnp.arange(L)).astype(dtype)              # (F, L)
        lastR = jnp.einsum("fl,flab->fab", ohl, Rrel_a,
                           precision=jax.lax.Precision.HIGHEST)
        lastT = jnp.einsum("fl,fla->fa", ohl, trel_a,
                           precision=jax.lax.Precision.HIGHEST)
        pfk_all = jnp.einsum("fab,fb->fa", lastR, pf1) + lastT
    else:
        (r_all, Hx_all, dof_all, ok_all, pfk_all,
         rho_all) = jax.vmap(per_feature)(
            batch.meas, tlen, batch.is_type2, c0, Rrel_a, trel_a, Rc_a,
            tc_a, Rrel_j, trel_j, Rc_j, tc_j, phi_a, psi_a, rho_a, ok_lm)

    # ---- Mahalanobis gating (Updater.cc:404-454) ----
    Pcl = state.P[24:, 24:]

    def build_S(Hxf):
        S = Hxf @ Pcl @ Hxf.T
        S = S + sig2_eff * jnp.eye(2 * L, dtype=dtype)
        return 0.5 * (S + S.T)

    if on_tpu_f32:
        # lane-packed Pallas Cholesky: XLA's batched cho_factor is an
        # m-step dispatch loop (~0.3 ms/frame at F=100, m=30 on v5e)
        from rvio_tpu.ops.spd_solve import batched_quadform_pallas
        S_all = jax.vmap(build_S)(Hx_all)
        D_all = jnp.abs(batched_quadform_pallas(S_all, r_all))
    else:
        def mdist(Hxf, rf):
            sol = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(build_S(Hxf), lower=True), rf)
            return jnp.abs(rf @ sol)

        D_all = jax.vmap(mdist)(Hx_all, r_all)
    thr = chi2[jnp.clip(dof_all - 1, 0, 2 * L - 1)]
    # A track of length T spans T-1 transitions; they must all exist in the
    # window (guards front-ends whose tracks predate filter init).
    usable = (batch.valid & ok_all & (tlen >= 2) & (dof_all > 0)
              & (tlen - 1 <= n))
    passed = usable & (D_all < thr)          # NaN D -> False -> rejected

    n_good = jnp.sum(passed.astype(jnp.int32))

    # ---- stack + compression (Updater.cc:460-536) ----
    Hw = jnp.where(passed[:, None, None], Hx_all, 0.0).reshape(F * 2 * L, 6 * M)
    ro = jnp.where(passed[:, None], r_all, 0.0).reshape(F * 2 * L)

    if on_tpu_f32 and compression == "cholesky" and ekf_tail_fused:
        # Fused compression + EKF core (ops/ekf_tail.py): ONE Pallas
        # dispatch with in-kernel blocked Cholesky factorizations,
        # replacing ~25 small XLA ops.  MEASURED NEGATIVE RESULT
        # (2026-08-21, v5e, sync-delta P-carry chain): the kernel runs the
        # chain in 45 us vs the XLA ops' 34.5 us in-context — XLA:TPU's
        # cholesky/triangular-solve lowerings are already latency-lean at
        # 84x84, and the kernel's two in-kernel factorizations (the
        # sequential 8-step panel sweeps) cost more than the per-op
        # overhead they eliminate; under vmap (batched segment scans) the
        # kernel SERIALIZES over the grid while vmapped XLA ops batch.
        # Kept behind tpu.ekf_tail_fused (default off) with full parity
        # tests: correct, available, not the default.  Matches the XLA
        # path below to f32 rounding (tests/test_ops.py).
        from rvio_tpu.ops.ekf_tail import ekf_tail_pallas
        C = jax.lax.dot_general(Hw, Hw, (((0,), (0,)), ((), ())))
        bb = ro @ Hw
        dx, P_new = ekf_tail_pallas(C, bb, state.P, sig2_eff)
        fused_tail = True
    elif compression == "qr":
        fused_tail = False
        # Thin QR of the stacked clone-block Jacobian; R's zero rows (rank
        # deficiency) contribute nothing to the EKF update, matching the
        # reference's explicit rank cut (Updater.cc:516-527).  On TPU the
        # factorization is CholeskyQR2-TSQR (XLA's Householder-QR lowering
        # hangs the compiler at these shapes — root cause of the round-1
        # stress fault); on CPU tall stacks use the Householder TSQR tree
        # and small ones a direct thin QR.
        if jax.default_backend() in ("tpu", "axon"):
            Hn_cl, rn = tsqr_compress(Hw, ro, method="cholqr2")
        elif Hw.shape[0] > 8 * Hw.shape[1]:
            Hn_cl, rn = tsqr_compress(Hw, ro)
        else:
            Q1, Rfac = jnp.linalg.qr(Hw, mode="reduced")
            Hn_cl = Rfac
            rn = Q1.T @ ro
    elif compression == "cholesky":
        # Information-form compression: C = Hw^T Hw = L L^T, Hn = L^T,
        # rn = L^{-1} Hw^T ro.  Exactly equivalent when C has full rank;
        # ridge-regularized on the (zero) invalid-clone diagonal.
        fused_tail = False
        C = Hw.T @ Hw
        b = Hw.T @ ro
        ridge = 1e-8 * jnp.maximum(jnp.trace(C), 1.0)
        C = C + ridge * jnp.eye(6 * M, dtype=dtype)
        Lc = jnp.linalg.cholesky(C)
        Hn_cl = Lc.T
        rn = jax.scipy.linalg.solve_triangular(Lc, b, lower=True)
    else:
        raise ValueError(f"unknown compression '{compression}'")

    if not fused_tail:
        Hn = jnp.concatenate([jnp.zeros((Hn_cl.shape[0], 24), dtype),
                              Hn_cl], axis=1)          # (6M, D)

        # ---- EKF update (Updater.cc:538-619) ----
        P = state.P
        PHt = P @ Hn.T                                 # (D, 6M)
        S = Hn @ PHt + sig2_eff * jnp.eye(Hn.shape[0], dtype=dtype)
        S = 0.5 * (S + S.T)
        cf = jax.scipy.linalg.cho_factor(S, lower=True)
        K = jax.scipy.linalg.cho_solve(cf, PHt.T).T    # (D, 6M)
        dx = K @ rn

        I_KH = jnp.eye(D, dtype=dtype) - K @ Hn
        P_new = I_KH @ P @ I_KH.T + sig2_eff * (K @ K.T)
        P_new = 0.5 * (P_new + P_new.T)

    # State retraction (Updater.cc:546-613).
    q_G = quat_mul(small_quat_from_dtheta(dx[0:3]), state.q_G)
    p_G = state.p_G + dx[3:6]
    g = state.g + dx[6:9]
    g = g / jnp.linalg.norm(g)
    q_R = quat_mul(small_quat_from_dtheta(dx[9:12]), state.q_R)
    p_R = state.p_R + dx[12:15]
    v_R = state.v_R + dx[15:18]
    bg = state.bg + dx[18:21]
    ba = state.ba + dx[21:24]
    dx_cl = dx[24:].reshape(M, 6)
    dq_cl = jax.vmap(small_quat_from_dtheta)(dx_cl[:, :3])
    q_cl = jax.vmap(quat_mul)(dq_cl, state.clones[:, :4])
    p_cl = state.clones[:, 4:7] + dx_cl[:, 3:6]
    clones = jnp.concatenate([q_cl, p_cl], axis=1)

    # Gates: >2 good features (Updater.cc:460) AND enough clones
    # (System.cc:266).  Otherwise pass the propagated state through.
    do_update = (n_good > 2) & (n > min_clone_states)

    if adaptive_noise:
        # whitening EMA: accepted D sums should match the 95 %-truncated
        # chi2 means of their DOFs (core/chi2.py); a log-space step of
        # adaptive_alpha gives a ~1/alpha-frame time constant
        from rvio_tpu.core.chi2 import chi2_truncated_means
        etrunc = jnp.asarray(chi2_truncated_means(2 * L, np.float64), dtype)
        sumD = jnp.sum(jnp.where(passed, D_all, 0.0))
        denom = jnp.sum(jnp.where(passed,
                                  etrunc[jnp.clip(dof_all - 1, 0, 2 * L - 1)],
                                  0.0))
        ratio = sumD / jnp.maximum(denom, 1e-6)
        # mass rejection (assumed sigma far below reality): plenty of
        # usable features but the gate passes almost none, so no accepted-
        # feature whitening statistic exists AND no update fires — were
        # adaptation gated on do_update alone, the scale could never move
        # in exactly the regime it must escape.  Walk it UP at full rate
        # until features re-engage (the EMA then converges it normally).
        # DISABLED in warm-start configs (adaptive_rampup > 0): there,
        # persistent mass rejection means the warm convergence failed,
        # and widening the gate lets the diverged segment re-engage on a
        # subtly wrong state — hiding the low-n_good signature the
        # handoff divergence detector and sequential repair pass key on.
        # Measured (5-min 16-way drive): escape active -> segment 1's
        # divergence undetected, 153 m ATE; escape off -> detected +
        # repaired, 0.75 m.  Warm runs have the repair machinery; the
        # escape is a COLD-start robustness feature.
        if adaptive_rampup > 0:
            mass_reject = jnp.bool_(False)
        else:
            n_usable_i = jnp.sum(usable.astype(jnp.int32))
            mass_reject = (n_usable_i >= 5) & (n_good <= 2)
        ratio = jnp.where(mass_reject, jnp.asarray(4.0, dtype), ratio)
        alpha = jnp.asarray(adaptive_alpha, dtype)
        if adaptive_rampup > 0:
            # warm-start regime (parallel/handoff.py): hold the
            # conservative initial scale by ramping DOWNWARD adaptation
            # with frame age — early over-confidence is what tips a
            # marginal warm convergence into the gate-rejection spiral;
            # upward (robust) steps stay at full rate.  NOTE: a cold
            # segment sharing the warm config (scale0 = 1) also has its
            # early down-steps slowed, so its first `adaptive_rampup`
            # frames differ slightly from an unsplit run — accepted:
            # gating the ramp on the current scale instead was measured
            # to re-open the warm-divergence hole the ramp exists to
            # close (a marginal warm segment walks its scale below 1
            # mid-warm-up and then collapses P at full rate).
            ramp = jnp.minimum(
                state.frame_idx.astype(dtype) / adaptive_rampup, 1.0)
            alpha = jnp.where(ratio < 1.0, alpha * ramp, alpha)
        stepped = scale * jnp.exp(
            alpha * jnp.log(jnp.clip(ratio, 1e-2, 1e2)))
        can_adapt = (n > min_clone_states) & (do_update | mass_reject)
        new_scale = jnp.where(can_adapt,
                              jnp.clip(stepped, 0.01, 25.0),
                              state.sigma2_scale).astype(dtype)
    else:
        new_scale = state.sigma2_scale

    def sel(a, b):
        return jnp.where(do_update, a, b)

    new_state = FilterState(
        q_G=sel(q_G, state.q_G), p_G=sel(p_G, state.p_G), g=sel(g, state.g),
        q_R=sel(q_R, state.q_R), p_R=sel(p_R, state.p_R),
        v_R=sel(v_R, state.v_R), bg=sel(bg, state.bg), ba=sel(ba, state.ba),
        clones=sel(clones, state.clones), P=sel(P_new, state.P),
        n_clones=state.n_clones, frame_idx=state.frame_idx,
        clones_fej=state.clones_fej,  # first estimates are never corrected
        sigma2_scale=new_scale,
    )
    diagnostics = {
        "n_good": n_good, "passed": passed, "mahalanobis": D_all,
        "landmarks": pfk_all, "rho": rho_all, "did_update": do_update,
        # acceptance-distribution counters (front-end quality regressions
        # must not hide behind a stable ATE — VERDICT r2 weak #5):
        # candidates that reached the chi2 gate, and the summed track
        # length of the accepted ones (mean length = sum / n_good).
        "n_usable": jnp.sum(usable.astype(jnp.int32)),
        "tl_good_sum": jnp.sum(jnp.where(passed, tlen, 0)),
    }
    return new_state, diagnostics
