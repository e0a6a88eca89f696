"""Fused Pallas kernel: measurement compression + EKF core in one dispatch.

The MSCKF update's dense tail — Cholesky-form measurement compression
(C = Hw^T Hw -> Hn = Lc^T, rn = Lc^-1 b), innovation covariance
S = Hn P Hn^T + sigma^2 I, Kalman gain K = P Hn^T S^-1, correction
dx = K rn, and the Joseph-form covariance update on the (24+6M)-dim P
(filter/update.py msckf_update, compression="cholesky"; reference:
src/rvio/Updater.cc:460-619) — is ~25-30 small XLA ops whose dispatch
latency dominates once the per-feature stages are fused: the builder's
stub ablation puts the un-fused tail at ~0.13 ms of the ~0.37 ms filter
step on v5e (BASELINE.md round-5 roadmap).  This kernel runs the whole
chain after the masked row stack in ONE Pallas program: two in-kernel
blocked Cholesky factorizations (8-wide panels: the 8x8 diagonal blocks
factor with unrolled scalar steps, panels solve with rank-1 MXU updates,
trailing updates are full MXU matmuls), blocked triangular solves with
the RHS on lanes, and the Joseph form as three dense MXU products.

Structural notes (Mosaic constraints, same playbook as propagate_block):

- (1,1) scalars broadcast down ONE axis only: scalar-to-column via an
  (n,1)x(1,1) ones-matmul, scalar-to-row via (1,W)*(1,1) lane broadcast;
  outer products (n,1)x(1,m) run on the MXU via dot_general.
- No relied-upon in-kernel transposes: A^T B via dot_general dimension
  numbers; where a true transpose is needed (Lc^T for Hn) it is one
  identity-contraction MXU op.
- P's symmetry supplies P H^T as rows instead of columns:
  (P Hn^T)^T = Lc^T P[24:, :], so no transpose of the big matrix exists
  anywhere in the chain.
- Padding: the 6M columns pad to a multiple of 8 with an IDENTITY
  completion in C (chol of blkdiag(C, I) = blkdiag(Lc, I)) and zero
  rows/cols in P, which propagates exact zeros into the padded rows of
  K, dx, and P_new — sliced off outside.

Equivalence contract: same as the sibling kernels — the in-kernel
factorizations reorder f32 reductions vs jnp.linalg.cholesky, so outputs
match the XLA oracle to f32 rounding (pinned in tests/test_ops.py, plus
kernel-vs-XLA full-filter trajectory parity in tests/test_update.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(A, B):
    return jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _mm_tn(A, B):                                  # A^T @ B
    return jax.lax.dot_general(A, B, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _mm_nt(A, B):                                  # A @ B^T
    return jax.lax.dot_general(A, B, (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _chol_blocked(A, N, ones_col):
    """Lower Cholesky of (N, N) A, N % 8 == 0, via 8-wide panels.

    Returns L with exact zeros above the diagonal.  A must be symmetric
    positive definite (ridge/identity-completed by the caller).  The
    inner loops are pure VPU: scalars broadcast along ONE axis at a time
    ((1,1)*(1,m) and (1,1)*(n,1)), rank-1 updates are (n,1)*(1,m)
    vector-vector broadcasts, and the symmetric trailing matrix supplies
    row vectors without transposes (col_j of a symmetric block == row_j).
    Only the panel-to-trailing updates touch the MXU.
    """
    f32 = jnp.float32
    cols8r = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    col_blocks = []
    for k in range(0, N, 8):
        # whole column panel (diag block + below) factors in ONE 8-step
        # sweep: the panel's top 8x8 is symmetric, so the rank-1 row
        # vector is panel row j — no transpose, no second loop.
        H = N - k
        Pb = jax.lax.slice(A, (k, k), (N, k + 8))              # (H, 8)
        rowsH = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
        colsH = jax.lax.broadcasted_iota(jnp.int32, (H, 8), 1)
        for j in range(8):
            d = jax.lax.slice(Pb, (j, j), (j + 1, j + 1))      # (1, 1)
            rinv = jax.lax.rsqrt(d)
            col = jax.lax.slice(Pb, (0, j), (H, j + 1)) * rinv  # (H, 1)
            col = jnp.where(rowsH >= j, col, 0.0)
            rowj = jax.lax.slice(Pb, (j, 0), (j + 1, 8)) * rinv  # (1, 8)
            rowj = jnp.where(cols8r > j, rowj, 0.0)
            Pb = jnp.where(colsH == j, col, Pb)
            Pb = Pb - col * rowj                               # VPU rank-1
        blk = (jnp.concatenate([jnp.zeros((k, 8), f32), Pb], axis=0)
               if k else Pb)                                   # (N, 8)
        col_blocks.append(blk)
        # trailing update A -= blk blk^T (rows/cols < k+8 corrupted but
        # never read again — every later slice starts at >= k+8)
        if k + 8 < N:
            A = A - _mm_nt(blk, blk)
    return jnp.concatenate(col_blocks, axis=1)


def _solve_lower(L, B, N):
    """X = L^-1 B for lower-triangular L (N, N), B (N, W), N % 8 == 0."""
    W = B.shape[1]
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
    rows8c = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    out_rows = []
    for k in range(0, N, 8):
        Bk = jax.lax.slice(B, (k, 0), (k + 8, W))
        if k > 0:
            Xprev = jnp.concatenate(out_rows, axis=0)          # (k, W)
            Lleft = jax.lax.slice(L, (k, 0), (k + 8, k))
            Bk = Bk - _mm(Lleft, Xprev)
        Lkk = jax.lax.slice(L, (k, k), (k + 8, k + 8))
        for j in range(8):
            d = jax.lax.slice(Lkk, (j, j), (j + 1, j + 1))
            rowj = jax.lax.slice(Bk, (j, 0), (j + 1, W)) * (1.0 / d)
            colv = jnp.where(rows8c > j,
                             jax.lax.slice(Lkk, (0, j), (8, j + 1)), 0.0)
            Bk = Bk - colv * rowj                              # VPU rank-1
            Bk = jnp.where(rows8 == j, rowj, Bk)
        out_rows.append(Bk)
    return jnp.concatenate(out_rows, axis=0)


def _solve_lower_t(L, B, N):
    """X = L^-T B (back substitution), shapes as in _solve_lower."""
    f32 = jnp.float32
    W = B.shape[1]
    eye8 = jnp.eye(8, dtype=f32)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
    rows8c = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    out_rows = [None] * (N // 8)
    Xlower = None
    for k in range(N - 8, -1, -8):
        Bk = jax.lax.slice(B, (k, 0), (k + 8, W))
        if k + 8 < N:
            Lbelow = jax.lax.slice(L, (k + 8, k), (N, k + 8))  # (H, 8)
            Bk = Bk - _mm_tn(Lbelow, Xlower)
        Lkk = jax.lax.slice(L, (k, k), (k + 8, k + 8))
        LkkT = _mm_tn(Lkk, eye8)
        for j in range(7, -1, -1):
            d = jax.lax.slice(Lkk, (j, j), (j + 1, j + 1))
            rowj = jax.lax.slice(Bk, (j, 0), (j + 1, W)) * (1.0 / d)
            colv = jnp.where(rows8c < j,
                             jax.lax.slice(LkkT, (0, j), (8, j + 1)), 0.0)
            Bk = Bk - colv * rowj                              # VPU rank-1
            Bk = jnp.where(rows8 == j, rowj, Bk)
        out_rows[k // 8] = Bk
        Xlower = (Bk if Xlower is None
                  else jnp.concatenate([Bk, Xlower], axis=0))
    return Xlower


def _ekf_tail_kernel(c_ref, b_ref, p_ref, par_ref, dx_ref, pn_ref, *,
                     CM, NC, D, DP, ridge_rel):
    f32 = jnp.float32
    C = c_ref[...]                                 # (NC, NC), pads zero
    b = b_ref[...]                                 # (NC, 1)
    P = p_ref[...]                                 # (DP, DP), pads zero
    sig2 = jax.lax.slice(par_ref[...], (0, 0), (1, 1))   # (1, 1)

    ones_dp = jnp.ones((DP, 1), f32)
    rows_nc = jax.lax.broadcasted_iota(jnp.int32, (NC, NC), 0)
    cols_nc = jax.lax.broadcasted_iota(jnp.int32, (NC, NC), 1)
    live_nc = (rows_nc == cols_nc) & (rows_nc < CM)      # live diag
    pad_nc = (rows_nc == cols_nc) & (rows_nc >= CM)      # identity pad

    # ridge = ridge_rel * max(trace C, 1)  (oracle: filter/update.py)
    tr = jnp.sum(jnp.where(live_nc, C, 0.0), axis=1, keepdims=True)
    tr = jnp.sum(tr, axis=0, keepdims=True)              # (1, 1)
    ridge = ridge_rel * jnp.maximum(tr, 1.0)
    ridge_col = _mm(ones_dp[:NC], ridge)                 # (NC, 1)
    C = (C + jnp.where(live_nc, ridge_col, 0.0)
         + jnp.where(pad_nc, 1.0, 0.0))

    Lc = _chol_blocked(C, NC, ones_dp)                   # (NC, NC)
    rn = _solve_lower(Lc, b, NC)                         # (NC, 1)

    # (P Hn^T)^T = Lc^T P[24:24+NC, :]  (P symmetric, zero-padded)
    P2 = jax.lax.slice(P, (24, 0), (24 + NC, DP))        # (NC, DP)
    PHtT = _mm_tn(Lc, P2)                                # (NC, DP)

    # S = Lc^T P22 Lc + sig2 I  (identity on the padded diagonal)
    S = _mm(jax.lax.slice(PHtT, (0, 24), (NC, 24 + NC)), Lc)
    ST = _mm_tn(S, jnp.eye(NC, dtype=f32))
    S = 0.5 * (S + ST)
    sig_col = _mm(ones_dp[:NC], sig2)                    # (NC, 1)
    S = (S + jnp.where(live_nc, sig_col, 0.0)
         + jnp.where(pad_nc, 1.0, 0.0))

    Ls = _chol_blocked(S, NC, ones_dp)
    Y = _solve_lower(Ls, PHtT, NC)                       # (NC, DP)
    Kt = _solve_lower_t(Ls, Y, NC)                       # (NC, DP) = K^T

    dx = _mm_tn(Kt, rn)                                  # (DP, 1)
    dx_ref[...] = dx

    # Hn (NC, DP): row i, cols 24+i <- Lc^T; padded rows stay zero
    LcT = _mm_tn(Lc, jnp.eye(NC, dtype=f32))
    rows_sel = jax.lax.broadcasted_iota(jnp.int32, (NC, DP), 0)
    cols_sel = jax.lax.broadcasted_iota(jnp.int32, (NC, DP), 1)
    Sel = ((cols_sel - 24 == rows_sel) & (rows_sel < CM)).astype(f32)
    Hn = _mm(LcT, Sel)                                   # (NC, DP)

    # Joseph: P_new = (I - K Hn) P (I - K Hn)^T + sig2 K K^T
    KH = _mm_tn(Kt, Hn)                                  # (DP, DP)
    rows_dp = jax.lax.broadcasted_iota(jnp.int32, (DP, DP), 0)
    cols_dp = jax.lax.broadcasted_iota(jnp.int32, (DP, DP), 1)
    eyeD = ((rows_dp == cols_dp) & (rows_dp < D)).astype(f32)
    Bm = eyeD - KH
    BP = _mm(Bm, P)
    Pj = _mm_nt(BP, Bm)
    KKt = _mm_tn(Kt, Kt)                                 # (DP, DP)
    sig_col_dp = _mm(ones_dp, sig2)                      # (DP, 1)
    Pn = Pj + sig_col_dp * KKt
    PnT = _mm_tn(Pn, jnp.eye(DP, dtype=f32))
    pn_ref[...] = 0.5 * (Pn + PnT)


def _ceil8(n):
    return -(-n // 8) * 8


@functools.partial(jax.jit, static_argnames=("ridge_rel", "interpret"))
def ekf_tail_pallas(C, b, P, sig2, *, ridge_rel=1e-8, interpret=False):
    """Fused compression + EKF core (see module docstring).

    C (6M, 6M) = Hw^T Hw of the masked stacked clone-block Jacobian,
    b (6M,) = Hw^T ro, P (D, D) with D = 24 + 6M, sig2 the effective
    measurement variance (traced scalar — adaptive noise).  Returns
    (dx (D,), P_new (D, D)) — the state correction and the Joseph-form
    covariance.  The caller applies the retraction and the do_update
    select (filter/update.py).
    """
    f32 = jnp.float32
    CM = C.shape[-1]
    D = P.shape[-1]
    assert D == 24 + CM, (D, CM)
    NC = _ceil8(CM)
    DP = _ceil8(D)
    C_p = jnp.pad(C.astype(f32), ((0, NC - CM), (0, NC - CM)))
    b_p = jnp.pad(b.astype(f32), (0, NC - CM))[:, None]
    P_p = jnp.pad(P.astype(f32), ((0, DP - D), (0, DP - D)))
    par = jnp.zeros((1, 8), f32).at[0, 0].set(sig2.astype(f32))

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    dx, Pn = pl.pallas_call(
        functools.partial(_ekf_tail_kernel, CM=CM, NC=NC, D=D, DP=DP,
                          ridge_rel=float(ridge_rel)),
        in_specs=[vmem()] * 4,
        out_specs=[vmem()] * 2,
        out_shape=[jax.ShapeDtypeStruct((DP, 1), f32),
                   jax.ShapeDtypeStruct((DP, DP), f32)],
        interpret=interpret,
    )(C_p, b_p, P_p, par)
    return dx[:D, 0], Pn[:D, :D]
