"""Fused Pallas kernel: per-feature Jacobian build + nullspace projection.

The MSCKF update's per-feature front half — residuals, measurement
Jacobians Hf/Hx, and the 3-reflection Householder nullspace projection
(filter/update._build_jacobians + _householder_project; reference:
src/rvio/Updater.cc:278-402) — is ~40 small XLA fusions per frame when
vmapped over features, and the filter scan pays their dispatch latency
serially: stubbing exactly this chain moves the flagship filter scan from
~1855 to ~2563 frames/s (measured 2026-08-21, v5e).  This kernel runs the
whole chain lane-packed (features on lanes, track/chain index on
sublanes, small tensor indices unrolled on leading dims) in ONE dispatch.

Structural choices that keep it exactly equivalent to the XLA oracle:

- **Relative chain columns.**  The Householder projection acts on ROWS,
  so the kernel builds Hx in chain-relative columns (jj = 0..L-2) and the
  per-feature shift to absolute clone columns (c0 + jj) happens OUTSIDE
  as one batched one-hot matmul (exact: each output column receives
  exactly one input column) — per-lane dynamic column placement is the
  one thing the TPU cannot do in-kernel.
- **Outer-product block build.**  blocks[i, jj, a, b] = sum_d
  left[i, a, d] subH[jj, d, b] is three (84, 1, F) x (1, 2L, F)
  broadcast-FMAs: left lives naturally with the measurement index on
  sublanes, and the 84 (jj, b) coefficients are gathered to the leading
  axis with static one-row slices.
- **Oracle pivot order.**  Rows live in block order (a*L + l) in-kernel
  (interleaved 2l+a order would need an unsupported sublane-merge
  reshape), but the three reflections pivot on rows [0, L, 1] — exactly
  the oracle's first three rows (2l+a order rows 0, 1, 2) — so the
  projected matrix is a static row PERMUTATION of the oracle's, undone
  on the XLA side.  Outputs match the oracle to f32 reduction-order
  rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _jac_project_kernel(z_ref, rcl_ref, tcl_ref, rrl_ref, trl_ref,
                        rcr_ref, tcr_ref, ang_ref, teff_ref,
                        out_ref, hfn_ref, *, L, Rbc, tbc):
    """One 128-feature block.  See module docstring for layouts."""
    f32 = jnp.float32
    J = L - 1
    Fb = z_ref.shape[2]
    # Depth guard — DELIBERATELY wider than the XLA path's _EPS_DEPTH
    # (1e-12, filter/update.py): the kernel is all-f32, and the Householder
    # reflector norms square the perspective rows (entries up to h_x/h_z^2 =
    # 1/eps^2), so eps=1e-12 would overflow f32 (1/eps^4 = 1e48 > f32 max)
    # while 1e-6 caps the squared norms at ~1e24.  Features with |h_z| in
    # (1e-12, 1e-6) therefore clamp differently from the oracle — a regime
    # LM triangulation rejects (rho/angle bounds, Updater.cc:265-269) and
    # the chi2 gate would discard; behavior pinned by
    # tests/test_ops.py::TestJacProjectKernel::test_degenerate_depth_clamps.
    eps = 1e-6

    phi = ang_ref[0]                             # (1, Fb)
    psi = ang_ref[1]
    rho = ang_ref[2]
    teff = teff_ref[0]                           # (1, Fb) float

    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    epf = (cphi * spsi, sphi, cphi * cpsi)       # 3 x (1, Fb)
    # Ja[c][g] = d epf_c / d (phi, psi)  (Updater.cc:168-171)
    Ja = ((-sphi * spsi, cphi * cpsi),
          (cphi, jnp.zeros_like(phi)),
          (-sphi * cpsi, -cphi * spsi))

    lidx = (jax.lax.broadcasted_iota(jnp.int32, z_ref.shape[1:], 0)
            .astype(f32))                        # (Lp, Fb) row index l
    mvalid = lidx < teff                         # l < t_eff

    def chain_h(rc_ref, tc_ref):
        """h[c] = sum_d Rc[c, d] epf[d] + rho tc[c] -> 3 x (Lp, Fb)."""
        return [
            rc_ref[c, 0] * epf[0] + rc_ref[c, 1] * epf[1]
            + rc_ref[c, 2] * epf[2] + rho * tc_ref[c]
            for c in range(3)
        ]

    def safe_z(hz):
        return jnp.where(jnp.abs(hz) < eps,
                         jnp.where(hz < 0, -eps, eps), hz)

    # residual on the current-estimate chain
    hr = chain_h(rcr_ref, tcr_ref)
    zr = safe_z(hr[2])
    e = [jnp.where(mvalid, z_ref[a] - hr[a] / zr, 0.0) for a in range(2)]

    # linearization chain
    hl = chain_h(rcl_ref, tcl_ref)
    zi = 1.0 / safe_z(hl[2])
    zero = jnp.zeros_like(zi)
    # Hp[a][b]: rows of the 2x3 perspective Jacobian (Updater.cc:191)
    Hp = ((zi, zero, -hl[0] * zi * zi),
          (zero, zi, -hl[1] * zi * zi))

    # Hf = [Hp Rc Ja | Hp tc], first measurement's rho column zeroed
    RJ = [[sum(rcl_ref[b, c] * Ja[c][g] for c in range(3))
           for g in range(2)] for b in range(3)]
    not_first = lidx >= 1.0
    Hf = [[None] * 3 for _ in range(2)]
    for a in range(2):
        for g in range(2):
            Hf[a][g] = jnp.where(
                mvalid, sum(Hp[a][b] * RJ[b][g] for b in range(3)), 0.0)
        ht = sum(Hp[a][b] * tcl_ref[b] for b in range(3))
        Hf[a][2] = jnp.where(mvalid & not_first, ht, 0.0)

    # pre-projection rank check: || Hf[:, rho] ||  (Updater.cc:374-378)
    hfn2 = (jnp.sum(Hf[0][2] * Hf[0][2], axis=0, keepdims=True)
            + jnp.sum(Hf[1][2] * Hf[1][2], axis=0, keepdims=True))
    hfn_ref[...] = jnp.sqrt(hfn2)                # (1, Fb)

    # ---- Hx blocks, chain-relative columns (Updater.cc:341-362) ----
    # Full-tile factors with the chain/measurement index on sublanes:
    #   subL[p][d][b] = (skew(pb + rho R_p^T t_p) R_p^T)[d, b]   at row p
    #   subR[p][d][b] = -rho R_p^T[d, b]                          at row p
    #   left[p][a][d] = (Hp_p R_cb Rrel_p)[a, d]                  at row p
    # Column jj (0..J-1) of the stacked Jacobian reads subL at row jj+1
    # and subR at row jj; measurement rows i use left at row i.
    pb = [Rbc[c][0] * epf[0] + Rbc[c][1] * epf[1] + Rbc[c][2] * epf[2]
          + rho * tbc[c] for c in range(3)]
    w = [pb[c] + rho * sum(rrl_ref[d, c] * trl_ref[d] for d in range(3))
         for c in range(3)]
    dpx = ((zero, -w[2], w[1]),
           (w[2], zero, -w[0]),
           (-w[1], w[0], zero))
    subL = [[sum(dpx[d][k] * rrl_ref[b, k] for k in range(3))
             for b in range(3)] for d in range(3)]
    # R_cb = R_bc^T; HpRcb[a][k] = sum_b Hp[a][b] R_bc[k][b]
    HpRcb = [[sum(Hp[a][b] * Rbc[k][b] for b in range(3))
              for k in range(3)] for a in range(2)]
    left = [[sum(HpRcb[a][k] * rrl_ref[k, d] for k in range(3))
             for d in range(3)] for a in range(2)]

    def row(t, j):                               # (1, Fb) row j of (Lp, Fb)
        return jax.lax.slice_in_dim(t, j, j + 1, axis=0)

    # S_d: the 84 (jj, b) coefficients on the leading axis
    S = []
    for d in range(3):
        rows_d = []
        for jj in range(J):
            for b in range(6):
                if b < 3:
                    rows_d.append(row(subL[d][b], jj + 1))
                else:
                    rows_d.append(-rho * row(rrl_ref[b - 3, d], jj))
        S.append(jnp.stack(rows_d, axis=0))      # (6J, 1, Fb)

    def to_rows(x0, x1):
        """two (Lp, Fb) halves -> (2L, Fb) block-row-ordered column."""
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x0, 0, L, axis=0),
             jax.lax.slice_in_dim(x1, 0, L, axis=0)], axis=0)

    # Lf_d: measurement factor over block rows (1, 2L, Fb)
    Lf = [to_rows(left[0][d], left[1][d])[None] for d in range(3)]

    HX = S[0] * Lf[0] + S[1] * Lf[1] + S[2] * Lf[2]   # (6J, 2L, Fb)

    # mask: block (i, jj) exists iff jj < i and i < t_eff (i = row % L)
    shp3 = (6 * J, 2 * L, Fb)
    jj_of_col = jax.lax.broadcasted_iota(jnp.int32, shp3, 0) // 6
    i_of_row = jax.lax.broadcasted_iota(jnp.int32, shp3, 1) % L
    riota = jax.lax.broadcasted_iota(jnp.int32, (2 * L, Fb), 0)
    ivalid = ((riota % L).astype(f32) < teff)             # (2L, Fb)
    HX = jnp.where((jj_of_col < i_of_row) & ivalid[None], HX, 0.0)

    # ---- assemble A = [Hf | Hx_rel | r] and project ----
    cols = [to_rows(Hf[0][k], Hf[1][k]) for k in range(3)]
    A = jnp.concatenate(
        [jnp.stack(cols, axis=0), HX,
         to_rows(e[0], e[1])[None]], axis=0)      # (3 + 6J + 1, 2L, Fb)

    # Householder projection, pivots [0, L, 1] == oracle rows 0, 1, 2
    # (filter/update._householder_project; Updater.cc:381-402)
    pivots = (0, L, 1)
    done = jnp.zeros((2 * L, Fb), bool)
    for k in range(3):
        p = pivots[k]
        x = jnp.where(done, 0.0, A[k])           # (2L, Fb)
        normx = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
        xp = jax.lax.slice_in_dim(x, p, p + 1, axis=0)
        alpha = jnp.where(xp >= 0, -normx, normx)
        v = jnp.where(riota == p, x - alpha, x)
        vnorm2 = jnp.sum(v * v, axis=0, keepdims=True)
        safe = vnorm2 > 1e-30
        beta = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        wv = jnp.sum(v[None] * A, axis=1, keepdims=True)  # (ncols, 1, Fb)
        A = A - beta[None] * v[None] * wv
        done = done | (riota == p)

    out_ref[...] = A


def _pack_chain(R, t):
    """(F, L, 3, 3)/(F, L, 3) -> (3, 3, Lp, Fp)/(3, Lp, Fp) lane-packed."""
    F, L = R.shape[0], R.shape[1]
    Lp = -(-L // 8) * 8
    Fp = -(-F // LANES) * LANES
    Rp = jnp.pad(jnp.transpose(R, (2, 3, 1, 0)),
                 ((0, 0), (0, 0), (0, Lp - L), (0, Fp - F)))
    tp = jnp.pad(jnp.transpose(t, (2, 1, 0)),
                 ((0, 0), (0, Lp - L), (0, Fp - F)))
    return Rp, tp


@functools.partial(
    jax.jit, static_argnames=("Rbc_t", "tbc_t", "L", "interpret"))
def jac_project_pallas(z, Rc_lin, tc_lin, Rrel_lin, trel_lin,
                       Rc_res, tc_res, phi, psi, rho, t_eff,
                       *, Rbc_t, tbc_t, L, interpret=False):
    """Batched fused jacobian + nullspace projection.

    Inputs are the per-feature arrays of filter/update.msckf_update:
    z (F, L, 2), chains (F, L, 3, 3)/(F, L, 3) — ``_lin`` is the
    linearization (FEJ) chain, ``_res`` the current-estimate chain used
    for the residual — phi/psi/rho/t_eff (F,).  ``Rbc_t``/``tbc_t`` are
    the camera extrinsics as nested tuples (static).

    Returns (r_p (F, 2L), Hxrel_p (F, 2L, 6(L-1)), hf_rho_norm (F,)) with
    rows in the oracle's (2l + a) order and Hx columns CHAIN-relative —
    shift to absolute clone columns with a one-hot matmul outside.
    """
    F = z.shape[0]
    J = L - 1
    Fp = -(-F // LANES) * LANES
    f32 = jnp.float32
    Lp = -(-L // 8) * 8

    zp = jnp.pad(jnp.transpose(z, (2, 1, 0)),
                 ((0, 0), (0, Lp - L), (0, Fp - F))).astype(f32)
    rcl, tcl = _pack_chain(Rc_lin.astype(f32), tc_lin.astype(f32))
    rrl, trl = _pack_chain(Rrel_lin.astype(f32), trel_lin.astype(f32))
    rcr, tcr = _pack_chain(Rc_res.astype(f32), tc_res.astype(f32))
    ang = jnp.pad(jnp.stack([phi, psi, rho]).astype(f32)[:, None, :],
                  ((0, 0), (0, 0), (0, Fp - F)))
    tf = jnp.pad(t_eff.astype(f32)[None, None, :],
                 ((0, 0), (0, 0), (0, Fp - F)))

    ncols = 3 + 6 * J + 1
    rows = 2 * L

    def spec(shape):
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        return pl.BlockSpec(blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,),
                            memory_space=pltpu.VMEM)

    out, hfn = pl.pallas_call(
        functools.partial(_jac_project_kernel, L=L, Rbc=Rbc_t, tbc=tbc_t),
        grid=(Fp // LANES,),
        in_specs=[spec(zp.shape), spec(rcl.shape), spec(tcl.shape),
                  spec(rrl.shape), spec(trl.shape), spec(rcr.shape),
                  spec(tcr.shape), spec(ang.shape), spec(tf.shape)],
        out_specs=[spec((ncols, rows, Fp)), spec((1, Fp))],
        out_shape=[jax.ShapeDtypeStruct((ncols, rows, Fp), f32),
                   jax.ShapeDtypeStruct((1, Fp), f32)],
        interpret=interpret,
    )(zp, rcl, tcl, rrl, trl, rcr, tcr, ang, tf)

    # (ncols, rows_block, Fp) -> per-feature (F, rows_oracle, ncols):
    # block row a*L + l  ->  oracle row 2l + a (static permutation)
    perm = np.empty(rows, np.int32)
    for a in range(2):
        for l in range(L):
            perm[2 * l + a] = a * L + l
    Af = jnp.transpose(out[:, :, :F], (2, 1, 0))[:, perm, :]  # (F, 2L, nc)
    r_p = Af[:, :, ncols - 1]
    Hxrel_p = Af[:, :, 3:3 + 6 * J]
    return r_p, Hxrel_p, hfn[0, :F]
