"""Pallas kernel: batched inverse-depth LM triangulation (lane-packed).

The MSCKF update refines each feature's [phi, psi, rho] inverse-depth
parameters with <=10 Levenberg-Marquardt iterations (reference:
src/rvio/Updater.cc:144-263).  The XLA path (filter/update._lm_triangulate,
vmapped over features) pays ~0.35 ms/frame in small-op overhead on TPU; this
kernel packs features on the VPU lane axis and unrolls every 2/3-dim tensor
contraction into scalar-component arithmetic on (L, N) arrays, so the whole
10-iteration refinement is one dense vector program.

Numerics are identical to _lm_triangulate (same cost/normal equations, same
closed-form adjugate 3x3 solve, same masked lambda schedule) up to f32
rounding-order differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_EPS_DEPTH = 1e-12
_ANGLE_BOUND = 0.5 * 3.14


def _lm_kernel(z_ref, rc_ref, tc_ref, scal_ref, out_ref, *,
               L: int, iters: int, sigma_im: float):
    dt = z_ref.dtype
    N = z_ref.shape[-1]
    # z: (L, 2, N); Rc: (L, 9, N) row-major 3x3; tc: (L, 3, N);
    # scal rows: 0 track_len, 1 phi0, 2 psi0 (atan2 is not lowerable in
    # Mosaic, so the wrapper seeds the angles).
    tlen = scal_ref[0:1, :]
    phi0 = scal_ref[1:2, :]
    psi0 = scal_ref[2:3, :]

    R = [[rc_ref[:, 3 * i + j, :] for j in range(3)] for i in range(3)]
    t = [tc_ref[:, i, :] for i in range(3)]            # (L, N) each
    zx = z_ref[:, 0, :]
    zy = z_ref[:, 1, :]

    rows = jax.lax.broadcasted_iota(jnp.int32, (L, N), 0)
    mmask = rows < tlen.astype(jnp.int32)              # (L, N)
    not_first = rows > 0                               # rho column zeroing
    rinv = 1.0 / (sigma_im * sigma_im)

    phi = phi0
    psi = psi0
    ok0 = (jnp.abs(phi) <= _ANGLE_BOUND) & (jnp.abs(psi) <= _ANGLE_BOUND)
    rho = jnp.zeros_like(phi)
    lam = jnp.full_like(phi, 0.01)
    last = jnp.full_like(phi, jnp.inf)
    done = jnp.zeros_like(phi)                         # f32 mask

    def cost_and_normal(phi, psi, rho):
        sp, cp = jnp.sin(phi), jnp.cos(phi)
        ss, cs = jnp.sin(psi), jnp.cos(psi)
        e = [cp * ss, sp, cp * cs]                     # epf (1, N) each
        # Jang (3, 2): d epf / d [phi, psi]
        Ja = [[-sp * ss, cp * cs],
              [cp, jnp.zeros_like(cp)],
              [-sp * cs, -cp * ss]]
        # h_i = sum_j R[i][j] e_j + rho t_i   -> (L, N)
        h = [R[i][0] * e[0] + R[i][1] * e[1] + R[i][2] * e[2] + rho * t[i]
             for i in range(3)]
        hz = h[2]
        hz = jnp.where(jnp.abs(hz) < _EPS_DEPTH,
                       jnp.where(hz < 0, -_EPS_DEPTH, _EPS_DEPTH), hz)
        zi = 1.0 / hz
        ex = zx - h[0] * zi
        ey = zy - h[1] * zi
        # Hp rows: [zi, 0, -h0 zi^2], [0, zi, -h1 zi^2]
        m02 = -h[0] * zi * zi
        m12 = -h[1] * zi * zi
        # RcJa[c][b] = sum_d R[c][d] Ja[d][b]  -> (L, N)
        RJ = [[R[c][0] * Ja[0][b] + R[c][1] * Ja[1][b] + R[c][2] * Ja[2][b]
               for b in range(2)] for c in range(3)]
        # HJ[a][b] = Hp[a][:] . RJ[:][b]
        HJ = [[zi * RJ[0][b] + m02 * RJ[2][b] for b in range(2)],
              [zi * RJ[1][b] + m12 * RJ[2][b] for b in range(2)]]
        # Ht[a] = Hp[a][:] . t  (d/d rho)
        Ht = [zi * t[0] + m02 * t[2],
              zi * t[1] + m12 * t[2]]
        # H columns: [HJ[:,0], HJ[:,1], Ht]; first measurement: rho col = 0
        H = [[HJ[0][0], HJ[0][1], jnp.where(not_first, Ht[0], 0.0)],
             [HJ[1][0], HJ[1][1], jnp.where(not_first, Ht[1], 0.0)]]
        exm = jnp.where(mmask, ex, 0.0)
        eym = jnp.where(mmask, ey, 0.0)
        Hm = [[jnp.where(mmask, H[a][c], 0.0) for c in range(3)]
              for a in range(2)]
        cost = rinv * jnp.sum(exm * exm + eym * eym, axis=0, keepdims=True)
        HTH = [[rinv * jnp.sum(Hm[0][i] * Hm[0][j] + Hm[1][i] * Hm[1][j],
                               axis=0, keepdims=True)
                for j in range(3)] for i in range(3)]
        HTe = [rinv * jnp.sum(Hm[0][i] * exm + Hm[1][i] * eym,
                              axis=0, keepdims=True) for i in range(3)]
        return cost, HTH, HTe

    def solve3(A, b):
        c00 = A[1][1] * A[2][2] - A[1][2] * A[2][1]
        c01 = A[1][2] * A[2][0] - A[1][0] * A[2][2]
        c02 = A[1][0] * A[2][1] - A[1][1] * A[2][0]
        det = A[0][0] * c00 + A[0][1] * c01 + A[0][2] * c02
        dets = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        x0 = (c00 * b[0]
              + (A[0][2] * A[2][1] - A[0][1] * A[2][2]) * b[1]
              + (A[0][1] * A[1][2] - A[0][2] * A[1][1]) * b[2]) / dets
        x1 = (c01 * b[0]
              + (A[0][0] * A[2][2] - A[0][2] * A[2][0]) * b[1]
              + (A[0][2] * A[1][0] - A[0][0] * A[1][2]) * b[2]) / dets
        x2 = (c02 * b[0]
              + (A[0][1] * A[2][0] - A[0][0] * A[2][1]) * b[1]
              + (A[0][0] * A[1][1] - A[0][1] * A[1][0]) * b[2]) / dets
        return x0, x1, x2

    for _ in range(iters):
        cost, HTH, HTe = cost_and_normal(phi, psi, rho)
        down = cost <= last
        A = [[HTH[i][j] + jnp.where(i == j, lam * HTH[i][j], 0.0)
              for j in range(3)] for i in range(3)]
        d0, d1, d2 = solve3(A, HTe)
        d0 = jnp.where(jnp.isfinite(d0), d0, 0.0)
        d1 = jnp.where(jnp.isfinite(d1), d1, 0.0)
        d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
        take = down & (done < 0.5)
        phi = jnp.where(take, phi + d0, phi)
        psi = jnp.where(take, psi + d1, psi)
        rho = jnp.where(take, rho + d2, rho)
        conv = (jnp.abs(last - cost) < 1e-6) & (d2 < 1e-6)
        done = jnp.where(take & conv, 1.0, done)
        lam = jnp.where(done > 0.5, lam,
                        jnp.where(down, lam * 0.1, lam * 10.0))
        last = jnp.where(done > 0.5, last, cost)

    ok = (ok0 & (jnp.abs(phi) <= _ANGLE_BOUND)
          & (jnp.abs(psi) <= _ANGLE_BOUND)
          & jnp.isfinite(rho) & (rho >= 0)
          & jnp.isfinite(phi) & jnp.isfinite(psi))
    out_ref[0:1, :] = phi
    out_ref[1:2, :] = psi
    out_ref[2:3, :] = rho
    out_ref[3:4, :] = jnp.where(ok, 1.0, 0.0).astype(dt)
    out_ref[4:8, :] = jnp.zeros((4, N), dt)


@functools.partial(jax.jit, static_argnames=("sigma_im", "iters", "interpret"))
def lm_triangulate_pallas(z, Rc, tc, track_len, *, sigma_im: float,
                          iters: int = 10, interpret: bool = False):
    """Batched LM refinement.  z: (F, L, 2); Rc: (F, L, 3, 3); tc: (F, L, 3);
    track_len: (F,) int32.  Returns (phi, psi, rho, ok) each (F,)."""
    F, L, _ = z.shape
    Fpad = -(-F // LANE) * LANE
    dt = z.dtype

    def pack(x, comps):
        x = x.reshape(F, L, comps)
        x = jnp.pad(x, ((0, Fpad - F), (0, 0), (0, 0)))
        return jnp.transpose(x, (1, 2, 0))             # (L, comps, Fpad)

    zp = pack(z, 2)
    rp = pack(Rc, 9)
    tp = pack(tc, 3)
    z0 = z[:, 0, :]
    phi0 = jnp.arctan2(z0[:, 1], jnp.sqrt(z0[:, 0] ** 2 + 1.0))
    psi0 = jnp.arctan2(z0[:, 0], jnp.ones_like(z0[:, 0]))
    scal = (jnp.zeros((8, Fpad), dt)
            .at[0, :F].set(track_len.astype(dt))
            .at[1, :F].set(phi0.astype(dt))
            .at[2, :F].set(psi0.astype(dt)))

    kern = functools.partial(_lm_kernel, L=L, iters=iters,
                             sigma_im=float(sigma_im))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, Fpad), dt),
        grid=(Fpad // LANE,),
        in_specs=[
            pl.BlockSpec((L, 2, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 9, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 3, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zp, rp, tp, scal)
    return out[0, :F], out[1, :F], out[2, :F], out[3, :F] > 0.5
