"""Fused Pallas kernel: whole-frame IMU propagation in one dispatch.

The per-frame propagation (filter/propagation.py; reference:
src/rvio/PreIntegrator.cc:97-191) is ~0.1 MFLOP of 3x3/24x24 algebra over
a K=16 sample block — pure op-dispatch latency as XLA ops: the
parallel-prefix XLA path still costs ~0.12 ms/frame of the 0.42 ms filter
step on v5e (stub ablation, 2026-08-21).  This kernel unrolls the exact
sequential per-sample recursion (the fp-order ORACLE, ``parallel=False``
in filter/propagation.py) inside one Pallas program: every operand stays
VMEM-resident and the ~40 tiny ops per sample cost issue slots instead
of dispatches.

Mosaic-specific shapes (the constraints that shaped this code):

- no (1,1) -> (r,c) broadcasts ("both sublanes and lanes"): per-sample
  scalars are packed into one (1, 8) row and broadcast down sublanes with
  a single (24,1)x(1,8) matmul per sample; scalar-times-matrix is then a
  (r,1) column times (r,c) lane-broadcast (legal);
- no in-kernel transposes: A^T B / A B^T run as dot_general with
  transposed dimension numbers, and skew(v) is built column-wise from
  three constant 3x3 selection matmuls;
- the small-angle branches blend arithmetically (small is exactly 0/1,
  both branches are finite), so no (1,1)-conditioned matrix selects.

Padded samples are handled by zeroing dt (an exact identity step — dR=I,
f1..f4=0, Phi=I, Q=0), so the carry passes through like the oracle's
masked carry; an all-invalid frame keeps the previous state via the
XLA-side guard, same as the parallel path.

The kernel returns (Rk, pk, vk, P24, Psi); the clone cross-covariance
multiply, state assembly, and symmetrization stay in XLA (3 ops on the
full 108-dim P).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# skew(v) columns as constant linear maps: skew(v)[:, j] = _SKC[j] @ v
_SKC = (
    ((0.0, 0.0, 0.0), (0.0, 0.0, 1.0), (0.0, -1.0, 0.0)),
    ((0.0, 0.0, -1.0), (0.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
    ((0.0, 1.0, 0.0), (-1.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
)


def _propagate_kernel(w_ref, a_ref, dt_ref, r0_ref, vec_ref, p0_ref,
                      skc_ref, sig_ref, ones_ref,
                      rk_ref, pv_ref, p24_ref, psi_ref, *,
                      K, gravity, small_angle):
    f32 = jnp.float32
    eye3 = jnp.eye(3, dtype=f32)
    eye24 = jnp.eye(24, dtype=f32)
    SK0 = skc_ref[0:3, :]
    SK1 = skc_ref[3:6, :]
    SK2 = skc_ref[6:9, :]
    ones24 = ones_ref[...]                      # (24, 1)

    def mm(A, B):
        return jax.lax.dot_general(
            A, B, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)

    def mm_tn(A, B):                            # A^T @ B
        return jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)

    def mm_nt(A, B):                            # A @ B^T
        return jax.lax.dot_general(
            A, B, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)

    def skew3(v):                               # v: (3, 1) column
        return jnp.concatenate([mm(SK0, v), mm(SK1, v), mm(SK2, v)],
                               axis=1)

    # vec_ref columns: [vR, gR, bg, ba] (3, 4)
    vR = vec_ref[:, 0:1]                        # (3, 1)
    gR = vec_ref[:, 1:2]
    bg = vec_ref[:, 2:3]
    ba = vec_ref[:, 3:4]
    Rk = r0_ref[...]                            # (3, 3)
    P = p0_ref[...]                             # (24, 24)
    Psi = eye24
    dp = jnp.zeros((3, 1), f32)
    dv = jnp.zeros((3, 1), f32)
    pk = jnp.zeros((3, 1), f32)
    vk = vR
    gk = gR
    Dt = jnp.zeros((1, 1), f32)
    sigv = sig_ref[...]                         # (1, 12)
    z33 = jnp.zeros((3, 3), f32)

    for k in range(K):
        wm = jax.lax.slice_in_dim(w_ref[...], k, k + 1, axis=1)   # (3, 1)
        am = jax.lax.slice_in_dim(a_ref[...], k, k + 1, axis=1)
        dt = jax.lax.slice_in_dim(dt_ref[...], k, k + 1, axis=1)  # (1, 1)
        w = wm - bg
        a = am - ba
        Dt = Dt + dt

        wx = skew3(w)
        wx2 = mm(wx, wx)
        vx = skew3(vk)

        # per-sample scalar bank (core/so3 closed forms, both small-angle
        # branches blended with the exact 0/1 mask)
        w1 = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))     # (1, 1)
        small = (w1 < small_angle).astype(f32)
        big = 1.0 - small
        w1s = small + big * w1                  # guard /0
        wdt = w1s * dt
        sinwdt = jnp.sin(wdt)
        coswdt = jnp.cos(wdt)
        one_m_cos = 2.0 * jnp.sin(0.5 * wdt) ** 2
        csin = small * dt + big * (sinwdt / w1s)
        ccos = small * (0.5 * dt * dt) + big * (one_m_cos / (w1s * w1s))
        f1 = small * (-dt ** 3 / 3.0) \
            + big * ((wdt * coswdt - sinwdt) / w1s ** 3)
        f2 = small * (dt ** 4 / 8.0) \
            + big * (0.5 * (wdt ** 2 + 2.0 * one_m_cos
                            - 2.0 * wdt * sinwdt) / w1s ** 4)
        f3 = small * (-dt ** 2 / 2.0) + big * (-one_m_cos / (w1s * w1s))
        f4 = small * (dt ** 3 / 6.0) + big * ((wdt - sinwdt) / w1s ** 3)
        spack = jnp.concatenate(
            [dt, 0.5 * dt * dt, f1, f2, f3, f4, csin, ccos], axis=1)
        SM = mm(ones24, spack)                  # (24, 8) scalar columns
        dtc = SM[:, 0:1]                        # (24, 1)
        dt3 = SM[0:3, 0:1]
        hdt2 = SM[0:3, 1:2]
        f1c = SM[0:3, 2:3]
        f2c = SM[0:3, 3:4]
        f3c = SM[0:3, 4:5]
        f4c = SM[0:3, 5:6]
        csinc = SM[0:3, 6:7]
        ccosc = SM[0:3, 7:8]

        # --- covariance (PreIntegrator.cc:122-142) ---
        Rk_T = mm_tn(Rk, eye3)
        blocks = [[z33] * 8 for _ in range(8)]
        blocks[3][3] = -wx
        blocks[3][6] = -eye3
        blocks[4][3] = -mm_tn(Rk, vx)
        blocks[4][5] = Rk_T
        blocks[5][2] = -gravity * Rk
        blocks[5][3] = -gravity * skew3(gk)
        blocks[5][5] = -wx
        blocks[5][6] = -vx
        blocks[5][7] = -eye3
        F = jnp.concatenate(
            [jnp.concatenate(r, axis=1) for r in blocks], axis=0)
        Phi = eye24 + dtc * F
        Psi = mm(Phi, Psi)

        gb = [[z33, z33, z33, z33] for _ in range(8)]
        gb[3][0] = -eye3
        gb[5][0] = -vx
        gb[5][2] = -eye3
        gb[6][1] = eye3
        gb[7][3] = eye3
        G = jnp.concatenate(
            [jnp.concatenate(r, axis=1) for r in gb], axis=0)  # (24, 12)
        Q = dtc * mm_nt(G * sigv, G)
        P = mm_nt(mm(Phi, P), Phi) + Q

        # --- state (PreIntegrator.cc:144-178; core/so3 formulas) ---
        # dR = I - csin wx + ccos wx2 covers BOTH branches (csin/ccos
        # carry the small-angle limits dt and dt^2/2 exactly)
        dR = eye3 - csinc * wx + ccosc * wx2
        Rk = mm(dR, Rk)
        Mp = hdt2 * eye3 + f1c * wx + f2c * wx2
        Mv = dt3 * eye3 + f3c * wx + f4c * wx2
        dp = dp + dv * dt + mm_tn(Rk, mm(Mp, a))
        dv = dv + mm_tn(Rk, mm(Mv, a))
        pk = vR * Dt - (0.5 * gravity) * gR * (Dt * Dt) + dp
        vk = mm(Rk, vR - gravity * gR * Dt + dv)
        gk = mm(Rk, gR)
        gk = gk / jnp.sqrt(jnp.sum(gk * gk, axis=0, keepdims=True))

    rk_ref[...] = Rk
    pv_ref[...] = jnp.concatenate([pk, vk], axis=1)   # (3, 2)
    p24_ref[...] = P
    psi_ref[...] = Psi


@functools.partial(jax.jit,
                   static_argnames=("gravity", "small_angle", "sig",
                                    "interpret"))
def propagate_block_pallas(w, a, dte, R0, vR, gR, bg, ba, P0, *,
                           gravity, small_angle, sig, interpret=False):
    """One-frame propagation.

    w/a (K, 3), dte (K,) with invalid samples already zeroed (an exact
    identity step), R0 (3, 3), vR/gR/bg/ba (3,), P0 (24, 24); ``sig`` is
    the 12-dim IMU noise diagonal as a static tuple.  Returns
    (Rk (3, 3), pk (3,), vk (3,), P24 (24, 24), Psi (24, 24)).
    """
    f32 = jnp.float32
    K = w.shape[0]
    vec = jnp.stack([vR, gR, bg, ba], axis=1).astype(f32)  # (3, 4)
    skc = jnp.concatenate([jnp.asarray(m, f32) for m in _SKC], axis=0)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    Rk, pv, P24, Psi = pl.pallas_call(
        functools.partial(_propagate_kernel, K=K, gravity=float(gravity),
                          small_angle=float(small_angle)),
        in_specs=[vmem()] * 9,
        out_specs=[vmem()] * 4,
        out_shape=[jax.ShapeDtypeStruct((3, 3), f32),
                   jax.ShapeDtypeStruct((3, 2), f32),
                   jax.ShapeDtypeStruct((24, 24), f32),
                   jax.ShapeDtypeStruct((24, 24), f32)],
        interpret=interpret,
    )(w.astype(f32).T, a.astype(f32).T, dte.astype(f32)[None, :],
      R0.astype(f32), vec, P0.astype(f32), skc,
      jnp.asarray(sig, f32)[None, :], jnp.ones((24, 1), f32))
    return Rk, pv[:, 0], pv[:, 1], P24, Psi
