"""SO(3) primitives: skew, closed-form Rodrigues integration coefficients.

These implement the exact closed-form rotation/velocity/position integrals
the reference's propagation loop uses (reference: src/rvio/PreIntegrator.cc:
109-166), with the small-angle branch expressed as ``jnp.where`` so the same
compiled code handles both regimes over a batch.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def rodrigues_np(w: np.ndarray, dt: float) -> np.ndarray:
    """Exp(w dt) rotation matrix for one body-rate sample, host numpy.

    Shared by the host-side init gate (runtime/driver.py) and the warm-
    handoff bootstrap (parallel/handoff.py) — sample-by-sample gyro
    integration outside jit.
    """
    th = np.linalg.norm(w) * dt
    if th < 1e-12:
        return np.eye(3)
    k = w / np.linalg.norm(w)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[w]x skew-symmetric matrix; batched over leading axes (Numerics.h:97-105)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)


def delta_rot(w: jnp.ndarray, dt, small_angle: float) -> jnp.ndarray:
    """Closed-form incremental rotation for body rate w over dt.

    deltaR = I - (sin(w dt)/|w|)[w]x + ((1-cos(w dt))/|w|^2)[w]x^2, with the
    second-order small-angle expansion below ``small_angle`` rad/s
    (reference: PreIntegrator.cc:145-166; same form in Ransac.cc:144-148).

    Note this maps vectors from the *old* frame into the *new* frame (it is
    the transpose of the usual exp([w]x dt) world-from-body increment),
    matching the reference's robocentric convention.
    """
    dt = jnp.asarray(dt, dtype=w.dtype)
    w1 = jnp.linalg.norm(w, axis=-1)
    wdt = w1 * dt
    wx = skew(w)
    wx2 = wx @ wx
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wx.shape)

    is_small = (w1 < small_angle)[..., None, None]
    w1s = jnp.where(w1 < small_angle, jnp.ones_like(w1), w1)  # guard /0
    c_sin = (jnp.sin(w1s * dt) / w1s)[..., None, None]
    # 1-cos(x) = 2 sin^2(x/2): avoids cancellation (and XLA CPU's f64 cos is
    # only ~f32-accurate near 0, measured on this build).
    c_cos = (2.0 * jnp.sin(0.5 * w1s * dt) ** 2 / w1s**2)[..., None, None]
    exact = eye - c_sin * wx + c_cos * wx2
    approx = eye - dt[..., None, None] * wx + (0.5 * dt**2)[..., None, None] * wx2
    return jnp.where(is_small, approx, exact)


def so3_integration_coeffs(w1: jnp.ndarray, dt, small_angle: float
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form scalar coefficients f1..f4 of the reference's dp/dv integrals.

    f1,f2 weight [w]x and [w]x^2 in the position integral; f3,f4 in the
    velocity integral (reference: PreIntegrator.cc:147-166):

        exact:  f1 = (wdt cos - sin)/w^3          small: f1 = -dt^3/3
                f2 = (wdt^2 - 2cos - 2wdt sin + 2)/(2w^4)   f2 = dt^4/8
                f3 = (cos - 1)/w^2                       f3 = -dt^2/2
                f4 = (wdt - sin)/w^3                     f4 = dt^3/6
    """
    dt = jnp.asarray(dt, dtype=w1.dtype)
    small = w1 < small_angle
    w1s = jnp.where(small, jnp.ones_like(w1), w1)
    wdt = w1s * dt
    coswdt = jnp.cos(wdt)
    sinwdt = jnp.sin(wdt)
    # 1-cos via half-angle sine for accuracy (see delta_rot).
    one_m_cos = 2.0 * jnp.sin(0.5 * wdt) ** 2
    f1 = jnp.where(small, -dt**3 / 3.0, (wdt * coswdt - sinwdt) / w1s**3)
    f2 = jnp.where(small, dt**4 / 8.0,
                   0.5 * (wdt**2 + 2.0 * one_m_cos - 2.0 * wdt * sinwdt) / w1s**4)
    f3 = jnp.where(small, -dt**2 / 2.0, -one_m_cos / w1s**2)
    f4 = jnp.where(small, dt**3 / 6.0, (wdt - sinwdt) / w1s**3)
    return f1, f2, f3, f4
