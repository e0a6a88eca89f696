"""JPL-convention quaternion algebra as pure, batchable JAX functions.

Quaternions are stored ``[x, y, z, w]`` (vector part first) in the JPL
convention, matching the reference's Numerics.h.  All functions are
shape-polymorphic over leading batch axes and jit/vmap/grad-safe: branches
are expressed with ``jnp.where`` instead of Python control flow.

Behavioral parity notes (vs reference src/util/Numerics.h):
- ``quat_mul``   — Numerics.h:30-63  (normalizes, canonicalizes w >= 0)
- ``quat_inv``   — Numerics.h:69-91  (conjugate with w-sign handling)
- ``quat_to_rot``— Numerics.h:111-120 (R = I - 2w[qv]x + 2[qv]x^2)
- ``rot_to_quat``— Numerics.h:126-167 (Breckenridge / JPL branch procedure)
"""

from __future__ import annotations

import jax.numpy as jnp

from rvio_tpu.core.so3 import skew


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize and canonicalize to w >= 0 (reference convention)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """JPL quaternion product q = q1 (x) q2: R(q) = R(q1) R(q2).

    Mirrors the left-multiplication matrix of Numerics.h:30-63, including
    the normalize + w>=0 canonicalization the reference applies.
    """
    x1, y1, z1, w1 = (q1[..., i] for i in range(4))
    x2, y2, z2, w2 = (q2[..., i] for i in range(4))
    # Rows of the reference's 4x4 left-product matrix applied to q2.
    x = w1 * x2 + z1 * y2 - y1 * z2 + x1 * w2
    y = -z1 * x2 + w1 * y2 + x1 * z2 + y1 * w2
    z = y1 * x2 - x1 * y2 + w1 * z2 + z1 * w2
    w = -x1 * x2 - y1 * y2 - z1 * z2 + w1 * w2
    return quat_normalize(jnp.stack([x, y, z, w], axis=-1))


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse (conjugate for unit quats), Numerics.h:69-91.

    The reference negates the vector part when w > 0, else negates w; both
    branches then normalize.  Expressed branch-free.
    """
    wpos = q[..., 3:4] > 0
    flip = jnp.where(wpos, jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype),
                     jnp.array([1.0, 1.0, 1.0, -1.0], dtype=q.dtype))
    qi = q * flip
    return qi / jnp.linalg.norm(qi, axis=-1, keepdims=True)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """R = I - 2 w [qv]x + 2 [qv]x^2 (JPL; Numerics.h:111-120).

    Supports arbitrary leading batch axes; returns (..., 3, 3).
    """
    qv = q[..., :3]
    w = q[..., 3]
    qx = skew(qv)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), qx.shape)
    return eye - 2.0 * w[..., None, None] * qx + 2.0 * (qx @ qx)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> JPL quaternion via the Breckenridge procedure.

    Computes all four of the reference's branches (Numerics.h:126-167) and
    selects by the same priority order, so it is jit/vmap-safe while agreeing
    with the reference bitwise up to fp rounding.
    """
    T = jnp.trace(R, axis1=-2, axis2=-1)
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, jnp.finfo(R.dtype).tiny))

    # Branch 1: R00 dominant
    q0a = _safe_sqrt((1 + 2 * r00 - T) / 4)
    b1 = jnp.stack([
        q0a,
        (R[..., 0, 1] + R[..., 1, 0]) / (4 * q0a),
        (R[..., 0, 2] + R[..., 2, 0]) / (4 * q0a),
        (R[..., 1, 2] - R[..., 2, 1]) / (4 * q0a),
    ], axis=-1)
    # Branch 2: R11 dominant
    q1a = _safe_sqrt((1 + 2 * r11 - T) / 4)
    b2 = jnp.stack([
        (R[..., 0, 1] + R[..., 1, 0]) / (4 * q1a),
        q1a,
        (R[..., 1, 2] + R[..., 2, 1]) / (4 * q1a),
        (R[..., 2, 0] - R[..., 0, 2]) / (4 * q1a),
    ], axis=-1)
    # Branch 3: R22 dominant
    q2a = _safe_sqrt((1 + 2 * r22 - T) / 4)
    b3 = jnp.stack([
        (R[..., 0, 2] + R[..., 2, 0]) / (4 * q2a),
        (R[..., 1, 2] + R[..., 2, 1]) / (4 * q2a),
        q2a,
        (R[..., 0, 1] - R[..., 1, 0]) / (4 * q2a),
    ], axis=-1)
    # Branch 4: trace dominant
    q3a = _safe_sqrt((1 + T) / 4)
    b4 = jnp.stack([
        (R[..., 1, 2] - R[..., 2, 1]) / (4 * q3a),
        (R[..., 2, 0] - R[..., 0, 2]) / (4 * q3a),
        (R[..., 0, 1] - R[..., 1, 0]) / (4 * q3a),
        q3a,
    ], axis=-1)

    c1 = (r00 > T) & (r00 > r11) & (r00 > r22)
    c2 = (r11 > T) & (r11 > r00) & (r11 > r22)
    c3 = (r22 > T) & (r22 > r00) & (r22 > r11)
    q = jnp.where(c1[..., None], b1,
        jnp.where(c2[..., None], b2,
        jnp.where(c3[..., None], b3, b4)))
    return quat_normalize(q)


def small_quat_from_dtheta(dtheta: jnp.ndarray) -> jnp.ndarray:
    """Error-state retraction quaternion from a small rotation dtheta.

    dq = [dtheta/2, sqrt(1 - |dtheta/2|^2)] with the reference's unit-norm
    guard branch for |dtheta/2| >= 1 (reference: Updater.cc:549-563).
    """
    v = 0.5 * dtheta
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = n2 < 1.0
    w_small = jnp.sqrt(jnp.maximum(1.0 - n2, 0.0))
    inv = 1.0 / jnp.sqrt(1.0 + n2)
    v_out = jnp.where(small, v, v * inv)
    w_out = jnp.where(small, w_small, inv)
    return jnp.concatenate([v_out, w_out], axis=-1)
