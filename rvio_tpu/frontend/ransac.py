"""Gyro-aided 2-point RANSAC for inter-frame outlier rejection.

TPU-native re-design of reference Ransac (src/rvio/Ransac.cc:32-268):
all 16 hypotheses are built and scored in one batched einsum instead of a
sequential loop, and sampling uses explicit jax.random keys instead of
C rand() — deterministic across shardings for reproducible regression runs.

Model (Ransac.cc:86-117): given the gyro-integrated inter-frame rotation R
(camera frame), the translation direction t(alpha, beta) is solved in closed
form from two correspondences via the epipolar constraint p2^T [t]x R p1 = 0;
the essential matrix hypothesis is E = [t]x R.  Inliers are counted with the
Sampson (or algebraic) error and the most-voted hypothesis re-scores all
candidates to refine the inlier flags in place (Ransac.cc:180-247).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rvio_tpu.core.so3 import skew, delta_rot


def integrate_gyro_rotation(w: jnp.ndarray, dt: jnp.ndarray,
                            valid: jnp.ndarray, R_bc: jnp.ndarray,
                            small_angle: float) -> jnp.ndarray:
    """Inter-frame rotation from raw gyro, conjugated into the camera frame.

    Mirrors Ransac::GetRotation (Ransac.cc:120-155): deltaR products over the
    frame's IMU samples (no bias correction), then R_cam = R_cb R R_bc.
    """
    def step(Rc, x):
        wm, dtm, v = x
        dR = delta_rot(wm, dtm, small_angle)
        Rn = dR @ Rc
        return jnp.where(v, Rn, Rc), None

    R0 = jnp.eye(3, dtype=w.dtype)
    R, _ = jax.lax.scan(step, R0, (w, dt, valid))
    return R_bc.T @ R @ R_bc


def _two_point_translation(pA1, pA2, pB1, pB2, R):
    """Closed-form translation direction from 2 correspondences
    (Ransac.cc:86-117)."""
    pA0 = R @ pA1
    pB0 = R @ pB1
    c1 = pA2[0] * pA0[1] - pA0[0] * pA2[1]
    c2 = pA0[1] * pA2[2] - pA2[1] * pA0[2]
    c3 = pA2[0] * pA0[2] - pA0[0] * pA2[2]
    c4 = pB2[0] * pB0[1] - pB0[0] * pB2[1]
    c5 = pB0[1] * pB2[2] - pB2[1] * pB0[2]
    c6 = pB2[0] * pB0[2] - pB0[0] * pB2[2]
    alpha = jnp.arctan2(c3 * c5 - c2 * c6, c1 * c6 - c3 * c4)
    beta = jnp.arctan2(-c3, c1 * jnp.sin(alpha) + c2 * jnp.cos(alpha))
    t = jnp.stack([jnp.sin(beta) * jnp.cos(alpha), jnp.cos(beta),
                   -jnp.sin(beta) * jnp.sin(alpha)])
    return t


def _sampson_error(p1, p2, E):
    """Sampson distance (Ransac.cc:250-258); p1/p2: (N,3), E: (3,3)."""
    Ep1 = p1 @ E.T          # (N,3)
    Etp2 = p2 @ E           # (N,3)
    num = jnp.sum(p2 * Ep1, axis=-1) ** 2
    den = (Ep1[:, 0] ** 2 + Ep1[:, 1] ** 2 + Etp2[:, 0] ** 2 + Etp2[:, 1] ** 2)
    return num / jnp.maximum(den, 1e-30)


def _algebraic_error(p1, p2, E):
    return jnp.abs(jnp.sum(p2 * (p1 @ E.T), axis=-1))


@partial(jax.jit, static_argnames=("n_hypotheses", "use_sampson"))
def gyro_ransac(key: jax.Array, pts1: jnp.ndarray, pts2: jnp.ndarray,
                candidate: jnp.ndarray, R_cam: jnp.ndarray,
                inlier_threshold: float, *, n_hypotheses: int = 16,
                use_sampson: bool = True) -> jnp.ndarray:
    """Refine inlier flags with gyro-aided 2-point RANSAC.

    pts1/pts2: (N, 3) homogeneous normalized points in previous/current
    frames; candidate: (N,) bool KLT inlier flags; R_cam: gyro inter-frame
    rotation in the camera frame.  Returns the refined (N,) bool flags.
    Like the reference (Ransac.cc:201-205), if there are too few candidates
    the flags pass through unchanged.
    """
    N = pts1.shape[0]
    n_cand = jnp.sum(candidate.astype(jnp.int32))

    # Sample 2*H distinct candidate slots: draw random keys, push invalid
    # candidates to the end by sorting (random key + large offset), then pair
    # consecutive entries — all candidates distinct, like the reference's
    # without-replacement draw (Ransac.cc:50-83).
    scores = jax.random.uniform(key, (N,)) + jnp.where(candidate, 0.0, 10.0)
    order = jnp.argsort(scores)
    idxA = order[0:2 * n_hypotheses:2]
    idxB = order[1:2 * n_hypotheses:2]

    def build(iA, iB):
        t = _two_point_translation(pts1[iA], pts2[iA], pts1[iB], pts2[iB],
                                   R_cam)
        return skew(t) @ R_cam

    E_all = jax.vmap(build)(idxA, idxB)                      # (H,3,3)

    err_fn = _sampson_error if use_sampson else _algebraic_error
    errs = jax.vmap(lambda E: err_fn(pts1, pts2, E))(E_all)  # (H,N)
    votes = jnp.sum((errs < inlier_threshold) & candidate[None, :], axis=1)
    best = jnp.argmax(votes)

    e_best = errs[best]
    keep = candidate & (e_best <= inlier_threshold) & jnp.isfinite(e_best)

    # Too few candidates: pass through.  (The reference gates on
    # n_cand > nIterations, Ransac.cc:201-205, but its without-replacement
    # pair sampling actually needs 2x that to terminate — we gate there.)
    enough = n_cand >= 2 * n_hypotheses
    return jnp.where(enough, keep, candidate)
