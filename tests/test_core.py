"""Unit tests for L1 math primitives against closed-form identities.

The reference has no tests; these check our quaternion/SO(3) ops against
independent constructions (scipy rotations, series expansions) rather than
against reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from rvio_tpu.core import (
    quat_identity, quat_mul, quat_inv, quat_to_rot, rot_to_quat,
    small_quat_from_dtheta, skew, delta_rot, so3_integration_coeffs,
    chi2_gate_thresholds,
)

RNG = np.random.default_rng(0)


def random_quat(n=()):
    q = RNG.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(np.where(q[..., 3:4] < 0, -q, q))


class TestQuaternion:
    def test_identity_rot(self):
        R = quat_to_rot(quat_identity(jnp.float64))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-15)

    def test_quat_to_rot_is_orthonormal(self):
        q = random_quat((64,))
        R = quat_to_rot(q)
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3), R.shape), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(64), atol=1e-12)

    def test_jpl_convention_vs_scipy(self):
        # JPL: R(q) rotates global->local; equals scipy-R(q)^T for the same
        # [x,y,z,w] numbers (scipy uses Hamilton active convention).
        q = random_quat((16,))
        R_ours = np.asarray(quat_to_rot(q))
        R_scipy = ScipyRot.from_quat(np.array(q)).as_matrix()
        np.testing.assert_allclose(R_ours, np.swapaxes(R_scipy, -1, -2), atol=1e-12)

    def test_mul_composes_rotations(self):
        q1, q2 = random_quat((8,)), random_quat((8,))
        R12 = quat_to_rot(quat_mul(q1, q2))
        np.testing.assert_allclose(R12, quat_to_rot(q1) @ quat_to_rot(q2), atol=1e-12)

    def test_inverse(self):
        q = random_quat((8,))
        qi = quat_inv(q)
        ident = quat_mul(q, qi)
        np.testing.assert_allclose(np.abs(ident[..., 3]), 1.0, atol=1e-12)
        np.testing.assert_allclose(ident[..., :3], 0.0, atol=1e-12)

    def test_rot_to_quat_roundtrip(self):
        q = random_quat((256,))
        q2 = rot_to_quat(quat_to_rot(q))
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-9)

    def test_rot_to_quat_degenerate_axes(self):
        # 180-degree rotations exercise every Breckenridge branch.
        for axis in np.eye(3):
            R = ScipyRot.from_rotvec(np.pi * axis).as_matrix().T
            q = rot_to_quat(jnp.asarray(R))
            np.testing.assert_allclose(quat_to_rot(q), R, atol=1e-12)

    def test_small_quat_retraction(self):
        d = jnp.asarray([1e-3, -2e-3, 0.5e-3])
        dq = small_quat_from_dtheta(d)
        np.testing.assert_allclose(dq[:3], 0.5 * d, atol=1e-15)
        assert abs(float(jnp.linalg.norm(dq)) - 1.0) < 1e-12
        # Large-angle guard branch stays unit-norm (Updater.cc:556-563).
        big = small_quat_from_dtheta(jnp.asarray([3.0, 0.0, 0.0]))
        assert abs(float(jnp.linalg.norm(big)) - 1.0) < 1e-12

    def test_jit_and_vmap(self):
        q = random_quat((32,))
        f = jax.jit(jax.vmap(lambda a: quat_to_rot(quat_mul(a, quat_inv(a)))))
        np.testing.assert_allclose(f(q), np.broadcast_to(np.eye(3), (32, 3, 3)),
                                   atol=1e-12)


class TestSO3:
    def test_skew(self):
        w = jnp.asarray(RNG.normal(size=(5, 3)))
        v = jnp.asarray(RNG.normal(size=(5, 3)))
        cross = np.cross(np.asarray(w), np.asarray(v))
        np.testing.assert_allclose(np.einsum("nij,nj->ni", skew(w), v), cross,
                                   atol=1e-12)

    def test_delta_rot_matches_exp(self):
        # deltaR maps old-frame vectors to the new frame: exp(-[w]x dt).
        w = jnp.asarray([0.3, -0.2, 0.8])
        dt = 0.005
        dR = delta_rot(w, dt, small_angle=0.001745329)
        expected = ScipyRot.from_rotvec(-np.asarray(w) * dt).as_matrix()
        # atol bounded by XLA CPU transcendental accuracy, not the formula.
        np.testing.assert_allclose(dR, expected, atol=1e-9)

    def test_delta_rot_small_angle_branch_continuity(self):
        thr = 0.001745329
        for scale in (0.5, 0.99, 1.01):
            w = jnp.asarray([1.0, 0.0, 0.0]) * thr * scale
            dR = delta_rot(w, 0.005, small_angle=thr)
            expected = ScipyRot.from_rotvec(-np.asarray(w) * 0.005).as_matrix()
            np.testing.assert_allclose(dR, expected, atol=1e-10)

    def test_integration_coeffs_match_series(self):
        # The closed-form coefficients must limit to their Taylor versions.
        dt = 0.005
        w1 = jnp.asarray([1e-8])
        f1, f2, f3, f4 = so3_integration_coeffs(w1, dt, small_angle=1e-4)
        # Below threshold -> the reference's polynomial values.
        np.testing.assert_allclose(f1, -dt**3 / 3, rtol=1e-12)
        np.testing.assert_allclose(f2, dt**4 / 8, rtol=1e-12)
        np.testing.assert_allclose(f3, -dt**2 / 2, rtol=1e-12)
        np.testing.assert_allclose(f4, dt**3 / 6, rtol=1e-12)
        # Away from the branch point the exact form must agree with the
        # series (series truncation error O(wdt^2) ~ 6e-8 at wdt=2.5e-4).
        w1 = jnp.asarray([0.05])
        fe = so3_integration_coeffs(w1, dt, small_angle=1e-4)
        fs = (-dt**3 / 3, dt**4 / 8, -dt**2 / 2, dt**3 / 6)
        for exact, series in zip(fe, fs):
            np.testing.assert_allclose(exact, series, rtol=1e-5)


class TestChi2:
    def test_matches_reference_table_head(self):
        # First 10 values printed in reference Numerics.h:174.
        ref = np.array([3.841459, 5.991465, 7.814728, 9.487729, 11.070498,
                        12.591587, 14.067140, 15.507313, 16.918978, 18.307038])
        np.testing.assert_allclose(chi2_gate_thresholds(10, np.float64), ref,
                                   atol=5e-6)

    def test_last_value(self):
        # Last entry of the reference's 500-entry table (Numerics.h:223).
        np.testing.assert_allclose(chi2_gate_thresholds(500, np.float64)[-1],
                                   553.126809, atol=5e-6)
