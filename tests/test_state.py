"""Tests for the filter state: init, augmentation gather, composition."""

import jax
import jax.numpy as jnp
import numpy as np

from rvio_tpu.core.quaternion import quat_to_rot
from rvio_tpu.state import (FilterState, make_initial_state, static_initialize,
                            augment_window, compose_state)

M = 5  # small window for tests


def _random_state(rng, n_clones=3, frame_idx=5):
    st = make_initial_state(M, jnp.float64)
    D = 24 + 6 * M
    A = rng.normal(size=(D, D))
    P = A @ A.T
    # zero out invalid clone blocks like the real filter maintains
    v = 24 + 6 * n_clones
    P[v:, :] = 0.0
    P[:, v:] = 0.0
    q = rng.normal(size=(M, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    clones = np.concatenate([q, rng.normal(size=(M, 3))], axis=1)
    clones[n_clones:] = np.array([0, 0, 0, 1, 0, 0, 0.0])
    qR = rng.normal(size=4)
    qR /= np.linalg.norm(qR)
    qG = rng.normal(size=4)
    qG /= np.linalg.norm(qG)
    return FilterState(
        q_G=jnp.asarray(qG), p_G=jnp.asarray(rng.normal(size=3)),
        g=jnp.asarray([0.1, -0.2, 0.97]) / np.linalg.norm([0.1, -0.2, 0.97]),
        q_R=jnp.asarray(qR), p_R=jnp.asarray(rng.normal(size=3)),
        v_R=jnp.asarray(rng.normal(size=3)), bg=jnp.asarray(rng.normal(size=3) * 0.01),
        ba=jnp.asarray(rng.normal(size=3) * 0.01), clones=jnp.asarray(clones),
        P=jnp.asarray(P), n_clones=jnp.int32(n_clones),
        frame_idx=jnp.int32(frame_idx), clones_fej=jnp.asarray(clones),
        sigma2_scale=jnp.ones(()))


class TestStaticInit:
    def test_gravity_aligned(self):
        w = jnp.asarray([0.01, -0.02, 0.005])
        a = jnp.asarray([0.3, -0.2, 9.75])
        st = static_initialize(w, a, 100, gravity=9.8082, imu_rate=200.0,
                               sigma_a=2e-3, sigma_wg=1.9e-5, sigma_wa=3e-3,
                               enable_alignment=True, max_clones=M)
        g = np.asarray(a) / np.linalg.norm(a)
        np.testing.assert_allclose(st.g, g, atol=1e-12)
        np.testing.assert_allclose(st.bg, w, atol=1e-12)
        np.testing.assert_allclose(st.ba, np.asarray(a) - 9.8082 * g, atol=1e-12)
        # R columns: x ⊥ z, z = g (reference System.cc:122-140)
        R = np.asarray(quat_to_rot(st.q_G))
        np.testing.assert_allclose(R[:, 2], g, atol=1e-7)
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-7)
        # P0 diagonal (System.cc:154-169)
        P = np.asarray(st.P)
        np.testing.assert_allclose(np.diag(P)[:6], 1e-6, rtol=1e-9)
        np.testing.assert_allclose(np.diag(P)[6:9], 100 / 200.0 * (2e-3) ** 2,
                                   rtol=1e-6)
        assert np.all(np.diag(P)[9:18] == 0)

    def test_no_bias_when_single_sample(self):
        w = jnp.asarray([0.01, -0.02, 0.005])
        a = jnp.asarray([0.0, 0.0, 9.8])
        st = static_initialize(w, a, 1, gravity=9.8082, imu_rate=200.0,
                               sigma_a=2e-3, sigma_wg=1.9e-5, sigma_wa=3e-3,
                               enable_alignment=False, max_clones=M,
                               use_bias_estimates=False)
        assert np.all(np.asarray(st.bg) == 0)
        assert np.all(np.asarray(st.ba) == 0)
        np.testing.assert_allclose(st.q_G, [0, 0, 0, 1], atol=1e-12)


class TestAugmentation:
    def test_growth_appends_clone(self):
        rng = np.random.default_rng(1)
        st = _random_state(rng, n_clones=2)
        out = augment_window(st)
        assert int(out.n_clones) == 3
        np.testing.assert_allclose(out.clones[2, :4], st.q_R, atol=1e-15)
        np.testing.assert_allclose(out.clones[2, 4:], st.p_R, atol=1e-15)
        # new clone covariance rows copy the dθR/dpR rows (System.cc:290-298)
        P = np.asarray(st.P)
        Po = np.asarray(out.P)
        s = 24 + 6 * 2
        np.testing.assert_allclose(Po[s:s + 6, :24], P[9:15, :24], atol=1e-13)
        np.testing.assert_allclose(Po[s:s + 6, s:s + 6], P[9:15, 9:15], atol=1e-13)
        # previously valid blocks untouched
        np.testing.assert_allclose(Po[:s, :s], P[:s, :s], atol=1e-13)
        # symmetric, invalid slots still zero
        np.testing.assert_allclose(Po, Po.T, atol=1e-13)
        assert np.all(Po[s + 6:, :] == 0)

    def test_full_window_slides(self):
        rng = np.random.default_rng(2)
        st = _random_state(rng, n_clones=M)
        out = augment_window(st)
        assert int(out.n_clones) == M
        np.testing.assert_allclose(out.clones[:-1], st.clones[1:], atol=1e-15)
        np.testing.assert_allclose(out.clones[-1, :4], st.q_R, atol=1e-15)
        P = np.asarray(st.P)
        Po = np.asarray(out.P)
        # core preserved; clone blocks shifted by 6; last block from rows 9:15
        np.testing.assert_allclose(Po[:24, :24], P[:24, :24], atol=1e-13)
        np.testing.assert_allclose(Po[24:24 + 6 * (M - 1), :24],
                                   P[30:24 + 6 * M, :24], atol=1e-13)
        s = 24 + 6 * (M - 1)
        np.testing.assert_allclose(Po[s:, s:], P[9:15, 9:15], atol=1e-13)
        np.testing.assert_allclose(Po[s:, :24], P[9:15, :24], atol=1e-13)

    def test_first_frame_skips(self):
        rng = np.random.default_rng(3)
        st = _random_state(rng, n_clones=0, frame_idx=0)
        out = augment_window(st)
        assert int(out.n_clones) == 0
        np.testing.assert_allclose(out.P, st.P, atol=0)

    def test_matches_reference_jacobian_form(self):
        # J P J^T with explicit J equals the gather implementation.
        rng = np.random.default_rng(4)
        st = _random_state(rng, n_clones=2)
        n, D = 2, 24 + 6 * M
        J = np.zeros((D, D))
        v = 24 + 6 * n
        J[:v, :v] = np.eye(v)
        J[v:v + 3, 9:12] = np.eye(3)
        J[v + 3:v + 6, 12:15] = np.eye(3)
        expected = J @ np.asarray(st.P) @ J.T
        out = augment_window(st)
        np.testing.assert_allclose(np.asarray(out.P), expected, atol=1e-12)


class TestComposition:
    def test_reset_and_outputs(self):
        rng = np.random.default_rng(5)
        st = _random_state(rng, n_clones=3)
        st = FilterState(**{**st.__dict__, "q_G": jnp.asarray([0.1, 0.2, -0.3, 0.9]) / np.linalg.norm([0.1, 0.2, -0.3, 0.9])})
        out, (q_kG, p_Gk, vk) = compose_state(st)
        np.testing.assert_allclose(out.q_R, [0, 0, 0, 1], atol=1e-15)
        np.testing.assert_allclose(out.p_R, 0, atol=1e-15)
        assert int(out.frame_idx) == int(st.frame_idx) + 1
        # output pose: q_kG = q_R ⊗ q_G, p_Gk = R_G^T (p_R - p_G)
        RG = np.asarray(quat_to_rot(st.q_G))
        np.testing.assert_allclose(p_Gk, RG.T @ (np.asarray(st.p_R) - np.asarray(st.p_G)), atol=1e-12)
        # new global origin: p_kG = R_k (p_G - p_k)
        Rk = np.asarray(quat_to_rot(st.q_R))
        np.testing.assert_allclose(out.p_G, Rk @ (np.asarray(st.p_G) - np.asarray(st.p_R)), atol=1e-12)
        # gravity stays unit
        np.testing.assert_allclose(np.linalg.norm(out.g), 1.0, atol=1e-12)
        # covariance stays symmetric, dθR/dpR rows zeroed (reset)
        Po = np.asarray(out.P)
        np.testing.assert_allclose(Po, Po.T, atol=1e-12)
        assert np.abs(Po[9:15, :]).max() == 0

    def test_global_pose_chain_consistency(self):
        # Two successive compositions must accumulate the global pose the
        # same way as composing the relative transforms directly.
        rng = np.random.default_rng(6)
        st = _random_state(rng, n_clones=3)
        _, (q1, p1, _) = compose_state(st)
        R_total = np.asarray(quat_to_rot(q1))
        # identity relative pose on second frame -> same global pose
        out, _ = compose_state(st)
        out2, (q2, p2, _) = compose_state(out)
        np.testing.assert_allclose(np.asarray(quat_to_rot(q2)), R_total, atol=1e-9)
        np.testing.assert_allclose(p2, p1, atol=1e-9)
