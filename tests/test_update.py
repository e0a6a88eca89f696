"""MSCKF update tests on synthetic multi-view geometry.

Scene measurements are generated with an independent numpy/scipy pose
construction (not the code under test), so chain building, triangulation,
Jacobians, gating, and the EKF algebra are all cross-checked.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

from rvio_tpu.filter.update import (UpdateBatch, msckf_update,
                                    window_pose_chain, _feature_chain)
from rvio_tpu.state import FilterState, make_initial_state

M = 4          # window size
L = 5          # max track length
F = 4          # feature budget
SIGMA = 0.002

# camera extrinsics: nontrivial rotation + offset
R_BC = ScipyRot.from_rotvec([0.02, -0.03, 1.55]).as_matrix()
T_BC = np.array([-0.02, -0.065, 0.01])


def _rand_transitions(rng, n):
    """Random clone transitions (q JPL [x,y,z,w], p)."""
    qs, ps = [], []
    for _ in range(n):
        rv = rng.normal(size=3) * 0.05
        R = ScipyRot.from_rotvec(rv).as_matrix().T  # JPL: R maps old->new
        q = ScipyRot.from_matrix(R.T).as_quat()     # scipy quat of R^T; JPL q of R
        # JPL q with R(q)=R: R = I-2w[qv]x+2[qv]x^2 equals scipy R(q)^T
        qs.append(np.where(q[3] < 0, -q, q))
        ps.append(rng.normal(size=3) * 0.2)
    return np.asarray(qs), np.asarray(ps)


def _window_poses_np(qs, ps):
    """Independent recursion: x_{i+1} = R_i (x_i - p_i); returns A_i, b_i."""
    A = [np.eye(3)]
    b = [np.zeros(3)]
    for q, p in zip(qs, ps):
        R = np.eye(3) - 2 * q[3] * _skew_np(q[:3]) + 2 * _skew_np(q[:3]) @ _skew_np(q[:3])
        A.append(R @ A[-1])
        b.append(R @ (b[-1] - p))
    return np.asarray(A), np.asarray(b)


def _skew_np(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def _cam_point(A, b, m, p_c0):
    """Project landmark (given in frame-0 CAMERA coords) into camera m."""
    p_b0 = R_BC @ p_c0 + T_BC                 # body coords, frame 0
    p_bm = A[m] @ p_b0 + b[m]                 # body coords, frame m
    p_cm = R_BC.T @ (p_bm - T_BC)             # camera coords, frame m
    return p_cm[:2] / p_cm[2], p_cm


def _make_state(rng, qs, ps, p_scale=1e-4):
    st = make_initial_state(M, jnp.float64)
    clones = np.concatenate([qs, ps], axis=1)
    D = 24 + 6 * M
    P = np.eye(D) * p_scale
    return FilterState(**{**st.__dict__, "clones": jnp.asarray(clones),
                          "P": jnp.asarray(P), "n_clones": jnp.int32(M),
                          "frame_idx": jnp.int32(10)})


def _scene(rng, n_feats=F, noise=0.0, depth_range=(3.0, 8.0)):
    qs, ps = _rand_transitions(rng, M)
    A, b = _window_poses_np(qs, ps)
    state = _make_state(rng, qs, ps)
    meas = np.zeros((F, L, 2))
    tlen = np.zeros(F, np.int32)
    typ2 = np.zeros(F, bool)
    valid = np.zeros(F, bool)
    pts_c0 = []
    for f in range(n_feats):
        d = rng.uniform(*depth_range)
        dir0 = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 1.0])
        p_c0 = d * dir0 / np.linalg.norm(dir0)
        pts_c0.append(p_c0)
        T = L
        for m in range(T):
            z, _ = _cam_point(A, b, m, p_c0)
            meas[f, m] = z + noise * rng.normal(size=2)
        tlen[f] = T
        valid[f] = True
    return state, UpdateBatch(meas=jnp.asarray(meas),
                              track_len=jnp.asarray(tlen),
                              is_type2=jnp.asarray(typ2),
                              valid=jnp.asarray(valid)), (A, b, pts_c0)


def _update(state, batch, compression="qr"):
    return msckf_update(state, batch, R_bc=R_BC, t_bc=T_BC, sigma_im=SIGMA,
                        min_clone_states=2, compression=compression)


class TestChain:
    def test_window_chain_matches_numpy(self):
        rng = np.random.default_rng(20)
        qs, ps = _rand_transitions(rng, M)
        A, b = _window_poses_np(qs, ps)
        clones = jnp.asarray(np.concatenate([qs, ps], axis=1))
        Rw, tw = window_pose_chain(clones, M)
        np.testing.assert_allclose(np.asarray(Rw), A, atol=1e-9)
        np.testing.assert_allclose(np.asarray(tw), b, atol=1e-9)

    def test_parallel_chain_matches_sequential(self):
        # associative-scan form == sequential scan (same math, different
        # fp summation order; f64 parity ~1e-15)
        rng = np.random.default_rng(23)
        qs, ps = _rand_transitions(rng, M)
        clones = jnp.asarray(np.concatenate([qs, ps], axis=1))
        Rw_s, tw_s = window_pose_chain(clones, M, parallel=False)
        Rw_p, tw_p = window_pose_chain(clones, M, parallel=True)
        np.testing.assert_allclose(np.asarray(Rw_p), np.asarray(Rw_s),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(tw_p), np.asarray(tw_s),
                                   atol=1e-13)

    def test_feature_chain_tail(self):
        rng = np.random.default_rng(21)
        qs, ps = _rand_transitions(rng, M)
        A, b = _window_poses_np(qs, ps)
        clones = jnp.asarray(np.concatenate([qs, ps], axis=1))
        Rw, tw = window_pose_chain(clones, M)
        c0 = 2
        Rrel, trel = _feature_chain(Rw, tw, jnp.int32(c0), 3)
        for m in range(3):
            Am = A[c0 + m] @ A[c0].T
            bm = b[c0 + m] - Am @ b[c0]
            np.testing.assert_allclose(np.asarray(Rrel)[m], Am, atol=1e-9)
            np.testing.assert_allclose(np.asarray(trel)[m], bm, atol=1e-9)


class TestUpdate:
    def test_triangulation_recovers_depth(self):
        rng = np.random.default_rng(22)
        state, batch, (A, b, pts) = _scene(rng)
        _, diag = _update(state, batch)
        rho = np.asarray(diag["rho"])
        for f, p_c0 in enumerate(pts):
            np.testing.assert_allclose(1.0 / rho[f], np.linalg.norm(p_c0),
                                       rtol=1e-4)
        # landmark output is in the *last* window frame (body coords)
        lm = np.asarray(diag["landmarks"])
        for f, p_c0 in enumerate(pts):
            p_b0 = R_BC @ p_c0 + T_BC
            p_bL = A[L - 1] @ p_b0 + b[L - 1]
            np.testing.assert_allclose(lm[f], p_bL, rtol=1e-3, atol=1e-3)

    def test_exact_measurements_pass_gate_and_shrink_P(self):
        rng = np.random.default_rng(23)
        state, batch, _ = _scene(rng)
        out, diag = _update(state, batch)
        assert bool(diag["did_update"])
        assert int(diag["n_good"]) == F
        P0, P1 = np.asarray(state.P), np.asarray(out.P)
        np.testing.assert_allclose(P1, P1.T, atol=1e-12)
        assert np.trace(P1[24:, 24:]) < np.trace(P0[24:, 24:])
        assert np.linalg.eigvalsh(P1).min() > -1e-12
        # zero-noise residuals: state barely moves
        assert float(jnp.linalg.norm(out.p_G - state.p_G)) < 1e-4

    def test_outlier_rejected_by_gate(self):
        rng = np.random.default_rng(24)
        state, batch, _ = _scene(rng)
        bad = np.array(batch.meas)
        bad[1, 3] += np.array([0.15, -0.2])  # gross outlier mid-track
        batch2 = UpdateBatch(meas=jnp.asarray(bad), track_len=batch.track_len,
                             is_type2=batch.is_type2, valid=batch.valid)
        _, diag = _update(state, batch2)
        passed = np.asarray(diag["passed"])
        assert not passed[1]
        assert passed[0] and passed[2] and passed[3]

    def test_too_few_features_no_update(self):
        rng = np.random.default_rng(25)
        state, batch, _ = _scene(rng, n_feats=2)
        out, diag = _update(state, batch)
        assert not bool(diag["did_update"])
        np.testing.assert_allclose(out.P, state.P, atol=0)
        np.testing.assert_allclose(out.q_G, state.q_G, atol=0)

    def test_compression_modes_agree(self):
        rng = np.random.default_rng(26)
        state, batch, _ = _scene(rng, noise=5e-4)
        out_qr, _ = _update(state, batch, "qr")
        out_ch, _ = _update(state, batch, "cholesky")
        np.testing.assert_allclose(out_qr.p_G, out_ch.p_G, atol=1e-8)
        np.testing.assert_allclose(out_qr.P, out_ch.P, atol=1e-7)

    def test_cholqr2_tsqr_exact_information(self):
        """CholeskyQR2-TSQR (the TPU path — XLA TPU QR hangs the compiler)
        carries exact information: R^T R == H^T H and R^T rn == H^T r on
        every live column, with dead (exactly-zero) columns completed by
        zero-effect unit rows."""
        from rvio_tpu.filter.update import tsqr_compress
        rng = np.random.default_rng(29)
        C = 84
        H = rng.normal(size=(12000, C))
        H[rng.uniform(size=12000) < 0.5] = 0.0       # rejected features
        dead_cols = [78, 79, 80, 81, 82, 83]          # invalid clones
        H[:, dead_cols] = 0.0
        # make it genuinely ill-conditioned on the live part
        H[:, 0] *= 1e-4
        r = rng.normal(size=12000)
        r[(H == 0).all(axis=1)] = 0.0
        Rf, rn = tsqr_compress(jnp.asarray(H), jnp.asarray(r),
                               method="cholqr2")
        # completion rows are stripped, so the information is exact
        # EVERYWHERE — dead columns included (zero rows, like Householder)
        np.testing.assert_allclose(np.asarray(Rf.T @ Rf), H.T @ H,
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(Rf.T @ rn), H.T @ r,
                                   rtol=1e-6, atol=1e-8)

    def test_cholqr2_update_matches_householder(self):
        """Full MSCKF update through cholqr2-TSQR equals the Householder-QR
        update (the completion rows meet zero covariance rows)."""
        from rvio_tpu.filter import update as U
        rng = np.random.default_rng(30)
        state, batch, _ = _scene(rng, noise=5e-4)
        out_ref, diag_ref = _update(state, batch, "qr")

        orig = U.tsqr_compress
        try:
            # force every stack through the cholqr2 tree
            U_tsqr = lambda H, r, block_rows=0, method="householder": \
                orig(H, r, block_rows=96, method="cholqr2")
            U.tsqr_compress = U_tsqr
            import jax as _jax
            bk = _jax.default_backend

            class _B:
                def __call__(self):
                    return "tpu"
            _jax.default_backend = lambda: "tpu"
            try:
                out_cq, diag_cq = _update(state, batch, "qr")
            finally:
                _jax.default_backend = bk
        finally:
            U.tsqr_compress = orig
        assert bool(diag_cq["did_update"]) == bool(diag_ref["did_update"])
        np.testing.assert_allclose(out_cq.p_G, out_ref.p_G, atol=1e-7)
        np.testing.assert_allclose(out_cq.v_R, out_ref.v_R, atol=1e-7)
        np.testing.assert_allclose(out_cq.P, out_ref.P, atol=1e-6)

    def test_tsqr_equivalent_to_direct_qr(self):
        """Blocked TSQR carries the same information as one monolithic thin
        QR: R^T R == H^T H and R^T rn == H^T r (the EKF only uses these),
        including masked-out zero rows like the stacked update produces."""
        from rvio_tpu.filter.update import tsqr_compress
        rng = np.random.default_rng(28)
        C = 84
        H = rng.normal(size=(3000, C))
        H[rng.uniform(size=3000) < 0.4] = 0.0      # rejected-feature rows
        r = rng.normal(size=3000)
        r[(H == 0).all(axis=1)] = 0.0
        Rf, rn = tsqr_compress(jnp.asarray(H), jnp.asarray(r))
        assert Rf.shape == (C, C)
        np.testing.assert_allclose(np.asarray(Rf.T @ Rf), H.T @ H,
                                   rtol=1e-9, atol=1e-7)
        np.testing.assert_allclose(np.asarray(Rf.T @ rn), H.T @ r,
                                   rtol=1e-9, atol=1e-7)

    def test_noisy_update_reduces_error_vs_perturbed_clones(self):
        """Perturb clone positions; the update should pull them back."""
        rng = np.random.default_rng(27)
        state, batch, (A, b, pts) = _scene(rng, n_feats=F)
        # perturb the newest clone's position estimate
        clones = np.array(state.clones)
        true_last = clones[M - 1, 4:7].copy()
        clones[M - 1, 4:7] += np.array([0.02, -0.015, 0.01])
        # inflate its covariance so the gate passes and the correction flows
        P = np.array(state.P)
        s = 24 + 6 * (M - 1) + 3
        P[s:s + 3, s:s + 3] += np.eye(3) * 1e-3
        st2 = FilterState(**{**state.__dict__, "clones": jnp.asarray(clones),
                             "P": jnp.asarray(P)})
        out, diag = _update(st2, batch)
        assert bool(diag["did_update"])
        err_before = np.linalg.norm(clones[M - 1, 4:7] - true_last)
        err_after = np.linalg.norm(np.asarray(out.clones)[M - 1, 4:7] - true_last)
        assert err_after < 0.75 * err_before

    def test_type1_short_track_tail_alignment(self):
        """A type-1 feature observed only in the last 3 window frames."""
        rng = np.random.default_rng(28)
        qs, ps = _rand_transitions(rng, M)
        A, b = _window_poses_np(qs, ps)
        state = _make_state(rng, qs, ps)
        meas = np.zeros((F, L, 2))
        tlen = np.zeros(F, np.int32)
        valid = np.zeros(F, bool)
        T, c0 = 3, M - 2  # frames c0..c0+T-1 = last 3 window frames
        pts = []
        for f in range(F):
            d = rng.uniform(3, 6)
            dir0 = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), 1.0])
            # anchor camera = frame c0
            p_cc0 = d * dir0 / np.linalg.norm(dir0)
            # convert to frame-0 camera coords for _cam_point
            p_b_anchor = R_BC @ p_cc0 + T_BC
            p_b0 = A[c0].T @ (p_b_anchor - b[c0])
            p_c0 = R_BC.T @ (p_b0 - T_BC)
            pts.append(p_cc0)
            for m in range(T):
                z, pc = _cam_point(A, b, c0 + m, p_c0)
                meas[f, m] = z
            tlen[f] = T
            valid[f] = True
        batch = UpdateBatch(meas=jnp.asarray(meas), track_len=jnp.asarray(tlen),
                            is_type2=jnp.zeros(F, bool) if False else jnp.asarray(np.zeros(F, bool)),
                            valid=jnp.asarray(valid))
        out, diag = _update(state, batch)
        rho = np.asarray(diag["rho"])
        for f, p in enumerate(pts):
            np.testing.assert_allclose(1 / rho[f], np.linalg.norm(p), rtol=1e-3)
        assert int(diag["n_good"]) == F

    def test_type2_truncation_uses_half(self):
        rng = np.random.default_rng(29)
        state, batch, _ = _scene(rng)
        batch2 = UpdateBatch(meas=batch.meas, track_len=batch.track_len,
                             is_type2=jnp.asarray(np.ones(F, bool)),
                             valid=batch.valid)
        _, diag = _update(state, batch2)
        # T=5 -> T_eff=3 -> DOF = 2*3-3 = 3 per feature
        assert bool(diag["did_update"])
