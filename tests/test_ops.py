"""Pallas TPU kernel tests (interpret mode on CPU; exact-match oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvio_tpu.frontend.klt import _gather_tiles
from rvio_tpu.ops.tile_gather import (gather_tiles_pallas,
                                      gather_tiles_narrow_pallas)


class TestTileGatherKernels:
    def test_wide_aligned_gather(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (128, 512)), jnp.float32)
        orig = np.asarray(rng.integers(0, 80, (23, 2)), np.int32)
        orig[:, 1] = (np.clip(orig[:, 1], 0, 128 - 40) // 8) * 8
        orig[:, 0] = (np.clip(orig[:, 0], 0, 512 - 256) // 128) * 128
        orig = jnp.asarray(orig)
        a = gather_tiles_pallas(img, orig, th=40, tw=256, interpret=True)
        b = _gather_tiles(img, orig, 40, 256)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_narrow_roll_gather(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 255, (96, 640)), jnp.float32)
        orig = np.asarray(rng.integers(0, 300, (31, 2)), np.int32)
        orig[:, 1] = (np.clip(orig[:, 1], 0, 96 - 40) // 8) * 8
        orig[:, 0] = np.clip(orig[:, 0], 0, 640 - 256)  # arbitrary columns
        orig = jnp.asarray(orig)
        a = gather_tiles_narrow_pallas(img, orig, th=40, tw=32, interpret=True)
        b = _gather_tiles(img, orig, 40, 32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_narrow_gather_origin_clamping(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 255, (64, 384)), jnp.float32)
        # out-of-range origins clamp to the kernel's bound: the window must
        # fit AND the 128-aligned 256-wide DMA band must fit
        orig = jnp.asarray([[-20, -16], [500, 900], [60, 24]], jnp.int32)
        a = gather_tiles_narrow_pallas(img, orig, th=40, tw=32, interpret=True)
        band_max = ((384 - 256) // 128) * 128 + 127
        x_max = min(384 - 32, band_max)
        oc = jnp.stack([jnp.clip(orig[:, 0], 0, x_max),
                        (jnp.clip(orig[:, 1], 0, 64 - 40) // 8) * 8], axis=1)
        b = _gather_tiles(img, oc, 40, 32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSpdSolve:
    def test_quadform_matches_dense_solve(self):
        from rvio_tpu.ops.spd_solve import batched_quadform_pallas
        rng = np.random.default_rng(5)
        F, m = 37, 30
        A = rng.normal(size=(F, m, m))
        S = A @ np.transpose(A, (0, 2, 1)) + 1e-2 * np.eye(m)
        r = rng.normal(size=(F, m))
        D = np.asarray(batched_quadform_pallas(
            jnp.asarray(S), jnp.asarray(r), interpret=True))
        D_ref = np.einsum(
            "fi,fi->f", r, np.linalg.solve(S, r[..., None])[..., 0])
        np.testing.assert_allclose(D, D_ref, rtol=1e-9)

    def test_quadform_degenerate_lane_rejects(self):
        """Zero / indefinite S must yield NaN (auto-rejected by the chi2
        gate), without contaminating other lanes."""
        from rvio_tpu.ops.spd_solve import batched_quadform_pallas
        rng = np.random.default_rng(6)
        F, m = 8, 10
        A = rng.normal(size=(F, m, m))
        S = A @ np.transpose(A, (0, 2, 1)) + 1e-2 * np.eye(m)
        S[0] = 0.0
        r = rng.normal(size=(F, m))
        D = np.asarray(batched_quadform_pallas(
            jnp.asarray(S), jnp.asarray(r), interpret=True))
        assert np.isnan(D[0])
        D_ref = np.einsum(
            "fi,fi->f", r[1:], np.linalg.solve(S[1:], r[1:, :, None])[..., 0])
        np.testing.assert_allclose(D[1:], D_ref, rtol=1e-9)


class TestLmTriangulate:
    def _geometry(self, rng, F=24, L=15):
        from scipy.spatial.transform import Rotation
        Rc = np.stack([np.stack([
            Rotation.from_rotvec(rng.normal(size=3) * 0.05).as_matrix()
            for _ in range(L)]) for _ in range(F)])
        Rc[:, 0] = np.eye(3)
        tc = rng.normal(size=(F, L, 3)) * 0.1
        tc[:, 0] = 0
        pts = np.array([0.2, -0.1, 2.0]) + rng.normal(size=(F, 3)) * 0.3
        z = np.zeros((F, L, 2))
        for f in range(F):
            d = np.linalg.norm(pts[f])
            for l in range(L):
                h = Rc[f, l] @ pts[f] / d + tc[f, l] / d
                z[f, l] = h[:2] / h[2] + rng.normal(size=2) * 0.001
        tl = np.minimum(3 + rng.integers(0, L, size=F), L).astype(np.int32)
        return z, Rc, tc, tl

    def test_matches_xla_lm(self):
        """ops/lm_triangulate kernel (interpreted) == filter/update's
        vmapped _lm_triangulate to fp precision."""
        import jax
        from rvio_tpu.filter.update import _lm_triangulate
        from rvio_tpu.ops.lm_triangulate import lm_triangulate_pallas
        rng = np.random.default_rng(4)
        L = 15
        sigma = 0.005
        z, Rc, tc, tl = self._geometry(rng, L=L)
        za, Ra, ta = jnp.asarray(z), jnp.asarray(Rc), jnp.asarray(tc)
        ref = jax.vmap(lambda zz, rr, tt, ll:
                       _lm_triangulate(zz, rr, tt, ll, sigma, L)
                       )(za, Ra, ta, jnp.asarray(tl))
        got = lm_triangulate_pallas(za, Ra, ta, jnp.asarray(tl),
                                    sigma_im=sigma, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
        ok = np.asarray(ref[3])
        for i, name in enumerate(("phi", "psi", "rho")):
            np.testing.assert_allclose(np.asarray(got[i])[ok],
                                       np.asarray(ref[i])[ok],
                                       atol=1e-12, err_msg=name)


class TestSubpixKernel:
    def test_matches_xla_subpix(self):
        from scipy.ndimage import gaussian_filter
        from rvio_tpu.frontend.detector import corner_subpix
        from rvio_tpu.ops.klt_iterate import subpix_refine_pallas
        rng = np.random.default_rng(9)
        img = jnp.asarray(gaussian_filter(
            rng.uniform(0, 255, (240, 320)), 1.0))
        pts = jnp.asarray(np.stack(
            np.meshgrid(np.arange(40, 280, 24), np.arange(40, 200, 24)),
            -1).reshape(-1, 2), jnp.float64)
        pts = pts + jnp.asarray(rng.uniform(-0.4, 0.4, pts.shape))
        a = np.asarray(corner_subpix(img, pts, win=7))
        b = np.asarray(subpix_refine_pallas(img, pts, win=7, interpret=True))
        # tile geometry differs at image borders; interior corners agree to
        # well under detection quantization
        d = np.abs(a - b)
        assert np.median(d) < 1e-3
        assert d.max() < 0.15


class TestClaheKernels:
    """ops/clahe kernels (interpreted) == the XLA clahe path."""

    def _check(self, H, W, grid=5, seed=0):
        import jax.numpy as jnp
        from rvio_tpu.frontend.image import clahe
        from rvio_tpu.ops.clahe import clahe_pallas, clahe_supported

        rng = np.random.default_rng(seed)
        base = rng.normal(size=(H // 8, W // 8))
        img = np.kron(base, np.ones((8, 8)))[:H, :W]
        img = (img - img.min()) / (img.max() - img.min()) * 230.0 + 10.0
        img += rng.normal(size=img.shape) * 4.0
        img = np.clip(img, 0, 255).astype(np.float32)
        assert clahe_supported(H, W, grid, 256)
        ref = np.asarray(clahe(jnp.asarray(img), 3.0, grid))
        out = np.asarray(clahe_pallas(jnp.asarray(img), 3.0, grid,
                                      interpret=True))
        # both paths use bf16 one-hot/LUT operands with f32 accumulation;
        # summation order differs, so allow sub-graylevel slack
        np.testing.assert_allclose(out, ref, atol=0.75)

    def test_flagship_shape(self):
        self._check(480, 752)

    def test_unaligned_width(self):
        # Wp = 5*ceil(130/5) = 130, lane-padded to 256 inside the kernel
        self._check(120, 130)

    def test_row_padded_shape(self):
        # H=475 -> th=95? not supported; H=470 -> th=94 unsupported; use
        # H=440 (th=88, %8==0) with W needing reflect pad (W=750 -> tw=150)
        self._check(440, 750)

    def test_hist_counts_exact(self):
        """The nibble-factored histogram kernel must produce EXACT per-tile
        counts (0/1 bf16 operands, f32 accumulation): compare the
        unscrambled (tile, 256) histogram against numpy's, per tile."""
        import jax.numpy as jnp
        from rvio_tpu.ops.clahe import _hist_call, _R

        rng = np.random.default_rng(5)
        H, W, g = 480, 752, 5
        th, tw = -(-H // g), -(-W // g)
        Hp, Wp = th * g, tw * g
        Wpx = -(-Wp // 128) * 128
        img = rng.uniform(0, 255.0001, (H, W)).astype(np.float32)
        x = np.pad(img, ((0, Hp - H), (0, Wp - W)), mode="reflect")
        xp = np.pad(x, ((0, 0), (0, Wpx - Wp)))
        wcol = np.arange(Wpx)
        key = np.where(wcol < Wp, np.clip(wcol // tw, 0, g - 1),
                       -(10 ** 6)).astype(np.float32)[None, :]
        h3 = np.asarray(_hist_call(jnp.asarray(xp), jnp.asarray(key), g,
                                   th // _R, interpret=True))
        hist = np.transpose(h3.reshape(g, 16, 16, g),
                            (0, 3, 1, 2)).reshape(g * g, 256)
        for p in range(g):
            for q in range(g):
                tile = x[p * th:(p + 1) * th, q * tw:(q + 1) * tw]
                ref = np.bincount(
                    np.clip(tile.astype(np.int64).ravel(), 0, 255),
                    minlength=256)
                np.testing.assert_array_equal(hist[p * g + q], ref)


class TestShiTomasiKernel:
    def test_matches_xla_interior(self):
        """Pallas fused response == the XLA oracle on the whole map
        (both zero the 2-px border; interior must match to fp rounding)."""
        import numpy as np
        from rvio_tpu.frontend.detector import shi_tomasi_response
        from rvio_tpu.ops.shi_tomasi import shi_tomasi_pallas
        rng = np.random.default_rng(17)
        img = jnp.asarray(rng.uniform(0, 255, (480, 752)), jnp.float32)
        ref = np.asarray(shi_tomasi_response(img, use_pallas=False))
        out = np.asarray(shi_tomasi_pallas(img, interpret=True))
        assert out.shape == ref.shape
        # border ring is exactly zero in both
        assert np.all(out[:2] == 0) and np.all(out[:, :2] == 0)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-2)

    def test_odd_shape(self):
        import numpy as np
        from rvio_tpu.frontend.detector import shi_tomasi_response
        from rvio_tpu.ops.shi_tomasi import shi_tomasi_pallas
        rng = np.random.default_rng(18)
        img = jnp.asarray(rng.uniform(0, 255, (123, 217)), jnp.float32)
        ref = np.asarray(shi_tomasi_response(img, use_pallas=False))
        out = np.asarray(shi_tomasi_pallas(img, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-2)


class TestJacProjectKernel:
    """ops/jac_project fused jacobian+projection vs the XLA per-feature
    oracle.  The kernel pivots on the oracle's rows, but a reflector's
    sign can flip on near-zero pivots, so rows are compared through the
    orthogonally-INVARIANT quantities every consumer uses: the projected
    Gram H^T H / H^T r / r^T r (gate distance, cholesky/qr compression
    all derive from these)."""

    def _setup(self, F=12, L=15, M=14, seed=0, c0_mode="zero"):
        rng = np.random.default_rng(seed)
        from scipy.spatial.transform import Rotation

        Rrel = np.zeros((F, L, 3, 3))
        trel = rng.normal(size=(F, L, 3)) * 0.3
        for f in range(F):
            Rrel[f] = Rotation.random(L, rng).as_matrix()
            Rrel[f, 0] = np.eye(3)
            trel[f, 0] = 0
        R_bc = Rotation.random(1, rng).as_matrix()[0]
        t_bc = rng.normal(size=3) * 0.05
        R_cb, t_cb = R_bc.T, -R_bc.T @ t_bc
        Rc = np.einsum("ab,flbc,cd->flad", R_cb, Rrel, R_bc)
        tc = (np.einsum("ab,flbc,c->fla", R_cb, Rrel, t_bc)
              + np.einsum("ab,flb->fla", R_cb, trel) + t_cb)
        z = rng.normal(size=(F, L, 2)) * 0.2
        phi = rng.normal(size=F) * 0.5
        psi = rng.normal(size=F) * 0.5
        rho = rng.uniform(0.2, 2.0, size=F)
        t_eff = rng.integers(2, L + 1, size=F)
        if c0_mode == "zero":
            c0 = np.zeros(F, np.int32)
        else:
            c0 = rng.integers(0, M - 2, size=F).astype(np.int32)
        return dict(z=z, Rrel=Rrel, trel=trel, Rc=Rc, tc=tc, R_bc=R_bc,
                    t_bc=t_bc, phi=phi, psi=psi, rho=rho, t_eff=t_eff,
                    c0=c0, F=F, L=L, M=M)

    def _oracle(self, s):
        from rvio_tpu.filter.update import (_build_jacobians,
                                            _householder_project)
        dt = jnp.float32
        L, M = s["L"], s["M"]
        r_o, hx_o, hfn_o = [], [], []
        for f in range(s["F"]):
            r, Hf, Hx = _build_jacobians(
                jnp.asarray(s["z"][f], dt), jnp.asarray(s["phi"][f], dt),
                jnp.asarray(s["psi"][f], dt), jnp.asarray(s["rho"][f], dt),
                jnp.asarray(s["Rrel"][f], dt), jnp.asarray(s["trel"][f], dt),
                jnp.asarray(s["Rc"][f], dt), jnp.asarray(s["tc"][f], dt),
                jnp.int32(s["c0"][f]), jnp.int32(s["t_eff"][f]),
                jnp.asarray(s["R_bc"], dt), jnp.asarray(s["t_bc"], dt), M,
                jnp.asarray(s["Rc"][f], dt), jnp.asarray(s["tc"][f], dt))
            _, Hx_p, r_p = _householder_project(Hf, Hx, r)
            # integration masks (filter/update.msckf_update)
            Ncols = 2 if float(jnp.linalg.norm(Hf[:, 2])) < 1e-4 else 3
            rows = np.arange(2 * L)
            m = (rows >= Ncols) & (rows < 2 * s["t_eff"][f])
            r_o.append(np.where(m, np.asarray(r_p), 0.0))
            hx_o.append(np.where(m[:, None], np.asarray(Hx_p), 0.0))
            hfn_o.append(float(jnp.linalg.norm(Hf[:, 2])))
        return np.stack(r_o), np.stack(hx_o), np.asarray(hfn_o)

    def _kernel(self, s):
        from rvio_tpu.ops.jac_project import jac_project_pallas
        dt = jnp.float32
        L, M, F = s["L"], s["M"], s["F"]
        J = L - 1
        r_k, hxrel, hfn = jac_project_pallas(
            jnp.asarray(s["z"], dt), jnp.asarray(s["Rc"], dt),
            jnp.asarray(s["tc"], dt), jnp.asarray(s["Rrel"], dt),
            jnp.asarray(s["trel"], dt), jnp.asarray(s["Rc"], dt),
            jnp.asarray(s["tc"], dt), jnp.asarray(s["phi"], dt),
            jnp.asarray(s["psi"], dt), jnp.asarray(s["rho"], dt),
            jnp.asarray(s["t_eff"], jnp.int32),
            Rbc_t=tuple(tuple(float(v) for v in row) for row in s["R_bc"]),
            tbc_t=tuple(float(v) for v in s["t_bc"]), L=L, interpret=True)
        hfn = np.asarray(hfn)
        Ncols = np.where(hfn < 1e-4, 2, 3)
        rows = np.arange(2 * L)
        m = ((rows[None, :] >= Ncols[:, None])
             & (rows[None, :] < 2 * s["t_eff"][:, None]))
        r_k = np.where(m, np.asarray(r_k), 0.0)
        # column shift to absolute clone columns
        oh = (s["c0"][:, None, None] + np.arange(J)[None, :, None]
              == np.arange(M)[None, None, :]).astype(np.float32)
        Pm = np.einsum("fjm,bc->fjbmc", oh, np.eye(6, dtype=np.float32))
        Pm = Pm.reshape(F, 6 * J, 6 * M)
        hx = np.einsum("frc,fcd->frd", np.asarray(hxrel), Pm)
        hx = np.where(m[:, :, None], hx, 0.0)
        return r_k, hx, hfn

    def _check(self, s):
        r_o, hx_o, hfn_o = self._oracle(s)
        r_k, hx_k, hfn_k = self._kernel(s)
        np.testing.assert_allclose(hfn_k, hfn_o, rtol=1e-4, atol=1e-4)

        def invs(r, h):
            return (np.einsum("frc,frd->fcd", h, h),
                    np.einsum("frc,fr->fc", h, r),
                    np.einsum("fr,fr->f", r, r))

        for a, b in zip(invs(r_o, hx_o), invs(r_k, hx_k)):
            sc = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(b / sc, a / sc, atol=1e-3)

    def test_anchored_at_zero(self):
        self._check(self._setup(c0_mode="zero"))

    def test_shifted_anchors(self):
        self._check(self._setup(seed=3, c0_mode="rand"))

    def test_full_budget_shape(self):
        self._check(self._setup(F=100, L=15, M=14, seed=5, c0_mode="rand"))

    def test_degenerate_depth_clamps(self, monkeypatch):
        """|h_z| below the kernel's widened 1e-6 guard stays finite and
        matches the oracle evaluated with the SAME guard.

        The kernel deliberately clamps depth at 1e-6 (vs the XLA path's
        _EPS_DEPTH=1e-12) because its all-f32 Householder norms square the
        perspective rows — 1/eps^4 overflows f32 below eps~1e-10.  This
        pins that widening: features whose chain depth lands in the
        divergence regime (1e-12 < |h_z| < 1e-6) produce finite outputs
        identical to an oracle whose guard is widened to 1e-6 (i.e. the
        clamp, not the raw depth, defines the kernel's semantics there).
        Such features cannot survive to the update in practice — LM
        triangulation rejects them (Updater.cc:265-269) — so the regime is
        guard-only; this test keeps it from silently rotting."""
        import rvio_tpu.filter.update as upd

        s = self._setup(F=8, L=15, M=14, seed=7, c0_mode="zero")
        # Drive a degenerate chain depth: identity-ish rotation rows keep
        # h ~ Rc epf + rho tc controllable — shift tc_z so h_z ~ 1e-9 for
        # rows l >= 1 of features 0..3 (row 0 always anchors at the first
        # measurement and keeps its healthy depth).
        phi = np.zeros_like(s["phi"])
        psi = np.zeros_like(s["psi"])
        rho = np.ones_like(s["rho"])
        Rc = np.broadcast_to(np.eye(3), s["Rc"].shape).copy()
        tc = np.zeros_like(s["tc"])
        tc[:4, 1:, 2] = -(1.0 - 1e-9)   # h_z = 1e-9: inside (1e-12, 1e-6)
        s.update(phi=phi, psi=psi, rho=rho, Rc=Rc, tc=tc)

        r_k, hx_k, hfn_k = self._kernel(s)
        assert np.isfinite(r_k).all() and np.isfinite(hx_k).all() \
            and np.isfinite(hfn_k).all()
        # magnitudes bounded by the 1e-6 clamp (residual ~ h_x / 1e-6)
        assert np.abs(r_k).max() < 1e8

        monkeypatch.setattr(upd, "_EPS_DEPTH", 1e-6)
        r_o, hx_o, hfn_o = self._oracle(s)
        np.testing.assert_allclose(hfn_k, hfn_o, rtol=1e-4, atol=1e-4)

        def invs(r, h):
            return (np.einsum("frc,frd->fcd", h, h),
                    np.einsum("frc,fr->fc", h, r),
                    np.einsum("fr,fr->f", r, r))

        for a, b in zip(invs(r_o, hx_o), invs(r_k, hx_k)):
            sc = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(b / sc, a / sc, atol=1e-3)


class TestPropagateBlockKernel:
    """ops/propagate_block fused propagation == the sequential fp-order
    oracle (_propagate_sequential) to f32 rounding."""

    def test_matches_sequential_oracle(self):
        from rvio_tpu.config import RVIOConfig
        from rvio_tpu.core.quaternion import quat_to_rot
        from rvio_tpu.filter.propagation import (ImuBlock,
                                                 _propagate_sequential)
        from rvio_tpu.ops.propagate_block import propagate_block_pallas
        from rvio_tpu.state import make_initial_state, FilterState
        from scipy.spatial.transform import Rotation

        cfg = RVIOConfig()
        rng = np.random.default_rng(0)
        M, K = cfg.window_size, cfg.tpu.imu_block
        dt32 = jnp.float32
        st = make_initial_state(M, dt32)
        A = rng.normal(size=(24 + 6 * M, 24 + 6 * M)) * 0.01
        P = A @ A.T + np.eye(24 + 6 * M) * 1e-4
        st = FilterState(**{
            **st.__dict__,
            "q_R": jnp.asarray(Rotation.random(1, rng).as_quat()[0], dt32),
            "p_R": jnp.asarray(rng.normal(size=3), dt32),
            "v_R": jnp.asarray(rng.normal(size=3), dt32),
            "g": jnp.asarray([0.05, -0.02, 0.998], dt32),
            "bg": jnp.asarray(rng.normal(size=3) * 0.01, dt32),
            "ba": jnp.asarray(rng.normal(size=3) * 0.05, dt32),
            "P": jnp.asarray(P, dt32)})
        # includes a small-angle sample (row 3 near-zero rate) + padding
        w = rng.normal(size=(K, 3)) * 0.4
        w[3] = 1e-8
        a = rng.normal(size=(K, 3)) * 2.0 + [0, 0, 9.8]
        dts = np.full(K, 0.005)
        valid = np.arange(K) < 11
        imu = ImuBlock(w=jnp.asarray(w, dt32), a=jnp.asarray(a, dt32),
                       dt=jnp.asarray(dts, dt32), valid=jnp.asarray(valid))
        kw = dict(gravity=cfg.imu.gravity, small_angle=cfg.imu.small_angle,
                  sigma_g=cfg.imu.sigma_g, sigma_wg=cfg.imu.sigma_wg,
                  sigma_a=cfg.imu.sigma_a, sigma_wa=cfg.imu.sigma_wa)
        ref = _propagate_sequential(st, imu, **kw)

        sig = ((cfg.imu.sigma_g ** 2,) * 3 + (cfg.imu.sigma_wg ** 2,) * 3
               + (cfg.imu.sigma_a ** 2,) * 3 + (cfg.imu.sigma_wa ** 2,) * 3)
        dte = jnp.where(imu.valid, imu.dt, 0.0)
        Rk, pk, vk, P24, Psi = propagate_block_pallas(
            imu.w, imu.a, dte, quat_to_rot(st.q_R), st.v_R, st.g, st.bg,
            st.ba, st.P[:24, :24], gravity=cfg.imu.gravity,
            small_angle=cfg.imu.small_angle, sig=sig, interpret=True)
        np.testing.assert_allclose(np.asarray(Rk),
                                   np.asarray(quat_to_rot(ref.q_R)),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pk), np.asarray(ref.p_R),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(vk), np.asarray(ref.v_R),
                                   atol=1e-6)
        Pr = np.asarray(ref.P[:24, :24])
        np.testing.assert_allclose(np.asarray(P24) / np.abs(Pr).max(),
                                   Pr / np.abs(Pr).max(), atol=1e-6)
        cr = np.asarray(ref.P[:24, 24:])
        ck = np.asarray(Psi) @ np.asarray(st.P[:24, 24:])
        np.testing.assert_allclose(ck / max(np.abs(cr).max(), 1e-12),
                                   cr / max(np.abs(cr).max(), 1e-12),
                                   atol=1e-6)


class TestEkfTailKernel:
    """ops/ekf_tail fused compression+EKF core vs the XLA cholesky path.

    The kernel's blocked in-kernel Cholesky/solves reorder f32 reductions
    vs jnp.linalg.cholesky, so outputs match to f32 rounding (relative
    tolerance), not bitwise.
    """

    @staticmethod
    def _oracle(C_raw, b, P, sig2, ridge_rel=1e-8):
        """The exact XLA chain from filter/update.py (cholesky branch +
        EKF core), lifted verbatim."""
        dtype = jnp.float32
        CM = C_raw.shape[0]
        D = P.shape[0]
        ridge = ridge_rel * jnp.maximum(jnp.trace(C_raw), 1.0)
        C = C_raw + ridge * jnp.eye(CM, dtype=dtype)
        Lc = jnp.linalg.cholesky(C)
        rn = jax.scipy.linalg.solve_triangular(Lc, b, lower=True)
        Hn = jnp.concatenate([jnp.zeros((CM, 24), dtype), Lc.T], axis=1)
        PHt = P @ Hn.T
        S = Hn @ PHt + sig2 * jnp.eye(CM, dtype=dtype)
        S = 0.5 * (S + S.T)
        cf = jax.scipy.linalg.cho_factor(S, lower=True)
        K = jax.scipy.linalg.cho_solve(cf, PHt.T).T
        dx = K @ rn
        I_KH = jnp.eye(D, dtype=dtype) - K @ Hn
        P_new = I_KH @ P @ I_KH.T + sig2 * (K @ K.T)
        return dx, 0.5 * (P_new + P_new.T)

    def _check(self, M=14, n_rows=600, dead_clones=2, masked_frac=0.5,
               seed=0, sig2=2.3e-6, atol=2e-5):
        from rvio_tpu.ops.ekf_tail import ekf_tail_pallas
        rng = np.random.default_rng(seed)
        CM, D = 6 * M, 24 + 6 * M
        H = rng.normal(size=(n_rows, CM)).astype(np.float32) * 0.5
        if dead_clones:
            # invalid TRAILING clones (growth phase): dead H columns AND
            # zero P rows/cols — the production invariant
            # (state/filter_state.py) the ridge's conditioning relies on
            H[:, CM - 6 * dead_clones:] = 0.0
        H[int(n_rows * (1 - masked_frac)):] = 0.0   # gate-masked rows
        r = (rng.normal(size=n_rows) * 0.01).astype(np.float32)
        r[int(n_rows * (1 - masked_frac)):] = 0.0
        C = jnp.asarray(H.T @ H)
        b = jnp.asarray(H.T @ r)
        A = rng.normal(size=(D, D)) * 0.02
        P = np.asarray(A @ A.T + np.eye(D) * 1e-4, np.float32)
        if dead_clones:
            P[D - 6 * dead_clones:, :] = 0.0
            P[:, D - 6 * dead_clones:] = 0.0
        P = jnp.asarray(P)
        sig2 = jnp.float32(sig2)

        dx_o, P_o = self._oracle(C, b, P, sig2)
        dx_k, P_k = ekf_tail_pallas(C, b, P, sig2, interpret=True)
        sd = float(jnp.max(jnp.abs(dx_o)))
        sp = float(jnp.max(jnp.abs(P_o)))
        np.testing.assert_allclose(np.asarray(dx_k) / sd,
                                   np.asarray(dx_o) / sd, atol=atol)
        np.testing.assert_allclose(np.asarray(P_k) / sp,
                                   np.asarray(P_o) / sp, atol=atol)

    def test_flagship_shape(self):
        self._check(M=14, n_rows=3000, seed=1)

    def test_small_window(self):
        self._check(M=7, n_rows=320, seed=2)

    def test_few_rows_heavy_masking(self):
        """Rank-deficient stack (rank ~19 of 48 live dims): only the
        1e-8-relative ridge regularizes the null directions, so BOTH
        factorizations return cond(~1e8)-limited results there — kernel
        and oracle agree to ~cond * eps_f32 (a few percent), not to
        rounding.  The live, well-determined directions still agree
        tightly (covered by the other cases); this pins that the kernel
        degrades the same way the oracle does instead of diverging."""
        self._check(M=14, n_rows=200, masked_frac=0.9, dead_clones=6,
                    seed=3, atol=5e-2)

    def test_batched_vmap(self):
        """vmap over a segment batch (the batched filter path)."""
        from rvio_tpu.ops.ekf_tail import ekf_tail_pallas
        rng = np.random.default_rng(5)
        M, B = 7, 3
        CM, D = 6 * M, 24 + 6 * M
        Hs = rng.normal(size=(B, 100, CM)).astype(np.float32) * 0.3
        rs = (rng.normal(size=(B, 100)) * 0.01).astype(np.float32)
        Cs = jnp.asarray(np.einsum("bri,brj->bij", Hs, Hs))
        bs = jnp.asarray(np.einsum("bri,br->bi", Hs, rs))
        As = rng.normal(size=(B, D, D)) * 0.02
        Ps = jnp.asarray(
            (np.einsum("bij,bkj->bik", As, As)
             + np.eye(D)[None] * 1e-4).astype(np.float32))
        sig = jnp.full((B,), 2.3e-6, jnp.float32)

        dx_b, P_b = jax.vmap(
            lambda c, b2, p, s: ekf_tail_pallas(c, b2, p, s,
                                                interpret=True)
        )(Cs, bs, Ps, sig)
        for i in range(B):
            dx_o, P_o = self._oracle(Cs[i], bs[i], Ps[i], sig[i])
            sd = float(jnp.max(jnp.abs(dx_o)))
            np.testing.assert_allclose(np.asarray(dx_b[i]) / sd,
                                       np.asarray(dx_o) / sd, atol=2e-5)
            sp = float(jnp.max(jnp.abs(P_o)))
            np.testing.assert_allclose(np.asarray(P_b[i]) / sp,
                                       np.asarray(P_o) / sp, atol=2e-5)


class TestShiTomasiNmsKernel:
    def test_matches_nms_of_pallas_response_interior(self):
        """Fused response+NMS kernel == the 8-neighbor >=-test applied to
        the (non-fused) Pallas response, bitwise on the interior
        grid_top_corners keeps (border >= 4).

        The oracle uses the PALLAS response as its base: the Pallas and
        XLA responses agree only to fp rounding (rtol 2e-4, see
        TestShiTomasiKernel), so >=-comparisons on a random image flip on
        near-ties between the bases — the NMS logic itself must be exact
        relative to its own response numerics."""
        from rvio_tpu.ops.shi_tomasi import (shi_tomasi_nms_pallas,
                                             shi_tomasi_pallas)
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 255, (240, 320)).astype(np.float32))
        m = np.asarray(shi_tomasi_pallas(img, interpret=True))
        H, W = m.shape
        mpad = np.pad(m, 1, constant_values=-np.inf)
        local_max = np.ones_like(m, bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                local_max &= m >= mpad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        ref = np.where(local_max, m, -np.inf)
        got = np.asarray(shi_tomasi_nms_pallas(img, interpret=True))
        np.testing.assert_array_equal(got[4:-4, 4:-4], ref[4:-4, 4:-4])

    def test_grid_top_pre_nms_equals_inline_nms(self):
        """grid_top_corners(pre_nms=True) on the masked map == the
        original inline-NMS path on the raw response."""
        from rvio_tpu.frontend.detector import (grid_top_corners,
                                                nms_masked_response,
                                                shi_tomasi_response)
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.uniform(0, 255, (240, 320)).astype(np.float32))
        resp = shi_tomasi_response(img, use_pallas=False)
        masked = nms_masked_response(img, use_pallas=False)
        p0, v0 = grid_top_corners(resp, 24, 64, 0.01)
        p1, v1 = grid_top_corners(masked, 24, 64, 0.01, pre_nms=True)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(p0)[np.asarray(v0)],
                                      np.asarray(p1)[np.asarray(v1)])
