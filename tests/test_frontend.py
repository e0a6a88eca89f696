"""Front-end unit tests: undistortion, RANSAC, image ops, KLT, detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from rvio_tpu.frontend.undistort import (undistort_radtan, distort_radtan,
                                         undistort_fisheye, distort_fisheye,
                                         undistort_normalize, project_to_pixels)
from rvio_tpu.frontend.ransac import (gyro_ransac, integrate_gyro_rotation,
                                      _two_point_translation, _sampson_error)
from rvio_tpu.frontend.image import (clahe, pyr_down, build_pyramid,
                                     bilinear_sample)
from rvio_tpu.frontend.klt import klt_track
from rvio_tpu.frontend.detector import (shi_tomasi_response, grid_top_corners,
                                        corner_subpix, find_newer)

EUROC_DIST = dict(k1=-0.28340811, k2=0.07395907, p1=0.00019359,
                  p2=1.76187114e-05)


class TestUndistort:
    def test_radtan_roundtrip(self):
        rng = np.random.default_rng(0)
        xy = jnp.asarray(rng.uniform(-0.6, 0.6, size=(200, 2)))
        xyd = distort_radtan(xy, **EUROC_DIST)
        back = undistort_radtan(xyd, **EUROC_DIST)
        np.testing.assert_allclose(back, xy, atol=1e-6)

    def test_fisheye_roundtrip(self):
        rng = np.random.default_rng(1)
        xy = jnp.asarray(rng.uniform(-0.5, 0.5, size=(100, 2)))
        ks = dict(k1=0.01, k2=-0.002, k3=0.001, k4=-0.0005)
        xyd = distort_fisheye(xy, *ks.values())
        back = undistort_fisheye(xyd, *ks.values())
        np.testing.assert_allclose(back, xy, atol=1e-8)

    def test_pixel_pipeline_roundtrip(self):
        rng = np.random.default_rng(2)
        intr = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                    **EUROC_DIST)
        xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)))
        px = project_to_pixels(xy, **intr)
        back = undistort_normalize(px, **intr)
        np.testing.assert_allclose(back, xy, atol=1e-6)


class TestRansac:
    def _make_scene(self, rng, n=120, outlier_frac=0.2):
        # random 3D points in front of camera; known R (gyro) and t
        pts3 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                         rng.uniform(3, 10, n)], axis=1)
        rv = np.array([0.02, -0.04, 0.03])
        R_cam = ScipyRot.from_rotvec(rv).as_matrix().T  # cam2<-cam1 (passive)
        t = np.array([0.1, -0.05, 0.02])
        p1 = pts3 / pts3[:, 2:3]
        pc2 = (R_cam @ pts3.T).T + t
        p2 = pc2 / pc2[:, 2:3]
        # plant outliers
        n_out = int(outlier_frac * n)
        out_idx = rng.choice(n, n_out, replace=False)
        p2_out = p2.copy()
        p2_out[out_idx, :2] += rng.uniform(0.05, 0.15, size=(n_out, 2)) \
            * rng.choice([-1, 1], size=(n_out, 2))
        h1 = np.concatenate([p1[:, :2], np.ones((n, 1))], axis=1)
        h2 = np.concatenate([p2_out[:, :2], np.ones((n, 1))], axis=1)
        return jnp.asarray(h1), jnp.asarray(h2), R_cam, out_idx

    def test_two_point_translation_recovers_direction(self):
        rng = np.random.default_rng(3)
        h1, h2, R_cam, _ = self._make_scene(rng, n=10, outlier_frac=0.0)
        t_est = _two_point_translation(h1[0], h2[0], h1[1], h2[1],
                                       jnp.asarray(R_cam))
        # E = [t]x R annihilates correspondences: check epipolar residual
        from rvio_tpu.core.so3 import skew
        E = skew(t_est) @ R_cam
        res = [float(jnp.abs(h2[i] @ E @ h1[i])) for i in range(10)]
        assert max(res) < 1e-6

    def test_outliers_flagged(self):
        rng = np.random.default_rng(4)
        h1, h2, R_cam, out_idx = self._make_scene(rng)
        flags = jnp.ones(h1.shape[0], bool)
        keep = gyro_ransac(jax.random.key(0), h1, h2, flags,
                           jnp.asarray(R_cam), 1e-5)
        keep = np.asarray(keep)
        inl = np.setdiff1d(np.arange(h1.shape[0]), out_idx)
        assert keep[inl].mean() > 0.95
        assert keep[out_idx].mean() < 0.1

    def test_gyro_integration_matches_product(self):
        rng = np.random.default_rng(5)
        n = 10
        w = jnp.asarray(rng.normal(size=(n, 3)))
        dt = jnp.full((n,), 0.005)
        valid = jnp.ones(n, bool)
        R_bc = jnp.asarray(ScipyRot.from_rotvec([0.1, 0.2, 0.3]).as_matrix())
        R = integrate_gyro_rotation(w, dt, valid, R_bc, 0.001745)
        acc = np.eye(3)
        for i in range(n):
            acc = ScipyRot.from_rotvec(-np.asarray(w[i]) * 0.005).as_matrix() @ acc
        np.testing.assert_allclose(R, np.asarray(R_bc).T @ acc @ np.asarray(R_bc),
                                   atol=1e-7)

    def test_passthrough_when_too_few(self):
        rng = np.random.default_rng(6)
        h1, h2, R_cam, _ = self._make_scene(rng, n=120)
        flags = jnp.zeros(120, bool).at[:10].set(True)
        keep = gyro_ransac(jax.random.key(0), h1, h2, flags,
                           jnp.asarray(R_cam), 1e-5)
        np.testing.assert_array_equal(np.asarray(keep), np.asarray(flags))


def _smooth_texture(rng, h, w, blur=6):
    img = rng.uniform(0, 255, size=(h, w))
    k = np.ones(blur) / blur
    for _ in range(3):
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
        img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    img = img - img.min()
    return (img / img.max() * 255.0)


class TestImageOps:
    def test_pyr_down_shape_and_smooth(self):
        rng = np.random.default_rng(7)
        img = jnp.asarray(_smooth_texture(rng, 64, 96))
        d = pyr_down(img)
        assert d.shape == (32, 48)
        assert float(jnp.abs(d).max()) <= 255.0

    def test_bilinear_sample_exact_on_grid(self):
        rng = np.random.default_rng(8)
        img = jnp.asarray(rng.uniform(size=(32, 32)))
        pts = jnp.asarray([[3.0, 5.0], [10.0, 20.0]])
        v = bilinear_sample(img, pts)
        np.testing.assert_allclose(v, [img[5, 3], img[20, 10]], atol=1e-12)

    def test_bilinear_midpoint(self):
        img = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]]))
        v = bilinear_sample(img, jnp.asarray([[0.5, 0.5]]))
        np.testing.assert_allclose(v, [1.5], atol=1e-12)

    def test_clahe_improves_contrast_locally(self):
        rng = np.random.default_rng(9)
        # low-contrast image: values compressed into [100, 120]
        img = _smooth_texture(rng, 120, 150) * 0.08 + 100.0
        out = np.asarray(clahe(jnp.asarray(img), 3.0, 5))
        assert out.std() > np.asarray(img).std() * 1.5
        assert out.shape == img.shape
        assert np.isfinite(out).all()


class TestKLT:
    def _shifted_pair(self, rng, shift, h=160, w=200):
        base = _smooth_texture(rng, h + 20, w + 20)
        img1 = base[10:10 + h, 10:10 + w]
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pts = np.stack([xx + 10 - shift[0], yy + 10 - shift[1]],
                       axis=-1).reshape(-1, 2)
        img2 = np.asarray(bilinear_sample(jnp.asarray(base),
                                          jnp.asarray(pts))).reshape(h, w)
        return jnp.asarray(img1), jnp.asarray(img2)

    def test_recovers_subpixel_translation(self):
        rng = np.random.default_rng(10)
        shift = (3.3, -2.6)
        img1, img2 = self._shifted_pair(rng, shift)
        pyr1 = build_pyramid(img1, 2)
        pyr2 = build_pyramid(img2, 2)
        pts = jnp.asarray(np.stack(np.meshgrid(np.arange(40, 170, 18),
                                               np.arange(40, 130, 18)),
                                   -1).reshape(-1, 2), jnp.float64)
        act = jnp.ones(pts.shape[0], bool)
        new, status, err = klt_track(pyr1, pyr2, pts, act, win=15)
        st = np.asarray(status)
        assert st.mean() > 0.8
        d = np.asarray(new) - np.asarray(pts)
        got = np.median(d[st], axis=0)
        np.testing.assert_allclose(got, shift, atol=0.15)

    def test_large_displacement_needs_pyramid(self):
        rng = np.random.default_rng(11)
        shift = (14.0, 9.0)
        img1, img2 = self._shifted_pair(rng, shift, h=240, w=300)
        pyr1 = build_pyramid(img1, 3)
        pyr2 = build_pyramid(img2, 3)
        pts = jnp.asarray(np.stack(np.meshgrid(np.arange(60, 240, 24),
                                               np.arange(60, 180, 24)),
                                   -1).reshape(-1, 2), jnp.float64)
        act = jnp.ones(pts.shape[0], bool)
        new, status, _ = klt_track(pyr1, pyr2, pts, act, win=15)
        st = np.asarray(status)
        d = np.asarray(new) - np.asarray(pts)
        got = np.median(d[st], axis=0)
        np.testing.assert_allclose(got, shift, atol=0.3)

    def test_tile_matches_gather_formulation(self):
        from rvio_tpu.frontend.klt import klt_track_gather
        rng = np.random.default_rng(15)
        img1, img2 = self._shifted_pair(rng, (4.2, -3.1), h=200, w=260)
        pyr1 = build_pyramid(img1, 3)
        pyr2 = build_pyramid(img2, 3)
        pts = jnp.asarray(np.stack(np.meshgrid(np.arange(50, 210, 20),
                                               np.arange(50, 150, 20)),
                                   -1).reshape(-1, 2), jnp.float64)
        act = jnp.ones(pts.shape[0], bool)
        p_a, s_a, _ = klt_track(pyr1, pyr2, pts, act, win=15)
        p_b, s_b, _ = klt_track_gather(pyr1, pyr2, pts, act, win=15)
        both = np.asarray(s_a) & np.asarray(s_b)
        assert both.mean() > 0.7
        np.testing.assert_allclose(np.asarray(p_a)[both],
                                   np.asarray(p_b)[both], atol=0.05)

    def test_inactive_lanes_skipped(self):
        rng = np.random.default_rng(12)
        img1, img2 = self._shifted_pair(rng, (1.0, 1.0))
        pyr1 = build_pyramid(img1, 2)
        pyr2 = build_pyramid(img2, 2)
        pts = jnp.asarray([[50.0, 50.0], [80.0, 80.0]])
        act = jnp.asarray([True, False])
        _, status, _ = klt_track(pyr1, pyr2, pts, act)
        assert bool(status[0]) and not bool(status[1])

    def test_fused_kernel_matches_tile_path(self):
        """ops/klt_iterate fused kernel (interpreted) == klt_track, interior.

        Border features may differ (the fused path edge-replicates instead
        of zero-padding tiles), so points are kept interior at all levels.
        """
        from rvio_tpu.frontend.klt import klt_track_fused
        rng = np.random.default_rng(21)
        img1, img2 = self._shifted_pair(rng, (3.7, 2.4), h=240, w=320)
        pyr1 = build_pyramid(img1, 3)
        pyr2 = build_pyramid(img2, 3)
        pts = jnp.asarray(np.stack(np.meshgrid(np.arange(90, 240, 16),
                                               np.arange(90, 160, 16)),
                                   -1).reshape(-1, 2), jnp.float64)
        act = jnp.ones(pts.shape[0], bool)
        p_a, s_a, e_a = klt_track(pyr1, pyr2, pts, act, win=15)
        p_b, s_b, e_b = klt_track_fused(pyr1, pyr2, pts, act, win=15,
                                        interpret=True)
        sa, sb = np.asarray(s_a), np.asarray(s_b)
        assert (sa == sb).mean() > 0.95
        both = sa & sb
        assert both.mean() > 0.8
        np.testing.assert_allclose(np.asarray(p_b)[both],
                                   np.asarray(p_a)[both], atol=0.01)
        np.testing.assert_allclose(np.asarray(e_b)[both],
                                   np.asarray(e_a)[both], atol=0.01)

    def test_fused_kernel_recovers_translation(self):
        from rvio_tpu.frontend.klt import klt_track_fused
        rng = np.random.default_rng(22)
        shift = (11.0, -7.0)
        img1, img2 = self._shifted_pair(rng, shift, h=240, w=300)
        pyr1 = build_pyramid(img1, 3)
        pyr2 = build_pyramid(img2, 3)
        pts = jnp.asarray(np.stack(np.meshgrid(np.arange(60, 240, 24),
                                               np.arange(60, 180, 24)),
                                   -1).reshape(-1, 2), jnp.float64)
        act = jnp.ones(pts.shape[0], bool)
        new, status, _ = klt_track_fused(pyr1, pyr2, pts, act, win=15,
                                         interpret=True)
        st = np.asarray(status)
        assert st.mean() > 0.7
        d = np.asarray(new) - np.asarray(pts)
        got = np.median(d[st], axis=0)
        np.testing.assert_allclose(got, shift, atol=0.3)

    def test_fused_kernel_inactive_lanes(self):
        from rvio_tpu.frontend.klt import klt_track_fused
        rng = np.random.default_rng(23)
        img1, img2 = self._shifted_pair(rng, (1.0, 1.0))
        pyr1 = build_pyramid(img1, 2)
        pyr2 = build_pyramid(img2, 2)
        pts = jnp.asarray([[50.0, 50.0], [80.0, 80.0]])
        act = jnp.asarray([True, False])
        _, status, _ = klt_track_fused(pyr1, pyr2, pts, act, interpret=True)
        assert bool(status[0]) and not bool(status[1])


class TestDetector:
    def _corner_image(self, rng, h=240, w=320, n=12):
        img = np.full((h, w), 60.0)
        pts = []
        for _ in range(n):
            y = rng.integers(30, h - 40)
            x = rng.integers(30, w - 40)
            s = 10
            img[y:y + s, x:x + s] = 200.0  # bright square: 4 corners
            pts.append((x, y))
        return jnp.asarray(img), pts

    def test_response_peaks_at_corners(self):
        rng = np.random.default_rng(13)
        img, pts = self._corner_image(rng, n=4)
        resp = np.asarray(shi_tomasi_response(img))
        x, y = pts[0]
        region = resp[y - 4:y + 14, x - 4:x + 14]
        flat = resp[5:15, 5:15]  # featureless area
        assert region.max() > 50 * max(flat.max(), 1e-9)

    def test_grid_selection_spacing(self):
        rng = np.random.default_rng(14)
        img, _ = self._corner_image(rng)
        resp = shi_tomasi_response(img)
        pts, valid = grid_top_corners(resp, 15, 100, 0.01)
        p = np.asarray(pts)[np.asarray(valid)]
        if len(p) > 1:
            d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
            d += np.eye(len(p)) * 1e9
            assert d.min() >= 15.0

    def test_subpix_refines_toward_corner(self):
        # sharp corner at (60.0, 40.0): intensity step in both axes
        img = np.zeros((100, 120))
        img[40:, 60:] = 200.0
        out = np.asarray(corner_subpix(jnp.asarray(img),
                                       jnp.asarray([[59.0, 39.0]]), win=5))
        # subpix converges to the saddle of the gradient field near the step
        assert abs(out[0, 0] - 59.5) < 1.0 and abs(out[0, 1] - 39.5) < 1.0

    def test_find_newer_occupancy_and_distance(self):
        # existing corner at block center; candidates nearby and far
        cand = jnp.asarray([[100.0, 100.0], [330.0, 300.0], [104.0, 100.0]])
        cand_valid = jnp.ones(3, bool)
        ref = jnp.zeros((5, 2)).at[0].set(jnp.asarray([100.0, 104.0]))
        ref_valid = jnp.zeros(5, bool).at[0].set(True)
        admit = find_newer(cand, cand_valid, ref, ref_valid,
                           img_w=752, img_h=480, block_w=150, block_h=120,
                           min_dist=15.0, max_feats=200)
        admit = np.asarray(admit)
        assert not admit[0]      # too close to existing corner
        assert admit[1]          # free block
        assert not admit[2]      # also too close


class TestFusedKltConfigs:
    """fused-KLT tile sizing must hold across window/pyramid configs."""

    @pytest.mark.slow
    @pytest.mark.parametrize("win,levels", [(9, 2), (11, 4), (15, 2)])
    def test_fused_matches_tile_path_config(self, win, levels):
        from rvio_tpu.frontend.klt import klt_track, klt_track_fused
        rng = np.random.default_rng(100 + win + levels)
        h, w = 240, 320
        from scipy.ndimage import gaussian_filter
        base = gaussian_filter(rng.uniform(0, 255, (h + 20, w + 20)), 1.2)
        img1 = jnp.asarray(base[10:10 + h, 10:10 + w])
        from rvio_tpu.frontend.image import bilinear_sample
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pts_grid = np.stack([xx + 10 - 2.7, yy + 10 + 1.9],
                            axis=-1).reshape(-1, 2)
        img2 = jnp.asarray(np.asarray(bilinear_sample(
            jnp.asarray(base), jnp.asarray(pts_grid))).reshape(h, w))
        pyr1 = build_pyramid(img1, levels)
        pyr2 = build_pyramid(img2, levels)
        pts = jnp.asarray(np.stack(np.meshgrid(np.arange(80, 250, 24),
                                               np.arange(80, 170, 24)),
                                   -1).reshape(-1, 2), jnp.float64)
        act = jnp.ones(pts.shape[0], bool)
        p_a, s_a, _ = klt_track(pyr1, pyr2, pts, act, win=win)
        p_b, s_b, _ = klt_track_fused(pyr1, pyr2, pts, act, win=win,
                                      interpret=True)
        sa, sb = np.asarray(s_a), np.asarray(s_b)
        assert (sa == sb).mean() > 0.9, f"win={win} levels={levels}"
        both = sa & sb
        assert both.mean() > 0.7
        np.testing.assert_allclose(np.asarray(p_b)[both],
                                   np.asarray(p_a)[both], atol=0.05)
