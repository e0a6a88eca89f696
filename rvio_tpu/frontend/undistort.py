"""Point undistortion to normalized camera coordinates.

Replaces the reference's cv::undistortPoints / cv::fisheye::undistortPoints
calls (reference: src/rvio/Tracker.cc:100-132) with batched fixed-point
iterations — branch-free, jit/vmap-safe, identical model:

- radtan (plain):  x_d = x(1 + k1 r^2 + k2 r^4 + k3 r^6) + tangential(p1,p2)
- fisheye (equidistant): theta_d = theta (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8)

OpenCV inverts these with 5 fixed-point iterations (undistortPoints) /
10 Newton-ish iterations (fisheye); we use a few more for safety — iteration
count is static so XLA unrolls and fuses the whole thing.
"""

from __future__ import annotations

import jax.numpy as jnp


def distort_radtan(xy: jnp.ndarray, k1, k2, p1, p2, k3=0.0) -> jnp.ndarray:
    """Forward radtan distortion on normalized points (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_radtan(xy_d: jnp.ndarray, k1, k2, p1, p2, k3=0.0,
                     iters: int = 15) -> jnp.ndarray:
    """Invert radtan by fixed-point iteration (OpenCV-style compensation)."""
    xd, yd = xy_d[..., 0], xy_d[..., 1]
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x, y], axis=-1)


def distort_fisheye(xy: jnp.ndarray, k1, k2, k3, k4) -> jnp.ndarray:
    """Forward equidistant fisheye distortion on normalized points."""
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan(r)
    th2 = theta * theta
    theta_d = theta * (1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], axis=-1)


def undistort_fisheye(xy_d: jnp.ndarray, k1, k2, k3, k4,
                      iters: int = 10) -> jnp.ndarray:
    """Invert the equidistant model: solve theta from theta_d by Newton."""
    xd, yd = xy_d[..., 0], xy_d[..., 1]
    theta_d = jnp.sqrt(jnp.maximum(xd * xd + yd * yd, 1e-18))
    theta = theta_d
    for _ in range(iters):
        th2 = theta * theta
        f = theta * (1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4)))) - theta_d
        fp = (1 + th2 * (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3 + th2 * 9 * k4))))
        theta = theta - f / fp
    scale = jnp.tan(theta) / theta_d
    return jnp.stack([xd * scale, yd * scale], axis=-1)


def undistort_normalize(pts_px: jnp.ndarray, *, fx, fy, cx, cy,
                        k1, k2, p1, p2, k3=0.0, fisheye: bool = False
                        ) -> jnp.ndarray:
    """Pixel coords (..., 2) -> undistorted normalized coords (..., 2).

    Equivalent to the reference's UndistortAndNormalize (Tracker.cc:100-132):
    output is (x', y') with z = 1 in the camera frame.
    """
    x = (pts_px[..., 0] - cx) / fx
    y = (pts_px[..., 1] - cy) / fy
    xy = jnp.stack([x, y], axis=-1)
    if fisheye:
        # fisheye model: distortion coeffs are k1..k4 (p1,p2 slots)
        return undistort_fisheye(xy, k1, k2, p1, p2)
    return undistort_radtan(xy, k1, k2, p1, p2, k3)


def project_to_pixels(xy_n: jnp.ndarray, *, fx, fy, cx, cy,
                      k1, k2, p1, p2, k3=0.0, fisheye: bool = False
                      ) -> jnp.ndarray:
    """Normalized coords -> distorted pixel coords (synthesis / simulator)."""
    if fisheye:
        d = distort_fisheye(xy_n, k1, k2, p1, p2)
    else:
        d = distort_radtan(xy_n, k1, k2, p1, p2, k3)
    return jnp.stack([d[..., 0] * fx + cx, d[..., 1] * fy + cy], axis=-1)
