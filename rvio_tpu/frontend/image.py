"""Image preprocessing: CLAHE, Gaussian pyramid, gradients — pure XLA.

Equivalents of the reference's OpenCV preprocessing
(reference: src/rvio/Tracker.cc:183-202 — cvtColor + CLAHE(3.0, 5x5);
cv::calcOpticalFlowPyrLK's internal pyramid).  Everything is expressed as
convolutions/reductions so XLA maps it onto the VPU/MXU; shapes are static
per camera config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# cv::pyrDown kernel: [1,4,6,4,1]/16 outer product.
_PYR_K = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32) / 256.0
# Scharr 3x3 (the derivative filter OpenCV's LK uses), scaled by 1/32.
_SCHARR_X = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]],
                     np.float32) / 32.0
_SCHARR_Y = _SCHARR_X.T.copy()
# Sobel 3x3 (cornerMinEigenVal default), scale 1/8 gives unit-gradient norm.
_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T.copy()


def _conv2(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Same-size 2D convolution with reflect padding (OpenCV border default)."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    x = jnp.pad(img, ((ph, ph), (pw, pw)), mode="reflect")
    x = x[None, None]
    k = jnp.asarray(kernel, img.dtype)[None, None]
    # image convs tolerate bf16 passes: keep the fast MXU path even when the
    # global default is 'highest' for the filter algebra
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID",
                                     precision=jax.lax.Precision.DEFAULT)
    return y[0, 0]


def _sep_filter(img: jnp.ndarray, ky, kx) -> jnp.ndarray:
    """Separable filter as shift-adds (reflect border).

    XLA's generic conv is several ms on a single-channel VGA frame; the
    small separable kernels used here (pyrDown, Scharr, Sobel, box) are just
    a handful of full-image fused multiply-adds on the VPU.
    """
    ry, rx = len(ky) // 2, len(kx) // 2
    H, W = img.shape
    x = jnp.pad(img, ((ry, ry), (rx, rx)), mode="reflect")
    rows = None
    for i, c in enumerate(ky):
        if c == 0:
            continue
        t = x[i:i + H, :] * c
        rows = t if rows is None else rows + t
    out = None
    for j, c in enumerate(kx):
        if c == 0:
            continue
        t = rows[:, j:j + W] * c
        out = t if out is None else out + t
    return out


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown: 5x5 Gaussian blur + decimate by 2 (ceil sizing).

    The blur is evaluated only at the even output grid (strided slices), so
    the filter does 1/4 of the full-blur work; bitwise-identical to
    blur-then-decimate.
    """
    k5 = (1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16)
    H, W = img.shape
    Ho, Wo = -(-H // 2), -(-W // 2)
    x = jnp.pad(img, ((2, 2), (2, 2)), mode="reflect")
    rows = None
    for i, c in enumerate(k5):
        t = x[i:i + 2 * Ho - 1:2, :] * c
        rows = t if rows is None else rows + t
    out = None
    for j, c in enumerate(k5):
        t = rows[:, j:j + 2 * Wo - 1:2] * c
        out = t if out is None else out + t
    return out


def build_pyramid(img: jnp.ndarray, levels: int):
    """List of images, level 0 = input, each subsequent halved."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(img: jnp.ndarray):
    """(Ix, Iy) with the LK derivative filter (separable Scharr /32)."""
    sm = [3 / 32, 10 / 32, 3 / 32]
    dv = [-1.0, 0.0, 1.0]
    return _sep_filter(img, sm, dv), _sep_filter(img, dv, sm)


def sobel_gradients(img: jnp.ndarray):
    sm = [1 / 8, 2 / 8, 1 / 8]
    dv = [-1.0, 0.0, 1.0]
    return _sep_filter(img, sm, dv), _sep_filter(img, dv, sm)


def box_filter(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """Unnormalized box sum (cv::boxFilter normalize=false semantics)."""
    k = [1.0] * size
    return _sep_filter(img, k, k)


def clahe(img: jnp.ndarray, clip_limit: float = 3.0, grid: int = 5,
          n_bins: int = 256, use_pallas: bool = True) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization (CLAHE).

    Matches cv::createCLAHE(3.0, Size(5,5)) semantics
    (reference: Tracker.cc:198-202): per-tile clipped histograms, uniform
    redistribution of the clipped mass, CDF LUTs, bilinear interpolation
    between the four surrounding tile mappings.  Input in [0, 255] float;
    output same range.

    On TPU the one-hot halves run as Pallas kernels with VMEM-resident
    one-hots (ops/clahe.py); the XLA path below materializes them in HBM
    and serves as the CPU fallback / f64 oracle.
    """
    H, W = img.shape
    if (use_pallas and jax.default_backend() in ("tpu", "axon")
            and img.dtype == jnp.float32):
        from rvio_tpu.ops.clahe import clahe_pallas, clahe_supported
        if clahe_supported(H, W, grid, n_bins):
            return clahe_pallas(img, clip_limit, grid, n_bins)
    th = -(-H // grid)          # ceil tile size (OpenCV extends the border)
    tw = -(-W // grid)
    Hp, Wp = th * grid, tw * grid
    x = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="reflect")

    tiles = x.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(grid * grid, th * tw)

    bins = jnp.clip(tiles.astype(jnp.int32), 0, n_bins - 1)
    one_hot = jax.nn.one_hot(bins, n_bins, dtype=jnp.bfloat16)
    hist = jnp.sum(one_hot, axis=1, dtype=img.dtype)    # (T, 256), f32 accum

    tile_area = th * tw
    limit = jnp.maximum(clip_limit * tile_area / n_bins, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=1, keepdims=True)
    clipped = clipped + excess / n_bins                 # uniform redistribute

    cdf = jnp.cumsum(clipped, axis=1)
    scale = (n_bins - 1.0) / tile_area
    luts = cdf * scale                                  # (T, 256) mappings

    # Bilinear interpolation between tile LUTs at every pixel, evaluated as
    # one-hot(pixel) @ luts^T on the MXU — per-pixel table gathers are
    # ms-scale scalar loops on TPU, the matmul is tens of us in bf16.
    yy = jnp.arange(Hp, dtype=img.dtype)
    xx = jnp.arange(Wp, dtype=img.dtype)
    ty = (yy - (th - 1) / 2.0) / th                     # tile coordinate
    tx = (xx - (tw - 1) / 2.0) / tw
    ty0 = jnp.clip(jnp.floor(ty), 0, grid - 1).astype(jnp.int32)
    tx0 = jnp.clip(jnp.floor(tx), 0, grid - 1).astype(jnp.int32)
    ty1 = jnp.clip(ty0 + 1, 0, grid - 1)
    tx1 = jnp.clip(tx0 + 1, 0, grid - 1)
    fy = jnp.clip(ty - ty0.astype(img.dtype), 0.0, 1.0)
    fx = jnp.clip(tx - tx0.astype(img.dtype), 0.0, 1.0)

    # per-axis tile weights (Hp, grid)/(Wp, grid)
    WY = (jax.nn.one_hot(ty0, grid, dtype=img.dtype) * (1 - fy)[:, None]
          + jax.nn.one_hot(ty1, grid, dtype=img.dtype) * fy[:, None])
    WX = (jax.nn.one_hot(tx0, grid, dtype=img.dtype) * (1 - fx)[:, None]
          + jax.nn.one_hot(tx1, grid, dtype=img.dtype) * fx[:, None])

    pix = jnp.clip(x.astype(jnp.int32), 0, n_bins - 1)
    oh = jax.nn.one_hot(pix.reshape(-1), n_bins, dtype=jnp.bfloat16)
    vals = jax.lax.dot_general(
        oh, luts.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)             # (Hp*Wp, grid*grid)
    V = vals.reshape(Hp, Wp, grid, grid)
    out = jnp.einsum("hp,wq,hwpq->hw", WY, WX, V,
                     precision=jax.lax.Precision.DEFAULT)
    return out[:H, :W]


def bilinear_sample(img: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation at fractional (x, y) points.

    pts: (..., 2) in (x, y) pixel coords; out-of-bounds clamped to border.
    """
    H, W = img.shape
    x = jnp.clip(pts[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(pts[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
