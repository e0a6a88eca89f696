"""Fused Pallas kernel: Shi-Tomasi min-eigenvalue response in one pass.

The XLA path (frontend/detector.py shi_tomasi_response) is a ~15-stage
chain of full-image elementwise ops (Sobel shift-adds, three gradient
products, three box sums, the eigenvalue formula) — each stage is a
full-frame HBM round trip unless XLA fuses the whole chain, and in-scan
ablation puts the refill-detection stage at ~0.18 ms/frame on v5e.  This
kernel computes the entire response with the image VMEM-resident: one
HBM read of the padded frame, one write of the response (~3 GB/s-equiv
of traffic, tens of microseconds at bandwidth).

Layout: the host reflect-pads the image by 2 (the Sobel+box support) and
lane-pads the width; the kernel runs a row-chunk grid, each step slicing
its (R+4)-row window from the VMEM-resident frame.  Column-centered taps
are lane shifts of full-width arrays (zeros entering at the lane edges
corrupt only the 2-column pad ring, which the host strips).

Border semantics: the public entry (frontend.detector.shi_tomasi_response)
zeroes a 2-px border in BOTH the XLA and Pallas paths — OpenCV's
goodFeaturesToTrack ignores a border margin anyway and grid selection
suppresses >= 4 px (detector.grid_top_corners) — which makes the two
paths bitwise-comparable without replicating the XLA path's
double-reflect border arithmetic in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 64  # output rows per grid step


def _scol(a, k):
    """Lane shift: out[:, j] = a[:, j + k] (cyclic).

    Implemented as a lane roll — Mosaic cannot lower a slice+concat lane
    shift ("offset mismatch on non-concat dimension").  The wrapped-around
    values contaminate only columns {0, 1, Wp-2, Wp-1} through the whole
    stencil chain; the public entry reads columns [4, W) with W <= Wp-4,
    so the contamination ring never reaches the output.
    """
    if k == 0:
        return a
    return pltpu.roll(a, (a.shape[1] - k) % a.shape[1], 1)


def _shi_kernel(x_ref, out_ref):
    """One (R, W) output chunk from the (Hp+4, W) VMEM-resident frame."""
    i = pl.program_id(0)
    T = x_ref[pl.ds(i * _R, _R + 4), :]          # rows needed incl. halo

    # Sobel /8 (separable [1,2,1]/8 smooth x central diff), evaluated on
    # the (R+2)-row band the box sum needs.
    c1 = jnp.asarray(1.0 / 8.0, T.dtype)
    c2 = jnp.asarray(2.0 / 8.0, T.dtype)
    sy = c1 * T[0:_R + 2] + c2 * T[1:_R + 3] + c1 * T[2:_R + 4]
    ix = _scol(sy, 1) - _scol(sy, -1)            # d/dx of y-smoothed
    dy = T[2:_R + 4] - T[0:_R + 2]               # central diff rows
    iy = c1 * _scol(dy, 1) + c2 * dy + c1 * _scol(dy, -1)

    # Gradient products + 3x3 unnormalized box sums (separable).
    def box(a):
        r = a[0:_R] + a[1:_R + 1] + a[2:_R + 2]
        return _scol(r, 1) + r + _scol(r, -1)

    sxx = box(ix * ix)
    sxy = box(ix * iy)
    syy = box(iy * iy)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    out_ref[...] = (tr - disc) * 0.5


@functools.partial(jax.jit, static_argnames=("interpret",))
def shi_tomasi_pallas(img: jnp.ndarray, interpret: bool = False
                      ) -> jnp.ndarray:
    """Min-eigenvalue response of a (H, W) f32 image, 2-px border zeroed."""
    H, W = img.shape
    Hp = -(-H // _R) * _R
    Wp = -(-(W + 4) // 128) * 128
    x = jnp.pad(img, ((2, 2 + Hp - H), (2, 2)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, Wp - (W + 4))))

    out = pl.pallas_call(
        _shi_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        grid=(Hp // _R,),
        in_specs=[pl.BlockSpec((Hp + 4, Wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    # out col j = response at image col j-2  =>  image cols [2, W-2) are
    # the interior (support fully inside the frame) at out cols [4, W)
    resp = out[:H, 4:W]
    resp = jnp.pad(resp, ((0, 0), (2, 2)))       # zero 2-px column border
    row = jnp.arange(H)[:, None]
    return jnp.where((row >= 2) & (row < H - 2), resp, 0.0)


def _shi_nms_kernel(x_ref, out_ref):
    """One (R, W) chunk of the 3x3-local-max-masked response.

    Computes the response on an (R+2)-row band (one halo row each side)
    and applies the 8-neighbor >=-comparison in-kernel, so the detector's
    separate full-map NMS pass (8 padded full-image compares, ~10 us of
    HBM traffic per frame) disappears.  Non-maxima emit -inf.
    """
    i = pl.program_id(0)
    T = x_ref[pl.ds(i * _R, _R + 6), :]

    c1 = jnp.asarray(1.0 / 8.0, T.dtype)
    c2 = jnp.asarray(2.0 / 8.0, T.dtype)
    sy = c1 * T[0:_R + 4] + c2 * T[1:_R + 5] + c1 * T[2:_R + 6]
    ix = _scol(sy, 1) - _scol(sy, -1)
    dy = T[2:_R + 6] - T[0:_R + 4]
    iy = c1 * _scol(dy, 1) + c2 * dy + c1 * _scol(dy, -1)

    def box(a):
        r = a[0:_R + 2] + a[1:_R + 3] + a[2:_R + 4]
        return _scol(r, 1) + r + _scol(r, -1)

    sxx = box(ix * ix)
    sxy = box(ix * iy)
    syy = box(iy * iy)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    band = (tr - disc) * 0.5                     # (R+2, W) resp rows -1..R

    m = band[1:_R + 1]
    up = band[0:_R]
    dn = band[2:_R + 2]
    keep = ((m >= _scol(m, 1)) & (m >= _scol(m, -1))
            & (m >= up) & (m >= _scol(up, 1)) & (m >= _scol(up, -1))
            & (m >= dn) & (m >= _scol(dn, 1)) & (m >= _scol(dn, -1)))
    out_ref[...] = jnp.where(keep, m, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def shi_tomasi_nms_pallas(img: jnp.ndarray, interpret: bool = False
                          ) -> jnp.ndarray:
    """NMS-masked min-eigenvalue response: response fused with the 3x3
    local-maximum test; non-maxima and the 3-px border are -inf.

    Interior parity contract: matches the XLA path (response + 8-neighbor
    >= comparison on the border-zeroed map) bitwise on rows/cols
    [4, H-4) x [4, W-4) — exactly the region grid_top_corners' border=4
    suppression keeps (pixels nearer the border see the border-zeroing
    difference and are masked by both paths).
    """
    H, W = img.shape
    Hp = -(-H // _R) * _R
    Wp = -(-(W + 4) // 128) * 128
    x = jnp.pad(img, ((3, 3 + Hp - H), (2, 2)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, Wp - (W + 4))))

    out = pl.pallas_call(
        _shi_nms_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        grid=(Hp // _R,),
        in_specs=[pl.BlockSpec((Hp + 6, Wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_R, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    resp = out[:H, 4:W]
    resp = jnp.pad(resp, ((0, 0), (2, 2)), constant_values=-jnp.inf)
    row = jnp.arange(H)[:, None]
    return jnp.where((row >= 2) & (row < H - 2), resp, -jnp.inf)
