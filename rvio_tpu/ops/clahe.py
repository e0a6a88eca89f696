"""Pallas TPU kernels for CLAHE (contrast-limited adaptive hist-eq).

The tracker preprocess runs cv::createCLAHE(3.0, Size(5,5)) semantics on
every frame (reference: src/rvio/Tracker.cc:183-202).  The XLA
implementation (frontend/image.clahe) evaluates both halves — per-tile
histograms and the per-pixel LUT application — as one-hot matmuls, which
is MXU-friendly but materializes two (n_pixels, 256) bf16 one-hot tensors
in HBM (~93 MB each at 752x480): the stage is pure HBM bandwidth, ~0.44 ms
of the 2.5 ms/frame pipeline.

These kernels build the one-hots in VMEM and feed the MXU directly, so HBM
traffic drops to reading the image twice + writing it once (~4 MB).  The
image is walked in 8-row chunks; each row's one-hot lives as a
(n_bins, Wpx) VMEM tile — bins on sublanes, pixels on lanes — so every
contraction is a plain matmul with no in-kernel transposes:

  hist kernel   oh = (pix == iota_256); per-tile-column histograms via
                oh @ C (column->tile-column selector) on the MXU,
                accumulated into a per-tile-row output block.
  apply kernel  vals = luts @ oh (25 tile LUTs at once), then the bilinear
                tile-weight combine as (1, 25) @ (25, Wpx) row matmuls.

Numerics match the XLA path (bf16 one-hot/LUT operands, f32 accumulation).
Requires tile height th % 8 == 0 and n_bins == 256; callers fall back to
the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 8  # image rows per grid step (sublane-friendly chunk)


def _onehot_lanes(row, n_bins):
    """(1, W) float pixel row -> (n_bins, W) bf16 one-hot (trunc bins)."""
    v = jnp.floor(jnp.clip(row, 0.0, n_bins - 1))
    u = jax.lax.broadcasted_iota(jnp.int32, (n_bins, row.shape[1]), 0)
    return (v == u.astype(row.dtype)).astype(jnp.bfloat16)


def _hist_kernel(x_ref, c_ref, out_ref, *, n_bins, per_trow, g):
    i = pl.program_id(0)
    csel = c_ref[...]                       # (Wpx, g) bf16 col->tile-col
    total = jnp.zeros((n_bins, g), jnp.float32)
    for r in range(_R):
        oh = _onehot_lanes(x_ref[r:r + 1, :], n_bins)       # (n_bins, Wpx)
        # explicit precision: the session-wide "highest" default is invalid
        # for Mosaic bf16 matmuls (and the XLA path uses DEFAULT here too)
        total = total + jnp.dot(oh, csel,
                                precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)

    @pl.when(i % per_trow == 0)
    def _init():
        out_ref[0] = total

    @pl.when(i % per_trow != 0)
    def _acc():
        out_ref[0] = out_ref[0] + total


def _apply_kernel(x_ref, lut_ref, wy_ref, wx_ref, out_ref, *, n_bins):
    luts = lut_ref[...]                     # (g*g, n_bins) bf16
    wx_t = wx_ref[...]                      # (g*g, Wpx) f32
    for r in range(_R):
        oh = _onehot_lanes(x_ref[r:r + 1, :], n_bins)       # (n_bins, Wpx)
        vals = jnp.dot(luts, oh,
                       precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32)  # (g*g, Wpx)
        out_ref[r:r + 1, :] = jnp.dot(wy_ref[r:r + 1, :], vals * wx_t,
                                      precision=jax.lax.Precision.HIGHEST,
                                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("g", "per_trow", "n_bins", "interpret"))
def _hist_call(x, csel, g, per_trow, n_bins, interpret=False):
    Hp, Wpx = x.shape
    # out[tr, u, q] = histogram of tile (tr, q); transposed/reshaped by the
    # caller.  Last-2 block dims (n_bins, g) equal the array dims, so the
    # odd g=5 lane size is legal.
    return pl.pallas_call(
        functools.partial(_hist_kernel, n_bins=n_bins, per_trow=per_trow,
                          g=g),
        grid=(Hp // _R,),
        in_specs=[
            pl.BlockSpec((_R, Wpx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_bins, g),
                               lambda i: (i // per_trow, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n_bins, g), jnp.float32),
        interpret=interpret,
    )(x, csel)


@functools.partial(jax.jit, static_argnames=("n_bins", "interpret"))
def _apply_call(x, luts_b, wy_rep, wx_t, n_bins, interpret=False):
    Hp, Wpx = x.shape
    gg = luts_b.shape[0]
    return pl.pallas_call(
        functools.partial(_apply_kernel, n_bins=n_bins),
        grid=(Hp // _R,),
        in_specs=[
            pl.BlockSpec((_R, Wpx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, gg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_R, Wpx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wpx), x.dtype),
        interpret=interpret,
    )(x, luts_b, wy_rep, wx_t)


def clahe_supported(H: int, W: int, grid: int, n_bins: int) -> bool:
    th = -(-H // grid)
    return n_bins == 256 and th % _R == 0 and th * grid >= _R


def clahe_pallas(img: jnp.ndarray, clip_limit: float, grid: int,
                 n_bins: int = 256, interpret: bool = False) -> jnp.ndarray:
    """CLAHE with VMEM-resident one-hots; matches frontend.image.clahe."""
    H, W = img.shape
    g = grid
    th, tw = -(-H // g), -(-W // g)
    Hp, Wp = th * g, tw * g
    if not clahe_supported(H, W, g, n_bins):
        raise ValueError(f"clahe_pallas: unsupported shape {img.shape}")
    Wpx = -(-Wp // 128) * 128
    dt = img.dtype

    x = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, Wpx - Wp)))     # (Hp, Wpx)

    # column -> tile-column selector, zero for lane-pad columns (so they
    # never enter a histogram)
    wcol = jnp.arange(Wpx)
    csel = (jax.nn.one_hot(jnp.clip(wcol // tw, 0, g - 1), g,
                           dtype=jnp.float32)
            * (wcol < Wp)[:, None]).astype(jnp.bfloat16)

    hist3 = _hist_call(x, csel, g, th // _R, n_bins,
                       interpret=interpret)     # (g, n_bins, g)
    hist = jnp.transpose(hist3, (0, 2, 1)).reshape(g * g, n_bins).astype(dt)

    # clip + redistribute + CDF (same math as the XLA path)
    tile_area = th * tw
    limit = jnp.maximum(clip_limit * tile_area / n_bins, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=1, keepdims=True)
    clipped = clipped + excess / n_bins
    luts = jnp.cumsum(clipped, axis=1) * ((n_bins - 1.0) / tile_area)

    # bilinear tile weights, flattened to the (p*g + q) LUT ordering
    yy = jnp.arange(Hp, dtype=dt)
    xx = jnp.arange(Wpx, dtype=dt)
    ty = (yy - (th - 1) / 2.0) / th
    tx = (xx - (tw - 1) / 2.0) / tw
    ty0 = jnp.clip(jnp.floor(ty), 0, g - 1).astype(jnp.int32)
    tx0 = jnp.clip(jnp.floor(tx), 0, g - 1).astype(jnp.int32)
    ty1 = jnp.clip(ty0 + 1, 0, g - 1)
    tx1 = jnp.clip(tx0 + 1, 0, g - 1)
    fy = jnp.clip(ty - ty0.astype(dt), 0.0, 1.0)
    fx = jnp.clip(tx - tx0.astype(dt), 0.0, 1.0)
    WY = (jax.nn.one_hot(ty0, g, dtype=dt) * (1 - fy)[:, None]
          + jax.nn.one_hot(ty1, g, dtype=dt) * fy[:, None])    # (Hp, g)
    WX = (jax.nn.one_hot(tx0, g, dtype=dt) * (1 - fx)[:, None]
          + jax.nn.one_hot(tx1, g, dtype=dt) * fx[:, None])    # (Wpx, g)
    wy_rep = jnp.repeat(WY, g, axis=1).astype(jnp.float32)     # (Hp, g*g)
    wx_t = jnp.tile(WX, (1, g)).T.astype(jnp.float32)          # (g*g, Wpx)

    out = _apply_call(x, luts.astype(jnp.bfloat16), wy_rep, wx_t,
                      n_bins, interpret=interpret)
    return out[:H, :W].astype(dt)
