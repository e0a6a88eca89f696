"""Pallas TPU kernels for CLAHE (contrast-limited adaptive hist-eq).

The tracker preprocess runs cv::createCLAHE(3.0, Size(5,5)) semantics on
every frame (reference: src/rvio/Tracker.cc:183-202).  The XLA
implementation (frontend/image.clahe) evaluates both halves — per-tile
histograms and the per-pixel LUT application — as one-hot matmuls, which
is MXU-friendly but materializes two (n_pixels, 256) bf16 one-hot tensors
in HBM (~93 MB each at 752x480): the stage is pure HBM bandwidth.

These kernels keep everything VMEM-resident AND decompose the 256-bin
one-hots into 16x16 nibble (hi/lo) factors, so neither the VPU compare
work nor the MXU contraction ever touches a 256-wide one-hot:

  hist kernel   per row, ohi = (hi == iota16) and okey = (lo*g + tilecol
                == iota16g); the joint histogram H[hi, (lo, tilecol)] is
                ONE (16 x W).(16g x W)^T MXU contraction (lanes-contracted
                dot_general), accumulated per tile-row.  Counts are exact
                (0/1 bf16 operands, f32 accumulation).
  apply kernel  the per-pixel LUT read out = lut[tile(p), bin(p)] bilinear
                over 4 tiles is reordered as: blend LUTs over the
                tile-ROW per image row on the host (lr2[y, (bh, q), lo] =
                sum_p WY[y,p] lut[(p,q), (bh, lo)] — a tiny einsum), then
                in-kernel T1 = lr2_row(16g, 16) @ olo(16, W) selects the
                lo nibble on the MXU and the hi nibble + tile-column
                weights reduce on the VPU (sum over 16g sublanes).

vs the previous full-one-hot kernels this cuts the VPU one-hot build from
2x256 to ~3x16 compares/pixel and the apply matmul from K=256 to K=16
(measured 0.244 -> 0.100 ms at 752x480, TPU v5e — the previous kernel ran
at 93% of VPU peak, i.e. at speed-of-light *for the 256-wide
formulation*; the nibble factorization changes the op count, not the
efficiency).  Numerics match the XLA path to ~0.5 gray level (measured
max deviation 0.49 — both paths' LUT values round through bf16 and
summation orders differ; the regression test gates at 0.75 to absorb
run-to-run reduction-order variation, tests/test_ops.py).
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


def _nibbles(row):
    """(1, W) f32 pixel row -> truncated-bin hi/lo nibbles (exact f32)."""
    v = jnp.floor(jnp.clip(row, 0.0, 255.0))
    hi = jnp.floor(v * (1.0 / 16.0))
    return hi, v - 16.0 * hi


def _hist_kernel(x_ref, key_ref, out_ref, *, per_trow, g):
    i = pl.program_id(0)
    nk = 16 * g
    key = key_ref[...]                       # (1, Wpx): tilecol or -1e6 pad
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, key.shape[1]),
                                      0).astype(key.dtype)
    iotak = jax.lax.broadcasted_iota(jnp.int32, (nk, key.shape[1]),
                                     0).astype(key.dtype)
    total = jnp.zeros((16, nk), jnp.float32)
    for r in range(_R):
        hi, lo = _nibbles(x_ref[r:r + 1, :])
        ohi = (hi == iota16).astype(jnp.bfloat16)            # (16, Wpx)
        okey = (lo * float(g) + key == iotak).astype(jnp.bfloat16)
        # joint (hi, lo*g+q) counts: contract both operands on lanes.
        # explicit precision: the session-wide "highest" default is invalid
        # for Mosaic bf16 matmuls (and counts are exact in DEFAULT anyway)
        total = total + jax.lax.dot_general(
            ohi, okey, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    @pl.when(i % per_trow == 0)
    def _init():
        out_ref[0] = total

    @pl.when(i % per_trow != 0)
    def _acc():
        out_ref[0] = out_ref[0] + total


@functools.partial(jax.jit, static_argnames=("g", "per_trow", "interpret"))
def _hist_call(x, key, g, per_trow, interpret=False):
    Hp, Wpx = x.shape
    # out[tr, bh, bl*g + q] = joint histogram of tile (tr, q); unscrambled
    # to (tile, 256) by the caller.
    return pl.pallas_call(
        functools.partial(_hist_kernel, per_trow=per_trow, g=g),
        grid=(Hp // _R,),
        in_specs=[
            pl.BlockSpec((_R, Wpx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, 16 * g),
                               lambda i: (i // per_trow, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 16, 16 * g), jnp.float32),
        interpret=interpret,
    )(x, key)


def _apply_kernel(x_ref, lr2_ref, wx_ref, out_ref, *, g):
    wx = wx_ref[...]                         # (16g, Wpx) f32, row=(bh*g+q)
    W = wx.shape[1]
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, W), 0)
    bh_row = (jax.lax.broadcasted_iota(jnp.int32, (16 * g, W), 0)
              // g).astype(jnp.float32)
    for r in range(_R):
        hi, lo = _nibbles(x_ref[r:r + 1, :])
        olo = (lo == iota16.astype(lo.dtype)).astype(jnp.bfloat16)
        # T1[(bh, q), x] = row-blended LUT value at (tile (.,q), hi=bh,
        # lo=lo(x)): the lo selection is a K=16 matmul
        t1 = jnp.dot(lr2_ref[r], olo,
                     precision=jax.lax.Precision.DEFAULT,
                     preferred_element_type=jnp.float32)     # (16g, Wpx)
        # hi selection + tile-column bilinear weights on the VPU
        w = jnp.where(hi == bh_row, wx, 0.0)
        out_ref[r:r + 1, :] = jnp.sum(w * t1, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def _apply_call(x, lr2, wx, g, interpret=False):
    Hp, Wpx = x.shape
    return pl.pallas_call(
        functools.partial(_apply_kernel, g=g),
        grid=(Hp // _R,),
        in_specs=[
            pl.BlockSpec((_R, Wpx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, 16 * g, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_R, Wpx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wpx), x.dtype),
        interpret=interpret,
    )(x, lr2, wx)


def clahe_supported(H: int, W: int, grid: int, n_bins: int) -> bool:
    th = -(-H // grid)
    return n_bins == 256 and th % _R == 0 and th * grid >= _R


def clahe_pallas(img: jnp.ndarray, clip_limit: float, grid: int,
                 n_bins: int = 256, interpret: bool = False) -> jnp.ndarray:
    """CLAHE with VMEM-resident nibble-factored one-hots; matches
    frontend.image.clahe to < 0.5 gray level."""
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

    # tile-column index per image column; lane-pad columns get a sentinel
    # that can never reach the iota range, so they enter no histogram
    wcol = jnp.arange(Wpx)
    key = jnp.where(wcol < Wp, jnp.clip(wcol // tw, 0, g - 1),
                    -(10 ** 6)).astype(dt)[None, :]

    h3 = _hist_call(x, key, g, th // _R, interpret=interpret)
    # (tr, bh, bl*g + q) -> (tr, q, bh, bl) -> ((tr, q), 256)
    hist = jnp.transpose(h3.reshape(g, 16, 16, g),
                         (0, 3, 1, 2)).reshape(g * g, n_bins).astype(dt)

    # clip + redistribute + CDF (same math as the XLA path)
    tile_area = th * tw
    limit = jnp.maximum(clip_limit * tile_area / n_bins, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=1, keepdims=True)
    clipped = clipped + excess / n_bins
    luts = jnp.cumsum(clipped, axis=1) * ((n_bins - 1.0) / tile_area)
    # one bf16 rounding of the LUT values, mirroring the XLA path's bf16
    # LUT operand (the tile-row blend below then stays in f32)
    luts = luts.astype(jnp.bfloat16).astype(jnp.float32)

    # bilinear tile weights
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

    # per-row tile-row-blended LUTs, nibble-major:
    # lr2[y, bh*g + q, bl] = sum_p WY[y, p] * luts[(p, q), bh*16 + bl]
    luts4 = luts.reshape(g, g, 16, 16)                         # (p, q, bh, bl)
    lr2 = jnp.einsum("yp,pqhl->yhql", WY.astype(jnp.float32),
                     luts4, precision=jax.lax.Precision.HIGHEST)
    lr2 = lr2.reshape(Hp, 16 * g, 16).astype(jnp.bfloat16)

    # wx[(bh*g + q), x] = WX[x, q] (hi-row replicated tile-column weights)
    wx = jnp.tile(WX.T.astype(jnp.float32), (16, 1))           # (16g, Wpx)

    out = _apply_call(x, lr2, wx, g, interpret=interpret)
    return out[:H, :W].astype(dt)
