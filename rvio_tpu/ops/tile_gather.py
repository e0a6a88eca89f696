"""Pallas kernel: batched dynamic tile gather for the KLT tracker.

Gathers N (tile x tile) neighborhoods at arbitrary integer origins from an
image — the one access pattern in the front-end that XLA's generic TPU
gather handles poorly.  Vector loads on TPU need 8/128-aligned offsets, so
the kernel uses per-feature DMA copies instead (DMAs address byte-granular),
double-buffered so copy i+1 is in flight while copy i completes.

Used by frontend/klt.py when TpuConfig.use_pallas is on; the XLA
advanced-indexing fallback (`frontend.klt._gather_tiles`) computes the same
thing and is the test oracle (this kernel runs under interpret=True on CPU
in the test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(orig_ref, img_ref, out_ref, sems):
    n = out_ref.shape[0]
    th = out_ref.shape[1]
    tw = out_ref.shape[2]

    def dma(i, slot):
        # offsets must be provably aligned to the (8, 128) memref tiling;
        # callers pre-align and the multiple_of hints let Mosaic verify
        oy = pl.multiple_of((orig_ref[i, 1] // 8) * 8, 8)
        ox = pl.multiple_of((orig_ref[i, 0] // 128) * 128, 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(oy, th), pl.ds(ox, tw)],
            out_ref.at[i],
            sems.at[slot],
        )

    # destinations are disjoint (out_ref.at[i]), so pipeline depth is
    # limited only by the semaphore pool: keep _NSLOT-1 copies in flight
    ahead = _NSLOT - 1
    for j in range(min(ahead, n)):
        dma(j, j % _NSLOT).start()

    def body(i, _):
        @pl.when(i + ahead < n)
        def _():
            dma(i + ahead, (i + ahead) % _NSLOT).start()

        dma(i, i % _NSLOT).wait()
        return 0

    jax.lax.fori_loop(0, n, body, 0)


_NSLOT = 8  # narrow-gather DMA pipeline depth


def _gather_narrow_kernel(orig_ref, img_ref, out_ref, band, sems):
    """Wide-band DMA + in-VMEM lane roll -> narrow aligned tiles.

    Each feature: DMA a (th, 256) 128-aligned band into VMEM scratch, roll
    it left by the unaligned lane residual, and write the leading (th, tw)
    window out — arbitrary-offset tiles without violating the (8, 128)
    slice-alignment rules.  The DMA pipeline is _NSLOT deep (a 2-slot
    pipeline serializes on the per-feature roll+write: wait(i) can only
    overlap ONE in-flight copy; with 8 slots the DMA engine stays ~7
    copies ahead of the compute).
    """
    n = out_ref.shape[0]
    th = out_ref.shape[1]
    tw = out_ref.shape[2]

    def dma(i, slot):
        oy = pl.multiple_of((orig_ref[i, 1] // 8) * 8, 8)
        ox = pl.multiple_of((orig_ref[i, 0] // 128) * 128, 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(oy, th), pl.ds(ox, 256)],
            band.at[slot],
            sems.at[slot],
        )

    # keep at most _NSLOT-1 copies in flight: slot (i + _NSLOT-1) % _NSLOT
    # differs from the slot being read at iteration i, so a new copy never
    # lands in a band the current iteration is still consuming
    ahead = _NSLOT - 1
    for j in range(min(ahead, n)):
        dma(j, j % _NSLOT).start()

    def body(i, _):
        @pl.when(i + ahead < n)
        def _():
            dma(i + ahead, (i + ahead) % _NSLOT).start()

        slot = i % _NSLOT
        dma(i, slot).wait()
        shift = orig_ref[i, 0] % 128
        rolled = pltpu.roll(band[slot], -shift, 1)
        out_ref[i] = rolled[:, :tw]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def gather_tiles_pallas(img: jnp.ndarray, origin: jnp.ndarray,
                        th: int = 40, tw: int = 256,
                        interpret: bool = False) -> jnp.ndarray:
    """(H, W) image + (N, 2) integer (x, y) origins -> (N, th, tw).

    Offsets must satisfy the TPU (8, 128)-tiling: row origins are aligned
    down to 8, column origins down to 128; the caller must size ``tw`` so
    the window still fits and fold the alignment residuals into fractional
    sampling.  Requires W >= floor((x_max)/128)*128 + tw (pad the image).
    Tiles land in HBM (pure HBM->HBM DMA), so large tw is fine.
    """
    H, W = img.shape
    N = origin.shape[0]
    oc = jnp.stack([(jnp.clip(origin[:, 0], 0, max(W - tw, 0)) // 128) * 128,
                    (jnp.clip(origin[:, 1], 0, max(H - th, 0)) // 8) * 8],
                   axis=1)
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N, th, tw), img.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_NSLOT,))],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(oc.astype(jnp.int32), img)


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def gather_tiles_narrow_pallas(img: jnp.ndarray, origin: jnp.ndarray,
                               th: int = 40, tw: int = 32,
                               interpret: bool = False) -> jnp.ndarray:
    """Arbitrary-column-offset narrow tiles via wide DMA + in-VMEM lane roll.

    Row origins align down to 8 (caller folds the residual); column origins
    are exact.  Requires image W >= floor(x_max/128)*128 + 256 (pad first).
    """
    H, W = img.shape
    N = origin.shape[0]
    # x bound: the window (tw) must fit AND the 128-aligned 256-wide DMA
    # band must fit: floor(ox/128)*128 + 256 <= W  <=>  ox <= band_max.
    band_max = ((max(W - 256, 0)) // 128) * 128 + 127
    x_max = min(max(W - tw, 0), band_max)
    oc = jnp.stack([jnp.clip(origin[:, 0], 0, x_max),
                    (jnp.clip(origin[:, 1], 0, max(H - th, 0)) // 8) * 8],
                   axis=1)
    return pl.pallas_call(
        _gather_narrow_kernel,
        out_shape=jax.ShapeDtypeStruct((N, th, tw), img.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((_NSLOT, th, 256), img.dtype),
                            pltpu.SemaphoreType.DMA((_NSLOT,))],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(oc.astype(jnp.int32), img)
