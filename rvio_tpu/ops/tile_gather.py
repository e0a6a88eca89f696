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
    tile = out_ref.shape[1]

    def dma(i, slot):
        oy = orig_ref[i, 1]
        ox = orig_ref[i, 0]
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(oy, tile), pl.ds(ox, tile)],
            out_ref.at[i],
            sems.at[slot],
        )

    # double-buffered: start i+1 before waiting on i
    dma(0, 0).start()

    def body(i, _):
        @pl.when(i + 1 < n)
        def _():
            dma(i + 1, (i + 1) % 2).start()

        dma(i, i % 2).wait()
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_tiles_pallas(img: jnp.ndarray, origin: jnp.ndarray,
                        tile: int = 32, interpret: bool = False
                        ) -> jnp.ndarray:
    """(H, W) image + (N, 2) integer (x, y) origins -> (N, tile, tile).

    Origins are clamped to keep every tile in-bounds, matching the XLA
    fallback's semantics.
    """
    H, W = img.shape
    N = origin.shape[0]
    oc = jnp.stack([jnp.clip(origin[:, 0], 0, max(W - tile, 0)),
                    jnp.clip(origin[:, 1], 0, max(H - tile, 0))], axis=1)
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N, tile, tile), img.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
        ),
        interpret=interpret,
    )(oc.astype(jnp.int32), img)
