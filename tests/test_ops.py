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
