"""Pallas TPU kernels for hot image ops, with XLA fallbacks.

Dispatch policy: each op has a pure-XLA reference implementation in
``frontend/``; the Pallas version is selected via ``TpuConfig.use_pallas``
(and automatically falls back off-TPU or in interpret-mode tests).
"""

from rvio_tpu.ops.tile_gather import (gather_tiles_pallas,
                                      gather_tiles_narrow_pallas)

__all__ = ["gather_tiles_pallas", "gather_tiles_narrow_pallas"]
