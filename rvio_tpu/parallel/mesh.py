"""Device mesh construction for the two parallel axes.

The reference is single-threaded C++ with no distributed backend at all
(SURVEY.md section 2.3) — everything here is new, TPU-native design:

- ``seg``  axis: data parallelism over independent sequence segments
  (bag segments / batched sequences), one filter instance per shard.
  Collectives: none during filtering; stitching happens at the end.
- ``feat`` axis: model-parallel sharding of the per-feature update work
  (triangulation, Jacobians, gating) with XLA-inserted reductions for the
  stacked-update compression — the Schur-style psum of H^T H contributions.

Within a slice the feat axis should map to ICI neighbors; seg can span
hosts (DCN) since segments never communicate mid-run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, seg: Optional[int] = None,
              feat: Optional[int] = None) -> Mesh:
    """Build a (seg, feat) mesh over the first ``n_devices`` devices.

    Defaults: all devices on the seg axis (segment parallelism needs no
    communication, so it wins whenever segments are plentiful).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if seg is None and feat is None:
        seg, feat = n, 1
    elif seg is None:
        seg = n // feat
    elif feat is None:
        feat = n // seg
    if seg * feat != n:
        raise ValueError(f"mesh {seg}x{feat} != {n} devices")
    arr = np.asarray(devs).reshape(seg, feat)
    return Mesh(arr, axis_names=("seg", "feat"))
