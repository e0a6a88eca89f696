"""Multi-host launch helpers.

The reference has no distributed story at all (SURVEY.md §2.3).  Here,
multi-host scaling is standard JAX SPMD: every host runs the same program,
``jax.distributed.initialize`` wires the hosts into one global device mesh,
and the (seg × feat) mesh from ``parallel.mesh`` spans it — segments map to
whole hosts (no mid-run communication, so DCN latency is irrelevant) and
feature-axis sharding stays inside each host's ICI domain.

Typical multi-host entry point:

    from rvio_tpu.parallel.launch import initialize_distributed, host_segment_slice
    initialize_distributed()                       # env-driven (TPU pods)
    mesh = make_mesh(seg=jax.process_count(), feat=jax.local_device_count())
    lo, hi = host_segment_slice(num_segments)      # this host's segments
"""

from __future__ import annotations

from typing import Optional, Tuple


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize JAX's multi-host runtime (no-op if single-process).

    On TPU pods all arguments are discovered from the environment; pass
    them explicitly for manual (e.g. GPU/CPU) bring-up.
    """
    import jax

    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        # already initialized or single-process environment
        pass


def host_segment_slice(num_segments: int) -> Tuple[int, int]:
    """Contiguous [lo, hi) segment range owned by this host."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = -(-num_segments // n)
    lo = min(i * per, num_segments)
    hi = min(lo + per, num_segments)
    return lo, hi
