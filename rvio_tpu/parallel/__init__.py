"""Scaling layer: device meshes, segment data-parallelism, feature sharding."""

from rvio_tpu.parallel.mesh import make_mesh
from rvio_tpu.parallel.segment import (make_parallel_step, shard_bundles,
                                       shard_states, replicate_scalars)
from rvio_tpu.parallel.stitch import stitch_segments
from rvio_tpu.parallel.launch import initialize_distributed, host_segment_slice

__all__ = ["make_mesh", "make_parallel_step", "shard_bundles", "shard_states",
           "replicate_scalars", "stitch_segments", "initialize_distributed",
           "host_segment_slice"]
