"""Scaling layer: device meshes, segment data-parallelism, feature sharding."""

from rvio_tpu.parallel.mesh import make_mesh
from rvio_tpu.parallel.segment import (make_parallel_step, shard_bundles,
                                       shard_states, replicate_scalars)
from rvio_tpu.parallel.stitch import (fit_yaw_transform, prefix_product,
                                      stitch_segments)
from rvio_tpu.parallel.handoff import (bootstrap_velocity_gravity,
                                       run_segments_warm, warm_initialize)
from rvio_tpu.parallel.launch import initialize_distributed, host_segment_slice

__all__ = ["make_mesh", "make_parallel_step", "shard_bundles", "shard_states",
           "replicate_scalars", "stitch_segments", "fit_yaw_transform",
           "prefix_product", "bootstrap_velocity_gravity",
           "run_segments_warm", "warm_initialize", "initialize_distributed",
           "host_segment_slice"]
