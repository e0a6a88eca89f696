"""Prove (or refute) that XLA partitions the update over the feat axis.

VERDICT r1 item 4: the feature axis of the update batch carries a 'feat'
PartitionSpec, but nothing confirmed the compiled program actually
distributes the per-feature work (LM triangulation, Jacobians, gating)
rather than replicating it.  This script compiles the sharded step at
flagship shapes on a virtual CPU mesh, counts collectives in the optimized
HLO, and times feat=1 vs feat=2 at the 800-feature stress shape.

Run: python scripts/inspect_feat_sharding.py   (CPU, 8 virtual devices)
"""

import os
import re
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax.numpy as jnp
import numpy as np

from rvio_tpu.config import RVIOConfig
from rvio_tpu.parallel import make_mesh
from rvio_tpu.parallel.segment import (make_parallel_step, shard_bundles,
                                       shard_states, stack_states)
from __graft_entry__ import _example_inputs


COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def compiled_text(pstep, states, bundles):
    lowered = pstep.lower(states, bundles)
    return lowered.compile().as_text()


def count_collectives(txt):
    return {c: len(re.findall(rf"\b{c}\b", txt)) for c in COLLECTIVES
            if re.search(rf"\b{c}\b", txt)}


def build(cfg, mesh, S):
    st, bundle = _example_inputs(cfg, jnp.float32)
    states = stack_states([st] * S)
    bundles = jax.tree.map(lambda x: jnp.stack([x] * S, axis=0), bundle)
    return (shard_states(states, mesh),
            shard_bundles(bundles, mesh, time_axis=False))


def timed(pstep, states, bundles, iters=20):
    out = pstep(jax.tree.map(jnp.copy, states), bundles)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        st, o = pstep(jax.tree.map(jnp.copy, states), bundles)
        jax.block_until_ready(o["p_Gk"])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n_feat = int(os.environ.get("FEATS", "800"))
    cfg = RVIOConfig()
    cfg = cfg.replace(tracker=dataclasses.replace(cfg.tracker,
                                                  num_features=n_feat))
    print(f"flagship shapes: F={cfg.tracker.max_update_features}, "
          f"L={cfg.tracker.max_tracking_length}, M={cfg.window_size}, "
          f"D={cfg.err_dim}, compression={cfg.tpu.compression}")

    results = {}
    for feat in (1, 2, 4):
        seg = 8 // feat
        mesh = make_mesh(8, seg=seg, feat=feat)
        pstep = make_parallel_step(cfg, mesh)
        states, bundles = build(cfg, mesh, seg)
        txt = compiled_text(pstep, states, bundles)
        cols = count_collectives(txt)
        ms = timed(pstep, states, bundles)
        # per-segment cost: seg axis is embarrassingly parallel, so compare
        # the time to advance ONE segment one frame at each feat width
        results[feat] = (ms, seg, cols)
        print(f"feat={feat} seg={seg}: {ms:.2f} ms/step for {seg} segments "
              f"({ms:.2f} ms/segment-frame), collectives={cols}")

    # Interpretation on an OVERSUBSCRIBED host (8 virtual devices on a few
    # cores): wall-clock ~ total work / cores, so latency gains from
    # partitioning are invisible — what IS visible is whether the work was
    # partitioned or replicated.  If feat>1 replicated the update, a step
    # would cost the same as feat=1 regardless of segment count; if it
    # partitions, step cost scales with the number of segments.  The
    # per-segment work ratio below is therefore the partition OVERHEAD
    # (1.0 = perfect partitioning, 2.0 = full replication at feat=2).
    ms1, seg1, _ = results[1]
    for feat in (2, 4):
        ms, seg, _ = results[feat]
        ratio = (ms / seg) / (ms1 / seg1)
        print(f"feat={feat}: work per segment-frame = {ratio:.2f}x feat=1 "
              f"(1.0 = perfectly partitioned, {feat}.0 = replicated)")


if __name__ == "__main__":
    main()
