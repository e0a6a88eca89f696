"""Real multi-process run of the segment-sharded sequence scan.

VERDICT r2 weak #1: the multi-host path was designed and virtual-mesh
tested but never executed with >1 real process.  This script launches TWO
OS processes wired together with ``jax.distributed.initialize`` (localhost
coordinator, CPU backend, 4 virtual devices per process = 8 global), runs
``make_parallel_sequence`` over the global (seg x feat) mesh, and checks
every process-owned segment against a local single-device reference scan.

Two mesh layouts are exercised:

- seg=8, feat=1 — pure data parallelism; no collectives cross processes
  (the production multi-host layout: segments never communicate mid-run);
- seg=4, feat=2 with the feat axis deliberately paired ACROSS processes —
  forces XLA's update reductions onto the inter-process (gRPC) transport,
  the CPU stand-in for cross-host DCN collectives.

Parent mode (no args) spawns the children, parses the pid-0 JSON line and
exits nonzero on any failure:

    python scripts/multiprocess_check.py

Measured numbers are recorded in BASELINE.md; tests/test_parallel.py runs
this end-to-end (slow marker).
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(pid: int, port: int, n_local: int = 4, single: bool = False) -> None:
    n_dev = 2 * n_local if single else n_local
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_enable_x64", True)
    if not single:
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=2, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from rvio_tpu.config import (RVIOConfig, ImuConfig, CameraConfig,
                                 TrackerConfig, TpuConfig)
    from rvio_tpu.parallel.segment import (make_parallel_sequence,
                                           _state_spec, _bundle_spec)
    from rvio_tpu.runtime.step import make_sequence_scan
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not single:
        assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * n_local

    cfg = RVIOConfig(imu=ImuConfig(rate_hz=100.0),
                     camera=CameraConfig(fps=10.0),
                     tracker=TrackerConfig(num_features=40,
                                           max_tracking_length=8),
                     tpu=TpuConfig(imu_block=16))
    dtype = jnp.float64

    # identical deterministic workload on both processes
    sys.path.insert(0, REPO)
    from bench import build_bundles
    from rvio_tpu.dataio.synthetic import simulate_sequence
    sim = simulate_sequence(cfg, duration=8.0, static_time=1.2, seed=11,
                            meas_noise=0.0015, imu_noise=True)
    state0, bundles, _ = build_bundles(cfg, sim, dtype)
    T = int(bundles.imu.w.shape[0])

    # local single-device reference (the parity oracle)
    ref_run = make_sequence_scan(cfg)
    _, ref_out = ref_run(jax.tree.map(jnp.copy, state0), bundles)
    ref_p = np.asarray(ref_out["p_Gk"])

    def global_put(tree, spec_tree, mesh, extra_lead=0):
        """Host np tree -> global sharded arrays (multi-process safe)."""
        def put(x, spec):
            sh = NamedSharding(mesh, spec)
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx: x[idx])
        return jax.tree.map(put, tree, spec_tree,
                            is_leaf=lambda x: isinstance(x, P))

    results = {}
    layouts = ({"seg8": (8, 1, False)} if single else
               {"seg8": (8, 1, False), "seg4_feat2_cross": (4, 2, True)})
    for label, (seg, feat, cross) in layouts.items():
        devs = np.asarray(jax.devices())
        if cross:
            # pair feat partners across the two processes: feat column 0
            # from process 0's devices, column 1 from process 1's
            arr = np.stack([devs[:seg], devs[n_local:n_local + seg]], axis=1)
        else:
            arr = devs[:seg * feat].reshape(seg, feat)
        mesh = Mesh(arr, axis_names=("seg", "feat"))

        S = seg
        states = jax.tree.map(lambda x: np.stack([np.asarray(x)] * S),
                              state0)
        bund = jax.tree.map(lambda x: np.stack([np.asarray(x)] * S), bundles)
        g_states = global_put(states, _state_spec(), mesh)
        g_bund = global_put(bund, _bundle_spec(True), mesh)

        prun = make_parallel_sequence(cfg, mesh)
        t0 = time.perf_counter()
        out_states, outs = prun(g_states, g_bund)
        jax.block_until_ready(outs)
        compile_s = time.perf_counter() - t0

        g_states = global_put(states, _state_spec(), mesh)
        g_bund = global_put(bund, _bundle_spec(True), mesh)
        t0 = time.perf_counter()
        out_states, outs = prun(g_states, g_bund)
        jax.block_until_ready(outs)
        wall = time.perf_counter() - t0

        # verify every segment shard this process can address
        p_global = outs["p_Gk"]  # (S, T, 3) global array
        checked = 0
        for shard in p_global.addressable_shards:
            seg_ids = range(*shard.index[0].indices(S))
            local = np.asarray(shard.data)
            for i, s in enumerate(seg_ids):
                np.testing.assert_allclose(local[i], ref_p, atol=1e-9,
                                           err_msg=f"{label} segment {s}")
                checked += 1
        results[label] = {"frames": T, "segments": S, "feat": feat,
                          "wall_s": round(wall, 3),
                          "compile_s": round(compile_s, 1),
                          "fps_aggregate": round(S * T / wall, 1),
                          "segments_checked_here": checked}

    if single:
        print("SINGLEPROC_RESULT " + json.dumps({
            "ok": True, "processes": 1, "local_devices": 2 * n_local,
            "runs": results}))
    elif pid == 0:
        print("MULTIPROC_RESULT " + json.dumps({
            "ok": True, "processes": 2, "local_devices": n_local,
            "runs": results}))


def parent() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--pid", str(i),
         "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO) for i in range(2)]
    outs = []
    rc = 0
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        outs.append(out)
        rc |= p.returncode if p.returncode is not None else 1
    tail = "\n".join(o.strip().splitlines()[-1] if o.strip() else "(empty)"
                     for o in outs)
    result = None
    for line in outs[0].splitlines():
        if line.startswith("MULTIPROC_RESULT "):
            result = line[len("MULTIPROC_RESULT "):]

    # same-shape SINGLE-process baseline (8 virtual devices in one
    # process): the 2-process / 1-process wall ratio on identical global
    # work is the honest scaling-efficiency proxy available without real
    # multi-host hardware (VERDICT r3 weak #6).  Caveat: on this
    # oversubscribed host both configs share the same physical cores, so
    # the ratio measures the distributed runtime + gRPC overhead, not
    # DCN/ICI bandwidth.
    single_result = None
    if rc == 0 and result:
        # only pay for the (up to 900 s) baseline when the multiprocess
        # run it normalizes actually succeeded
        sp = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            capture_output=True, text=True, cwd=REPO, timeout=900)
        for line in sp.stdout.splitlines():
            if line.startswith("SINGLEPROC_RESULT "):
                single_result = line[len("SINGLEPROC_RESULT "):]

    if rc == 0 and result:
        merged = json.loads(result)
        if single_result:
            single = json.loads(single_result)
            merged["single_process_baseline"] = single["runs"]
            w1 = single["runs"]["seg8"]["wall_s"]
            w2 = merged["runs"]["seg8"]["wall_s"]
            merged["scaling_efficiency_2proc_pct"] = round(100 * w1 / w2, 1)
            # per-frame cross-process all-reduce cost (feat layout):
            # seg4_feat2 does HALF the segment work of seg8, so at equal
            # efficiency its wall would be ~w2/2; the excess is the
            # per-step gRPC collective cost of the cross-process feat
            # sharding, amortized over the T frames of the scan
            T = merged["runs"]["seg8"]["frames"]
            wx = merged["runs"]["seg4_feat2_cross"]["wall_s"]
            merged["feat_allreduce_ms_per_frame"] = round(
                max(wx - w2 / 2, 0.0) / T * 1e3, 3)
        print(json.dumps(merged))
        return 0
    print(f"FAILED rc={rc}\n--- child tails ---\n{tail}", file=sys.stderr)
    for o in outs:
        print(o[-3000:], file=sys.stderr)
    return 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--single", action="store_true",
                    help="single-process same-shape baseline (8 devices)")
    a = ap.parse_args()
    if a.single:
        child(0, 0, single=True)
    elif a.pid is None:
        sys.exit(parent())
    else:
        child(a.pid, a.port)
