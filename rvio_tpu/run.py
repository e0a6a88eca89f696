"""Command-line sequence runner — the offline equivalent of the ROS node.

Replaces rvio_mono + roslaunch (reference: src/rvio_mono.cc,
launch/euroc.launch): reads a config (native or the reference's OpenCV-YAML
format verbatim), replays a EuRoC directory or a synthetic sequence through
the full pipeline, and writes the TUM trajectory + per-frame timing files
(same outputs as INI.RecordOutputs, System.cc:371-379).

Usage:
  python -m rvio_tpu.run --synthetic 30 --output out/            # simulator
  python -m rvio_tpu.run --euroc /data/V1_01_easy --output out/  # dataset
  python -m rvio_tpu.run --euroc /data/MH_01 --skip 40 --config rvio_euroc.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="rvio_tpu sequence runner")
    ap.add_argument("--config", default=None,
                    help="YAML config (native or reference cv-format)")
    ap.add_argument("--euroc", default=None,
                    help="EuRoC sequence dir (contains mav0/)")
    ap.add_argument("--rosbag", default=None,
                    help="rosbag v2.0 file (no ROS needed)")
    ap.add_argument("--info", default=None, metavar="BAG",
                    help="print a bag's topic inventory and exit "
                         "(like `rosbag info`)")
    ap.add_argument("--image-topic", default="/cam0/image_raw",
                    help="rosbag image topic (reference remaps this to "
                         "/camera/image_raw)")
    ap.add_argument("--imu-topic", default="/imu0",
                    help="rosbag IMU topic (reference remaps this to /imu)")
    ap.add_argument("--set", nargs="+", default=None, metavar="SEQ",
                    help="batch-replay several sequences (EuRoC dirs and/or "
                         ".bag files) in lockstep on one chip")
    ap.add_argument("--synthetic", type=float, default=None, metavar="SECONDS",
                    help="run the simulator for SECONDS instead of a dataset")
    ap.add_argument("--sweep", type=int, default=None, metavar="N",
                    help="run an N-seed synthetic accuracy/throughput sweep")
    ap.add_argument("--skip", type=float, default=0.0,
                    help="seconds of data to skip (MH_* needs ~40)")
    ap.add_argument("--output", default="out",
                    help="output directory for trajectory/timing files")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"],
                    help="force a JAX platform")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", action="store_true",
                    help="synthetic: enable IMU+measurement noise")
    ap.add_argument("--per-frame", action="store_true",
                    help="dataset replay: one dispatch per frame (live-"
                         "latency shape) instead of the chunked scan")
    ap.add_argument("--save-checkpoint", default=None, metavar="NPZ",
                    help="dataset replay: save the full session (filter + "
                         "tracker + RNG + frame cursor) after the run")
    ap.add_argument("--resume", default=None, metavar="NPZ",
                    help="dataset replay: resume a prior run from its "
                         "checkpoint (same sequence); continues the exact "
                         "trajectory")
    args = ap.parse_args(argv)

    if args.info:
        from rvio_tpu.dataio.rosbag import bag_info
        info = bag_info(args.info)
        for t in sorted(info.topics):
            print(f"{t:32s} {info.topics[t]:24s} "
                  f"{info.message_counts[t]} msgs")
        if info.start is not None:
            print(f"duration: {info.end - info.start:.2f} s")
        return 0

    import jax
    if args.platform:
        plat = "axon" if args.platform == "tpu" else args.platform
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rvio_tpu.config import RVIOConfig, load_config
    from rvio_tpu.dataio.tum import write_tum
    from rvio_tpu.runtime.driver import SequenceDriver, batches_from_sim

    cfg = load_config(args.config) if args.config else RVIOConfig()
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    os.makedirs(args.output, exist_ok=True)

    if args.sweep is not None:
        from rvio_tpu.eval.sweep import run_synthetic_sweep, format_table
        rows = run_synthetic_sweep(cfg, seeds=range(args.sweep),
                                   dtype=dtype, noise=args.noise,
                                   progress=True)
        print(format_table(rows))
        return 0

    def load_any(path):
        if path.endswith(".bag"):
            from rvio_tpu.dataio.rosbag import load_rosbag
            return load_rosbag(path, image_topic=args.image_topic,
                               imu_topic=args.imu_topic, skip_s=args.skip)
        from rvio_tpu.dataio.euroc import load_euroc
        return load_euroc(path, skip_s=args.skip)

    if args.set:
        from rvio_tpu.eval.ate import ate_rmse
        from rvio_tpu.runtime.replay_set import run_sequence_set
        seqs = [load_any(p) for p in args.set]
        t0 = time.perf_counter()
        results = run_sequence_set(cfg, seqs, dtype=dtype, progress=True)
        wall = time.perf_counter() - t0
        total = sum(len(r.timestamps) for r in results)
        print(f"{total} frames / {len(seqs)} sequences in {wall:.1f} s "
              f"({total / wall:.1f} fps aggregate)")
        from rvio_tpu.eval.ate import match_nearest
        used_names = {}
        for path, seq, res in zip(args.set, seqs, results):
            name = os.path.basename(os.path.normpath(path)).replace(".bag", "")
            # two inputs with the same basename must not overwrite each other
            n = used_names.get(name, 0)
            used_names[name] = n + 1
            if n:
                name = f"{name}.{n}"
            line = f"{name:24s} {len(res.timestamps)} frames"
            if seq.gt_p is not None:
                gi, ok = match_nearest(seq.gt_t, res.timestamps)
                if ok.sum() >= 3:
                    line += (f"  ATE {ate_rmse(res.positions[ok], seq.gt_p[gi][ok]) * 100:.2f} cm"
                             f" ({int(ok.sum())} matched)")
                else:
                    line += "  ATE n/a (no gt within tolerance)"
            print(line)
            d = os.path.join(args.output, name)
            os.makedirs(d, exist_ok=True)
            write_tum(os.path.join(d, "stamped_pose_ests.dat"),
                      res.timestamps, res.positions, res.quaternions)
        return 0

    gt_aligned = None
    if args.synthetic is not None:
        from rvio_tpu.dataio.synthetic import simulate_sequence
        sim = simulate_sequence(cfg, duration=args.synthetic, seed=args.seed,
                                meas_noise=0.001 if args.noise else 0.0,
                                imu_noise=args.noise)
        driver = SequenceDriver(cfg, dtype=dtype)
        t0 = time.perf_counter()
        res = driver.run(sim.imu_t, sim.imu_w, sim.imu_a, sim.frame_t,
                         batches_from_sim(sim), progress=True,
                         collect_landmarks=True)
        wall = time.perf_counter() - t0
        from rvio_tpu.eval.ate import ate_rmse
        idx = np.searchsorted(sim.frame_t, res.timestamps)
        gt_aligned = sim.gt_p[idx]
        ate = ate_rmse(res.positions, gt_aligned)
        print(f"ATE RMSE: {ate * 100:.2f} cm over {len(res.timestamps)} frames "
              f"({len(res.timestamps) / wall:.1f} fps)")
    elif args.euroc or args.rosbag:
        from rvio_tpu.runtime.image_driver import (run_euroc_sequence,
                                                   run_euroc_sequence_scan)
        if args.rosbag:
            from rvio_tpu.dataio.rosbag import load_rosbag
            seq = load_rosbag(args.rosbag, image_topic=args.image_topic,
                              imu_topic=args.imu_topic, skip_s=args.skip)
            if seq.imu_drops or seq.image_drops:
                print(f"drops: {seq.imu_drops} imu, {seq.image_drops} image")
        else:
            from rvio_tpu.dataio.euroc import load_euroc
            seq = load_euroc(args.euroc, skip_s=args.skip)
        if args.per_frame:
            if args.save_checkpoint or args.resume:
                ap.error("--save-checkpoint/--resume need the chunked scan "
                         "(drop --per-frame)")
            res = run_euroc_sequence(cfg, seq, dtype=dtype, progress=True)
        else:
            res = run_euroc_sequence_scan(
                cfg, seq, dtype=dtype, progress=True, timing_split=True,
                checkpoint_path=args.save_checkpoint,
                resume_from=args.resume)
        if seq.gt_p is not None:
            from rvio_tpu.eval.ate import ate_rmse
            gi = np.searchsorted(seq.gt_t, res.timestamps)
            gi = np.clip(gi, 0, len(seq.gt_t) - 1)
            gt_aligned = seq.gt_p[gi]
            ate = ate_rmse(res.positions, gt_aligned)
            print(f"ATE RMSE: {ate * 100:.2f} cm")
    else:
        ap.error("need --euroc, --rosbag, or --synthetic")

    # Reference-parity outputs (System.cc:371-379)
    write_tum(os.path.join(args.output, "stamped_pose_ests.dat"),
              res.timestamps, res.positions, res.quaternions)
    with open(os.path.join(args.output, "time_cost.dat"), "w") as f:
        for i, (fe, be) in enumerate(zip(res.frontend_ms, res.backend_ms)):
            f.write(f"{i + 1} {fe:.6f} {be:.6f}\n")
    # Headless rviz equivalent: trajectory (+GT, +landmark map) SVG.
    from rvio_tpu.utils.visualize import plot_trajectory_svg
    lms = getattr(res, "landmarks", None)
    plot_trajectory_svg(os.path.join(args.output, "trajectory.svg"),
                        res.positions, gt_p=gt_aligned, landmarks=lms,
                        landmark_scale=cfg.landmark.scale)
    if lms is not None:
        np.savetxt(os.path.join(args.output, "landmarks.xyz"), lms,
                   fmt="%.6f")
    print(f"wrote {args.output}/stamped_pose_ests.dat, time_cost.dat, "
          "trajectory.svg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
