"""The per-frame filter step: one jitted program for the whole back-end.

Chains propagation -> MSCKF update -> clone augmentation -> robocentric
composition, mirroring the order of System::MonoVIO
(reference: src/rvio/System.cc:173-437, steps at :263, :268, :280, :325).
The visual front-end produces the UpdateBatch either on-device (tracker) or
host-side (simulator / replay); the step itself is front-end agnostic.

Everything is static-shape; the returned step function is jit-compiled once
per (config, dtype) and donates the state buffers.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rvio_tpu.config import RVIOConfig
from rvio_tpu.filter.propagation import ImuBlock, propagate
from rvio_tpu.filter.update import UpdateBatch, msckf_update
from rvio_tpu.state import FilterState, augment_window, compose_state


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrameBundle:
    """One frame's inputs to the back-end: IMU block + update features."""

    imu: ImuBlock
    batch: UpdateBatch


def make_filter_step(cfg: RVIOConfig, donate: bool = True):
    """Build the jitted per-frame step for a fixed configuration.

    Returns ``step(state, bundle) -> (state, outputs)`` where outputs hold
    the per-frame global pose (q_kG, p_Gk), velocity, and update
    diagnostics — the same quantities the reference records/publishes
    (System.cc:369-434).
    """
    imu_kw = dict(gravity=cfg.imu.gravity, small_angle=cfg.imu.small_angle,
                  sigma_g=cfg.imu.sigma_g, sigma_wg=cfg.imu.sigma_wg,
                  sigma_a=cfg.imu.sigma_a, sigma_wa=cfg.imu.sigma_wa,
                  parallel=cfg.tpu.parallel_propagation,
                  use_pallas=cfg.tpu.use_pallas)
    upd_kw = dict(R_bc=cfg.camera.R_bc, t_bc=cfg.camera.t_bc,
                  sigma_im=cfg.camera.sigma_image,
                  min_clone_states=cfg.min_clone_states,
                  compression=cfg.tpu.compression,
                  use_pallas=cfg.tpu.use_pallas,
                  fej=cfg.tpu.fej,
                  adaptive_noise=cfg.tpu.adaptive_noise,
                  adaptive_rampup=cfg.tpu.adaptive_rampup_frames,
                  parallel_chains=cfg.tpu.parallel_propagation,
                  ekf_tail_fused=cfg.tpu.ekf_tail_fused)

    def step(state: FilterState, bundle: FrameBundle
             ) -> Tuple[FilterState, dict]:
        st = propagate(state, bundle.imu, **imu_kw)
        st, diag = msckf_update(st, bundle.batch, **upd_kw)
        st = augment_window(st)
        st, (q_kG, p_Gk, vk) = compose_state(st)
        outputs = {
            "q_kG": q_kG, "p_Gk": p_Gk, "v_k": vk,
            "n_good": diag["n_good"], "did_update": diag["did_update"],
            "landmarks": diag["landmarks"], "landmark_ok": diag["passed"],
            "rho": diag["rho"], "n_usable": diag["n_usable"],
            "tl_good_sum": diag["tl_good_sum"],
        }
        return st, outputs

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_sequence_scan(cfg: RVIOConfig):
    """Build a jitted whole-sequence scan: states/outputs for T frames.

    ``run(state, bundles) -> (final_state, outputs_stacked)`` with bundles
    stacked along a leading time axis.  This is the high-throughput offline
    path: one device dispatch for the entire sequence (no per-frame host
    round-trips), used by the benchmark and the segment-parallel layer.
    """
    imu_kw = dict(gravity=cfg.imu.gravity, small_angle=cfg.imu.small_angle,
                  sigma_g=cfg.imu.sigma_g, sigma_wg=cfg.imu.sigma_wg,
                  sigma_a=cfg.imu.sigma_a, sigma_wa=cfg.imu.sigma_wa,
                  parallel=cfg.tpu.parallel_propagation,
                  use_pallas=cfg.tpu.use_pallas)
    upd_kw = dict(R_bc=cfg.camera.R_bc, t_bc=cfg.camera.t_bc,
                  sigma_im=cfg.camera.sigma_image,
                  min_clone_states=cfg.min_clone_states,
                  compression=cfg.tpu.compression,
                  use_pallas=cfg.tpu.use_pallas,
                  fej=cfg.tpu.fej,
                  adaptive_noise=cfg.tpu.adaptive_noise,
                  adaptive_rampup=cfg.tpu.adaptive_rampup_frames,
                  parallel_chains=cfg.tpu.parallel_propagation,
                  ekf_tail_fused=cfg.tpu.ekf_tail_fused)

    def body(state, bundle):
        st = propagate(state, bundle.imu, **imu_kw)
        st, diag = msckf_update(st, bundle.batch, **upd_kw)
        st = augment_window(st)
        st, (q_kG, p_Gk, vk) = compose_state(st)
        out = {"q_kG": q_kG, "p_Gk": p_Gk, "v_k": vk, "n_good": diag["n_good"]}
        return st, out

    # The scan's per-frame I/O is PACKED into one flat f32 row per frame:
    # scanning a 6-leaf bundle pytree costs 6 dynamic-slice ops per
    # iteration and stacking the 4 outputs costs 4 dynamic-update-slices —
    # ~25 us/frame of pure per-op overhead at these sizes (measured v5e;
    # ~8 % of the step).  One slice + one store instead; the in-body
    # unpack slices are value slices XLA fuses into the consumers, and
    # every field round-trips exactly (f32 pass-through; ints/bools are
    # small integers, exact in f32).
    def pack_bundles(bundles: FrameBundle):
        T = bundles.imu.w.shape[0]
        ftype = bundles.imu.w.dtype        # the filter float dtype

        def flat(x):
            return x.astype(ftype).reshape(T, -1)

        return jnp.concatenate(
            [flat(x) for x in jax.tree.leaves(bundles)], axis=1)

    def unpack_bundle(row, proto: FrameBundle):
        leaves = jax.tree.leaves(proto)
        out = []
        o = 0
        for leaf in leaves:
            n = int(np.prod(leaf.shape)) if leaf.ndim else 1
            out.append(jax.lax.dynamic_slice(row, (o,), (n,))
                       .reshape(leaf.shape).astype(leaf.dtype))
            o += n
        return jax.tree.unflatten(jax.tree.structure(proto), out)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state: FilterState, bundles: FrameBundle):
        proto = jax.tree.map(lambda x: x[0], bundles)
        packed = pack_bundles(bundles)

        def pbody(st, row):
            st, out = body(st, unpack_bundle(row, proto))
            orow = jnp.concatenate([
                out["q_kG"], out["p_Gk"], out["v_k"],
                out["n_good"].astype(out["q_kG"].dtype)[None]])
            return st, orow

        final, orows = jax.lax.scan(pbody, state, packed)
        outs = {"q_kG": orows[:, 0:4], "p_Gk": orows[:, 4:7],
                "v_k": orows[:, 7:10],
                "n_good": orows[:, 10].astype(jnp.int32)}
        return final, outs

    return run


def make_batched_sequence_scan(cfg: RVIOConfig):
    """Whole-sequence scan vmapped over a leading segment-batch axis.

    Single-chip throughput mode: B independent filters advance in lockstep,
    so every small matrix op in the step becomes a batched op — amortizing
    the dispatch/latency cost that dominates a lone 108-dim filter.  This is
    the natural offline-replay shape (dataset sequences / long-run segments).

    Propagation: on TPU f32 with ``tpu.use_pallas`` the fused
    propagate_block kernel runs (under vmap — ``use_pallas`` takes
    precedence inside ``propagate``); otherwise the sequential form runs
    regardless of ``tpu.parallel_propagation``, because the vmap already
    amortizes per-op latency across segments and the parallel prefix's
    extra tree FLOPs only cost (measured: 3.5k vs 3.0k frames/s at B=16).
    """
    imu_kw = dict(gravity=cfg.imu.gravity, small_angle=cfg.imu.small_angle,
                  sigma_g=cfg.imu.sigma_g, sigma_wg=cfg.imu.sigma_wg,
                  sigma_a=cfg.imu.sigma_a, sigma_wa=cfg.imu.sigma_wa,
                  parallel=False, use_pallas=cfg.tpu.use_pallas)
    upd_kw = dict(R_bc=cfg.camera.R_bc, t_bc=cfg.camera.t_bc,
                  sigma_im=cfg.camera.sigma_image,
                  min_clone_states=cfg.min_clone_states,
                  compression=cfg.tpu.compression,
                  use_pallas=cfg.tpu.use_pallas,
                  fej=cfg.tpu.fej,
                  adaptive_noise=cfg.tpu.adaptive_noise,
                  adaptive_rampup=cfg.tpu.adaptive_rampup_frames)

    def body(state, bundle):
        st = propagate(state, bundle.imu, **imu_kw)
        st, diag = msckf_update(st, bundle.batch, **upd_kw)
        st = augment_window(st)
        st, (q_kG, p_Gk, vk) = compose_state(st)
        return st, {"q_kG": q_kG, "p_Gk": p_Gk, "v_k": vk,
                    "n_good": diag["n_good"]}

    vbody = jax.vmap(body)

    @partial(jax.jit, donate_argnums=(0,))
    def run(states: FilterState, bundles: FrameBundle):
        # bundles leaves: (B, T, ...) -> scan over T with vmapped body
        swapped = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), bundles)

        def step(ss, bb):
            return vbody(ss, bb)

        final, outs = jax.lax.scan(step, states, swapped)
        outs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)
        return final, outs

    return run
