"""Segment-parallel filtering: a batch of independent filters, sharded.

One filter instance per sequence segment, vmapped over a leading segment
axis and sharded over the ``seg`` mesh axis; the per-feature update work is
additionally sharded over ``feat``.  XLA partitions the vmapped update and
inserts the reductions (psum of the stacked H^T H-style contractions) over
ICI — no hand-written transport, per the scaling-book recipe: pick a mesh,
annotate shardings, let XLA place collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rvio_tpu.config import RVIOConfig
from rvio_tpu.filter.propagation import propagate
from rvio_tpu.filter.update import msckf_update
from rvio_tpu.runtime.step import FrameBundle
from rvio_tpu.state import FilterState, augment_window, compose_state


def _step_body(cfg: RVIOConfig):
    imu_kw = dict(gravity=cfg.imu.gravity, small_angle=cfg.imu.small_angle,
                  sigma_g=cfg.imu.sigma_g, sigma_wg=cfg.imu.sigma_wg,
                  sigma_a=cfg.imu.sigma_a, sigma_wa=cfg.imu.sigma_wa,
                  parallel=cfg.tpu.parallel_propagation)
    upd_kw = dict(R_bc=cfg.camera.R_bc, t_bc=cfg.camera.t_bc,
                  sigma_im=cfg.camera.sigma_image,
                  min_clone_states=cfg.min_clone_states,
                  compression=cfg.tpu.compression,
                  use_pallas=cfg.tpu.use_pallas,
                  fej=cfg.tpu.fej,
                  adaptive_noise=cfg.tpu.adaptive_noise,
                  adaptive_rampup=cfg.tpu.adaptive_rampup_frames)

    def body(state: FilterState, bundle: FrameBundle):
        st = propagate(state, bundle.imu, **imu_kw)
        st, diag = msckf_update(st, bundle.batch, **upd_kw)
        st = augment_window(st)
        st, (q_kG, p_Gk, vk) = compose_state(st)
        return st, {"q_kG": q_kG, "p_Gk": p_Gk, "v_k": vk,
                    "n_good": diag["n_good"]}

    return body


def _state_spec() -> FilterState:
    """PartitionSpecs for a segment-batched FilterState (leading seg axis)."""
    seg = P("seg")
    return FilterState(q_G=seg, p_G=seg, g=seg, q_R=seg, p_R=seg, v_R=seg,
                       bg=seg, ba=seg, clones=seg, P=seg, n_clones=seg,
                       frame_idx=seg, clones_fej=seg,
                       sigma2_scale=seg)


def _bundle_spec(time_axis: bool) -> FrameBundle:
    """Specs for bundles: seg on axis 0, feat on the feature axis.

    With ``time_axis`` the arrays carry (S, T, ...) for whole-sequence scans.
    """
    def sp(*names):
        return P(*names)

    lead = ("seg", None) if time_axis else ("seg",)
    from rvio_tpu.filter.propagation import ImuBlock
    from rvio_tpu.filter.update import UpdateBatch
    imu = ImuBlock(w=sp(*lead), a=sp(*lead), dt=sp(*lead), valid=sp(*lead))
    batch = UpdateBatch(meas=sp(*lead, "feat"), track_len=sp(*lead, "feat"),
                        is_type2=sp(*lead, "feat"), valid=sp(*lead, "feat"))
    return FrameBundle(imu=imu, batch=batch)


def make_parallel_step(cfg: RVIOConfig, mesh: Mesh):
    """Jitted one-frame step for a segment batch, sharded over the mesh.

    ``pstep(states, bundles) -> (states, outputs)`` with every leaf carrying
    a leading segment axis of size S (sharded over ``seg``); the feature
    axis of the update batch is sharded over ``feat``.
    """
    body = _step_body(cfg)
    vstep = jax.vmap(body)

    st_sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                         _state_spec(), is_leaf=lambda x: isinstance(x, P))
    bd_sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                         _bundle_spec(False), is_leaf=lambda x: isinstance(x, P))
    out_sh = NamedSharding(mesh, P("seg"))

    return jax.jit(vstep,
                   in_shardings=(st_sh, bd_sh),
                   out_shardings=(st_sh, {"q_kG": out_sh, "p_Gk": out_sh,
                                          "v_k": out_sh, "n_good": out_sh}),
                   donate_argnums=(0,))


def make_parallel_sequence(cfg: RVIOConfig, mesh: Mesh):
    """Jitted whole-sequence scan for a segment batch (offline throughput).

    ``prun(states, bundles_T) -> (states, outputs_T)`` where bundle leaves
    carry (S, T, ...); each segment scans its own T frames independently.
    """
    body = _step_body(cfg)

    def seq(state, bundles):
        return jax.lax.scan(body, state, bundles)

    vseq = jax.vmap(seq)

    st_sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                         _state_spec(), is_leaf=lambda x: isinstance(x, P))
    bd_sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                         _bundle_spec(True), is_leaf=lambda x: isinstance(x, P))
    out_sh = NamedSharding(mesh, P("seg"))
    return jax.jit(vseq,
                   in_shardings=(st_sh, bd_sh),
                   out_shardings=(st_sh, {"q_kG": out_sh, "p_Gk": out_sh,
                                          "v_k": out_sh, "n_good": out_sh}),
                   donate_argnums=(0,))


def shard_states(states: FilterState, mesh: Mesh) -> FilterState:
    """Place a host-built segment batch of states onto the mesh."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        states, _state_spec(), is_leaf=lambda x: isinstance(x, P))


def shard_bundles(bundles: FrameBundle, mesh: Mesh,
                  time_axis: bool = True) -> FrameBundle:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        bundles, _bundle_spec(time_axis), is_leaf=lambda x: isinstance(x, P))


def replicate_scalars(tree, mesh: Mesh):
    """Fully-replicated placement for shared constants."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def stack_states(states) -> FilterState:
    """Stack per-segment FilterStates along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)
