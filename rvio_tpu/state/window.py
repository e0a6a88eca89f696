"""Sliding-window operations: clone augmentation/marginalization, composition.

TPU-first design note: the reference grows/shrinks x and P dynamically
(System.cc:280-323).  Here both branches (growth and slide) are a single
static-shape *gather* ``P[src][:, src]`` — the reference's Jacobian J has
only elementary unit rows, so J P J^T is exactly a row/column permutation
with duplication.  No dynamic shapes, no lax.cond, one fused gather.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from rvio_tpu.core.quaternion import quat_mul, quat_to_rot
from rvio_tpu.core.so3 import skew
from rvio_tpu.state.filter_state import FilterState


def augment_window(state: FilterState) -> FilterState:
    """Append a clone of (q_R, p_R); marginalize the oldest if the window is full.

    Mirrors reference System.cc:280-323:
    - growth phase (n < M): new clone slot n gets (q_R, p_R); its covariance
      rows/cols are copies of the dθR/dpR rows (indices 9:15);
    - full window: clones shift left by one (oldest marginalized), the new
      clone lands in the last slot.
    Skipped entirely on the first post-init image (nImageCountAfterInit>1
    gate at System.cc:280).
    """
    M = state.max_clones
    D = state.err_dim
    n = state.n_clones

    r = jnp.arange(D)
    j = (r - 24) // 6            # clone index of row r (garbage for r<24; masked)
    o = (r - 24) % 6
    growth_src = jnp.where(r < 24, r, jnp.where(j == n, 9 + o, r))
    full_src = jnp.where(r < 24, r, jnp.where(j < M - 1, r + 6, 9 + o))
    src = jnp.where(n < M, growth_src, full_src)
    P_aug = state.P[src][:, src]

    new_clone = jnp.concatenate([state.q_R, state.p_R])

    def _append(window):
        growth = window.at[jnp.clip(n, 0, M - 1)].set(new_clone)
        full = jnp.concatenate([window[1:], new_clone[None]], axis=0)
        return jnp.where(n < M, growth, full)

    clones_aug = _append(state.clones)
    # The new clone's FEJ value IS its current (first) estimate; existing
    # FEJ slots shift with the window but are never re-estimated.
    fej_aug = _append(state.clones_fej)
    n_aug = jnp.minimum(n + 1, M)

    # First post-init image: no augmentation (window still empty).
    do_aug = state.frame_idx > 0
    return FilterState(
        q_G=state.q_G, p_G=state.p_G, g=state.g, q_R=state.q_R,
        p_R=state.p_R, v_R=state.v_R, bg=state.bg, ba=state.ba,
        clones=jnp.where(do_aug, clones_aug, state.clones),
        P=jnp.where(do_aug, P_aug, state.P),
        n_clones=jnp.where(do_aug, n_aug, n).astype(jnp.int32),
        frame_idx=state.frame_idx,
        clones_fej=jnp.where(do_aug, fej_aug, state.clones_fej),
        sigma2_scale=state.sigma2_scale,
    )


def compose_state(state: FilterState
                  ) -> Tuple[FilterState, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Robocentric-to-global composition; re-centers the frame of reference.

    Mirrors reference System.cc:325-365: rotates (q_G, p_G, g) into the new
    frame {Rk+1}, resets (q_R, p_R), transforms the covariance by the 24x24
    composition Jacobian Vk, and emits the global pose output
    (q_kG, p_Gk = R_G^T (p_k - p_G)) plus the local velocity.
    """
    dtype = state.dtype
    qG, pG, gk = state.q_G, state.p_G, state.g
    qk, pk, vk = state.q_R, state.p_R, state.v_R

    RG = quat_to_rot(qG)
    Rk = quat_to_rot(qk)

    g_new = Rk @ gk
    g_new = g_new / jnp.linalg.norm(g_new)

    q_kG = quat_mul(qk, qG)
    p_kG = Rk @ (pG - pk)            # new p_G (global origin in {Rk+1})
    p_Gk = RG.T @ (pk - pG)          # output: IMU position in {G}

    Vk = jnp.zeros((24, 24), dtype)
    Vk = Vk.at[0:3, 0:3].set(Rk)
    Vk = Vk.at[0:3, 9:12].set(jnp.eye(3, dtype=dtype))
    Vk = Vk.at[3:6, 3:6].set(Rk)
    Vk = Vk.at[3:6, 9:12].set(skew(p_kG))
    Vk = Vk.at[3:6, 12:15].set(-Rk)
    Vk = Vk.at[6:9, 6:9].set(Rk)
    Vk = Vk.at[6:9, 9:12].set(skew(g_new))
    Vk = Vk.at[15:24, 15:24].set(jnp.eye(9, dtype=dtype))

    P = state.P
    core = Vk @ P[:24, :24] @ Vk.T
    cross = Vk @ P[:24, 24:]
    P = P.at[:24, :24].set(core)
    P = P.at[:24, 24:].set(cross)
    P = P.at[24:, :24].set(cross.T)
    P = 0.5 * (P + P.T)

    new_state = FilterState(
        q_G=q_kG, p_G=p_kG, g=g_new,
        q_R=jnp.array([0, 0, 0, 1], dtype=dtype),
        p_R=jnp.zeros(3, dtype), v_R=vk, bg=state.bg, ba=state.ba,
        clones=state.clones, P=P, n_clones=state.n_clones,
        frame_idx=state.frame_idx + 1, clones_fej=state.clones_fej,
        sigma2_scale=state.sigma2_scale,
    )
    return new_state, (q_kG, p_Gk, vk)
