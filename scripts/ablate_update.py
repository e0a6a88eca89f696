"""Time the MSCKF update's sub-stages on the chip (sync-amortized).

The update is ~0.2 ms of mostly latency-bound small ops; this script
times each sub-stage standalone with the chained-scan method
(scripts/roofline.py) to find where the microseconds live:

  chains    window_pose_chain + per-feature camera chains
  lm        Pallas LM triangulation
  jac       vmapped Jacobian build + Householder projection
  gate      S build + Pallas quadform + threshold
  compress  cholesky-mode information compression
  ekf       PHt, S, cho_solve, K, dx, Joseph form
  retract   state retraction + clone updates
  full      the whole msckf_update

Run: python scripts/ablate_update.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_scanned(step, init_carry, reps=64, chain=8, outers=3):
    run = jax.jit(lambda c: lax.scan(lambda cc, _: (step(cc), None), c,
                                     None, length=reps)[0])

    def sync(out):
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    sync(run(init_carry))
    t1 = tN = float("inf")
    for _ in range(outers):
        t0 = time.perf_counter()
        sync(run(init_carry))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        c = init_carry
        for _ in range(chain):
            c = run(c)
        sync(c)
        tN = min(tN, time.perf_counter() - t0)
    return max(tN - t1, 1e-9) / ((chain - 1) * reps)


def main():
    from __graft_entry__ import _example_inputs
    from rvio_tpu.config import RVIOConfig
    from rvio_tpu.filter import update as U
    from rvio_tpu.core.chi2 import chi2_gate_thresholds

    cfg = RVIOConfig()
    dtype = jnp.float32
    st, bundle = _example_inputs(cfg, dtype)
    batch = bundle.batch
    F, L, _ = batch.meas.shape
    M = st.max_clones
    n = st.n_clones
    R_bc = jnp.asarray(cfg.camera.R_bc, dtype)
    t_bc = jnp.asarray(cfg.camera.t_bc, dtype)
    sigma_im = cfg.camera.sigma_image
    chi2 = jnp.asarray(chi2_gate_thresholds(2 * L, np.float64), dtype)

    # shared intermediates (host-computed once, then perturbed per rep)
    Rw, tw = U.window_pose_chain(st.clones, n, parallel=True)
    tlen = batch.track_len
    c0 = jnp.clip(jnp.where(batch.is_type2, 0, n - (tlen - 1)), 0, M)

    def chains_of(clones):
        Rw_, tw_ = U.window_pose_chain(clones, n, parallel=True)

        def one(c0_f):
            Rrel, trel = U._feature_chain(Rw_, tw_, c0_f, L)
            R_cb = R_bc.T
            t_cb = -R_cb @ t_bc
            Rc = jnp.einsum("ab,lbc,cd->lad", R_cb, Rrel, R_bc)
            tc = (jnp.einsum("ab,lbc,c->la", R_cb, Rrel, t_bc)
                  + jnp.einsum("ab,lb->la", R_cb, trel) + t_cb)
            return Rrel, trel, Rc, tc

        return jax.vmap(one)(c0)

    Rrel_a, trel_a, Rc_a, tc_a = chains_of(st.clones)
    from rvio_tpu.ops.lm_triangulate import lm_triangulate_pallas
    phi_a, psi_a, rho_a, ok_lm = lm_triangulate_pallas(
        batch.meas, Rc_a, tc_a, tlen, sigma_im=sigma_im)

    def jac_of(meas):
        def per_feature(z, tl, typ2, c0_f, Rrel, trel, Rc, tc, phi, psi, rho):
            t_eff = jnp.where(typ2, (tl + 1) // 2, tl)
            r, Hf, Hx = U._build_jacobians(z, phi, psi, rho, Rrel, trel,
                                           Rc, tc, c0_f, t_eff, R_bc, t_bc,
                                           M, Rc, tc)
            Ncols = jnp.where(jnp.linalg.norm(Hf[:, 2]) < 1e-4, 2, 3)
            _, Hx_p, r_p = U._householder_project(Hf, Hx, r)
            rows = jnp.arange(2 * L)
            res_mask = (rows >= Ncols) & (rows < 2 * t_eff)
            return (jnp.where(res_mask[:, None], Hx_p, 0.0),
                    jnp.where(res_mask, r_p, 0.0), 2 * t_eff - Ncols)

        return jax.vmap(per_feature)(meas, tlen, batch.is_type2, c0,
                                     Rrel_a, trel_a, Rc_a, tc_a,
                                     phi_a, psi_a, rho_a)

    Hx_all, r_all, dof_all = jac_of(batch.meas)
    Pcl = st.P[24:, 24:]

    from rvio_tpu.ops.spd_solve import batched_quadform_pallas

    def gate_of(r_in):
        S_all = jax.vmap(lambda Hxf: 0.5 * ((Hxf @ Pcl @ Hxf.T
                          + (sigma_im ** 2) * jnp.eye(2 * L, dtype=dtype))
                         + (Hxf @ Pcl @ Hxf.T).T))(Hx_all)
        D_all = jnp.abs(batched_quadform_pallas(S_all, r_in))
        thr = chi2[jnp.clip(dof_all - 1, 0, 2 * L - 1)]
        return D_all < thr

    passed = gate_of(r_all)
    Hw0 = jnp.where(passed[:, None, None], Hx_all, 0.0).reshape(F * 2 * L,
                                                                6 * M)
    ro0 = jnp.where(passed[:, None], r_all, 0.0).reshape(F * 2 * L)

    def compress_of(ro):
        C = Hw0.T @ Hw0
        b = Hw0.T @ ro
        ridge = 1e-8 * jnp.maximum(jnp.trace(C), 1.0)
        C = C + ridge * jnp.eye(6 * M, dtype=dtype)
        Lc = jnp.linalg.cholesky(C)
        return Lc.T, jax.scipy.linalg.solve_triangular(Lc, b, lower=True)

    Hn_cl0, rn0 = compress_of(ro0)
    Hn0 = jnp.concatenate([jnp.zeros((Hn_cl0.shape[0], 24), dtype), Hn_cl0],
                          axis=1)
    D = st.err_dim

    def ekf_of(rn):
        P = st.P
        PHt = P @ Hn0.T
        S = Hn0 @ PHt + (sigma_im ** 2) * jnp.eye(Hn0.shape[0], dtype=dtype)
        S = 0.5 * (S + S.T)
        cf = jax.scipy.linalg.cho_factor(S, lower=True)
        K = jax.scipy.linalg.cho_solve(cf, PHt.T).T
        dx = K @ rn
        I_KH = jnp.eye(D, dtype=dtype) - K @ Hn0
        P_new = I_KH @ P @ I_KH.T + (sigma_im ** 2) * (K @ K.T)
        return dx, 0.5 * (P_new + P_new.T)

    dx0, _ = ekf_of(rn0)

    from rvio_tpu.core.quaternion import quat_mul, small_quat_from_dtheta

    def retract_of(dx):
        q_G = quat_mul(small_quat_from_dtheta(dx[0:3]), st.q_G)
        g = st.g + dx[6:9]
        g = g / jnp.linalg.norm(g)
        dx_cl = dx[24:].reshape(M, 6)
        dq_cl = jax.vmap(small_quat_from_dtheta)(dx_cl[:, :3])
        q_cl = jax.vmap(quat_mul)(dq_cl, st.clones[:, :4])
        return q_G, g, q_cl

    upd_kw = dict(R_bc=cfg.camera.R_bc, t_bc=cfg.camera.t_bc,
                  sigma_im=sigma_im, min_clone_states=cfg.min_clone_states,
                  compression="cholesky", parallel_chains=True)

    eps = 1e-12

    def dep(tree):
        """Scalar data dependency from any output tree."""
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))

    stages = [
        ("chains", st.clones, lambda X: chains_of(X)),
        ("jac", batch.meas, lambda X: jac_of(X)),
        ("gate", r_all, lambda X: gate_of(X)),
        ("compress", ro0, lambda X: compress_of(X)),
        ("ekf", rn0, lambda X: ekf_of(X)),
        ("retract", dx0, lambda X: retract_of(X)),
        ("full_update", batch.meas, lambda X: U.msckf_update(
            st, type(batch)(meas=X, track_len=batch.track_len,
                            is_type2=batch.is_type2, valid=batch.valid),
            **upd_kw)[1]["mahalanobis"]),
    ]
    print(f"{'stage':<14} {'us':>8}")
    for name, X0, fn in stages:
        def step(X, X0=X0, fn=fn):
            return X0 + eps * dep(fn(X)).astype(X0.dtype)

        t = _time_scanned(step, X0)
        print(f"{name:<14} {t * 1e6:>8.1f}")


if __name__ == "__main__":
    main()
