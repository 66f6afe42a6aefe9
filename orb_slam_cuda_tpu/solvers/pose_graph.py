"""Sim(3) pose-graph (essential graph) optimization.

TPU-native replacement for `Optimizer::OptimizeEssentialGraph`
(reference: src/Optimizer.cc:927-1189 — g2o VertexSim3Expmap +
EdgeSim3 graph with loop edges, spanning-tree edges, covisibility
edges (weight>=100) and identity information, LM lambda-init 1e-16
≈ pure Gauss-Newton, 20 iterations).

Here: per-edge residual r = log(S_ji ∘ S_i ∘ S_j^{-1}) with analytic-free
Jacobians from `jax.jacfwd` over the 7-dim tangents (vmapped over edges),
then the same matrix-free CG normal-equation solve as bundle_adjust —
segment-sums over the edge list, (K,7) unknowns.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3


class PoseGraphProblem(NamedTuple):
    """K vertices (Sim3 world->kf), E edges.

    vert_R/vert_t/vert_s: initial Sim3 estimates per keyframe.
    vert_fixed: (K,) bool (reference fixes the loop keyframe, :969).
    edge_i/edge_j: (E,) int32 endpoints.
    meas_R/meas_t/meas_s: (E,…) measured relative Sim3  S_ji (maps i->j).
    edge_valid: (E,) bool.
    """

    vert_R: jnp.ndarray
    vert_t: jnp.ndarray
    vert_s: jnp.ndarray
    vert_fixed: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    meas_R: jnp.ndarray
    meas_t: jnp.ndarray
    meas_s: jnp.ndarray
    edge_valid: jnp.ndarray


def relative_sim3(Si, Sj):
    """S_ji = S_j ∘ S_i^{-1} — the measurement construction used when
    building edges from current/corrected poses (reference :1010-1036)."""
    return sim3.compose(Sj, sim3.inverse(Si))


def _edge_residual(xi_i, xi_j, Si, Sj, Sji):
    """r = log(S_ji ∘ (exp(xi_i)∘S_i) ∘ (exp(xi_j)∘S_j)^{-1}) ∈ R^7."""
    Si_u = sim3.compose(sim3.exp(xi_i), Si)
    Sj_u = sim3.compose(sim3.exp(xi_j), Sj)
    return sim3.log(sim3.compose(Sji, sim3.compose(Si_u, sim3.inverse(Sj_u))))


@functools.partial(jax.jit, static_argnames=("gn_iters", "cg_iters"))
def optimize_pose_graph(
    problem: PoseGraphProblem,
    gn_iters: int = 20,
    cg_iters: int = 30,
) -> tuple:
    """Returns optimized (R (K,3,3), t (K,3), s (K,))."""
    K = problem.vert_R.shape[0]
    E = problem.edge_i.shape[0]
    ei = jnp.clip(problem.edge_i, 0)
    ej = jnp.clip(problem.edge_j, 0)
    free = ~problem.vert_fixed
    w_e = problem.edge_valid.astype(jnp.float32)

    def gn_step(carry, _):
        R, t, s = carry
        Si = (R[ei], t[ei], s[ei])
        Sj = (R[ej], t[ej], s[ej])
        Sji = (problem.meas_R, problem.meas_t, problem.meas_s)

        zeros = jnp.zeros((E, 7))
        res_fn = lambda xi, xj, SiR, Sit, Sis, SjR, Sjt, Sjs, MR, Mt, Ms: _edge_residual(
            xi, xj, (SiR, Sit, Sis), (SjR, Sjt, Sjs), (MR, Mt, Ms)
        )
        r = jax.vmap(res_fn)(
            zeros, zeros, *Si, *Sj, *Sji
        )  # (E,7)
        Ji = jax.vmap(jax.jacfwd(res_fn, argnums=0))(zeros, zeros, *Si, *Sj, *Sji)
        Jj = jax.vmap(jax.jacfwd(res_fn, argnums=1))(zeros, zeros, *Si, *Sj, *Sji)
        # (E,7,7) each.

        # b = J^T r (per vertex), H x via edge products.
        b = jnp.zeros((K, 7))
        b = b.at[ei].add(jnp.einsum("eki,ek,e->ei", Ji, r, w_e))
        b = b.at[ej].add(jnp.einsum("eki,ek,e->ei", Jj, r, w_e))

        # Block-diagonal preconditioner.
        Hd = jnp.zeros((K, 7, 7))
        Hd = Hd.at[ei].add(jnp.einsum("eki,ekj,e->eij", Ji, Ji, w_e))
        Hd = Hd.at[ej].add(jnp.einsum("eki,ekj,e->eij", Jj, Jj, w_e))
        damp = 1e-6 * jnp.eye(7)[None]
        Minv = jnp.linalg.inv(Hd + damp)
        Minv = jnp.where(free[:, None, None], Minv, 0.0)

        def matvec(x):
            x = jnp.where(free[:, None], x, 0.0)
            ye = jnp.einsum("eki,ei->ek", Ji, x[ei]) + jnp.einsum(
                "eki,ei->ek", Jj, x[ej]
            )
            y = jnp.zeros((K, 7))
            y = y.at[ei].add(jnp.einsum("eki,ek,e->ei", Ji, ye, w_e))
            y = y.at[ej].add(jnp.einsum("eki,ek,e->ei", Jj, ye, w_e))
            y = y + 1e-8 * x
            return jnp.where(free[:, None], y, 0.0)

        bf = jnp.where(free[:, None], -b, 0.0)
        x0 = jnp.zeros_like(bf)
        rc = bf
        zc = jnp.einsum("kij,kj->ki", Minv, rc)
        pc = zc
        rz = jnp.sum(rc * zc)

        def cg_body(i, st):
            x, rc, pc, rz = st
            Ap = matvec(pc)
            pAp = jnp.sum(pc * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-12, 1e-12, pAp)
            x = x + alpha * pc
            rc = rc - alpha * Ap
            zc = jnp.einsum("kij,kj->ki", Minv, rc)
            rz_new = jnp.sum(rc * zc)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
            pc = zc + beta * pc
            return x, rc, pc, rz_new

        x, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, rc, pc, rz))
        x = jnp.where(free[:, None], x, 0.0)
        Rn, tn, sn = jax.vmap(lambda xi, Rv, tv, sv: sim3.compose(sim3.exp(xi), (Rv, tv, sv)))(
            x, R, t, s
        )
        err = jnp.sum(jnp.square(r) * w_e[:, None])
        return (Rn, tn, sn), err

    (R, t, s), errs = jax.lax.scan(
        gn_step, (problem.vert_R, problem.vert_t, problem.vert_s), None,
        length=gn_iters,
    )
    return R, t, s
