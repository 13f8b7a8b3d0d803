"""Pose-graph (essential graph) optimization over Sim3 / SE3-4DoF.

Replaces Optimizer::OptimizeEssentialGraph (reference: src/Optimizer.cc:4509,
merge variant 5667) and OptimizeEssentialGraph4DoF (4852): after a loop is
detected, keyframe similarities are relaxed over the graph of spanning-tree +
loop + strong-covisibility edges.

TPU form: all edge residuals and their jacfwd linearizations are built with
one vmap; the [7K, 7K] (or [4K, 4K]) system is assembled by scatter-add and
solved with an equilibrated dense Cholesky — at K <= few hundred keyframes
that dense solve is microseconds on the MXU, so g2o's sparse machinery buys
nothing here.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import SE3, Sim3, se3, sim3, so3


class PoseGraphResult(NamedTuple):
    R: jnp.ndarray    # [K, 3, 3]
    t: jnp.ndarray    # [K, 3]
    s: jnp.ndarray    # [K]
    cost: jnp.ndarray


def _solve_damped(H, g, lam):
    n = H.shape[0]
    diag = jnp.diag(H)
    Hd = H + lam * jnp.diag(jnp.maximum(diag, 1e-6))
    E = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-10))
    Hs = Hd * E[:, None] * E[None, :]
    y = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(Hs + 1e-6 * jnp.eye(n), lower=True), True),
        g * E)
    return y * E


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3_graph(R0: jnp.ndarray, t0: jnp.ndarray, s0: jnp.ndarray,
                        edge_i: jnp.ndarray, edge_j: jnp.ndarray,
                        edge_R: jnp.ndarray, edge_t: jnp.ndarray,
                        edge_s: jnp.ndarray, edge_w: jnp.ndarray,
                        fixed: jnp.ndarray, iters: int = 12,
                        fix_scale: bool = False) -> PoseGraphResult:
    """States S_k = (R0[k], t0[k], s0[k]) world->keyframe similarities.
    Edges carry the measured relative similarity m_ij = S_i S_j^-1 (at
    measurement time) with weight edge_w. fixed [K] holds keyframes constant
    (the loop anchor). fix_scale holds every s_k at its input value — the
    SE3 essential graph for metric (stereo/RGB-D) maps (reference:
    VertexSim3Expmap::_fix_scale via OptimizeEssentialGraph's bFixScale)."""
    K = R0.shape[0]
    E = edge_i.shape[0]
    D = 7

    R, t, s = R0, t0, s0

    def cost_of(R, t, s):
        def one(e):
            S_i = Sim3(R[edge_i[e]], t[edge_i[e]], s[edge_i[e]])
            S_j = Sim3(R[edge_j[e]], t[edge_j[e]], s[edge_j[e]])
            m = Sim3(edge_R[e], edge_t[e], edge_s[e])
            r = sim3.log(m.inverse().compose(S_i).compose(S_j.inverse()))
            return edge_w[e] * jnp.sum(r * r)
        return jnp.sum(jax.vmap(one)(jnp.arange(E)))

    def gn_iter(it, carry):
        R, t, s, lam, cost = carry
        R0l, t0l, s0l = R, t, s

        def edge_res_l(pi, pj, e):
            Si = sim3.exp(pi).compose(Sim3(R0l[edge_i[e]], t0l[edge_i[e]], s0l[edge_i[e]]))
            Sj = sim3.exp(pj).compose(Sim3(R0l[edge_j[e]], t0l[edge_j[e]], s0l[edge_j[e]]))
            m = Sim3(edge_R[e], edge_t[e], edge_s[e])
            return sim3.log(m.inverse().compose(Si).compose(Sj.inverse()))

        def lin(e):
            z = jnp.zeros(7)
            return (edge_res_l(z, z, e),
                    jax.jacfwd(edge_res_l, 0)(z, z, e),
                    jax.jacfwd(edge_res_l, 1)(z, z, e))

        r, Ji, Jj = jax.vmap(lin)(jnp.arange(E))
        w = edge_w
        H = jnp.zeros((K, D, K, D))
        g = jnp.zeros((K, D))
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        H = H.at[edge_i, :, edge_i, :].add(jnp.einsum("eki,ekj->eij", JiW, Ji))
        H = H.at[edge_j, :, edge_j, :].add(jnp.einsum("eki,ekj->eij", JjW, Jj))
        H = H.at[edge_i, :, edge_j, :].add(jnp.einsum("eki,ekj->eij", JiW, Jj))
        H = H.at[edge_j, :, edge_i, :].add(jnp.einsum("eki,ekj->eij", JjW, Ji))
        g = g.at[edge_i].add(-jnp.einsum("eki,ek->ei", JiW, r))
        g = g.at[edge_j].add(-jnp.einsum("eki,ek->ei", JjW, r))

        free = ~fixed
        fm = free.astype(H.dtype)
        H = H * fm[:, None, None, None] * fm[None, None, :, None]
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.eye(D) * (~free)[:, None, None].astype(H.dtype))
        g = g * fm[:, None]
        if fix_scale:   # zero the sigma DOF rows/cols, keep H invertible
            dofm = jnp.ones(D).at[6].set(0.0)
            H = H * dofm[None, :, None, None] * dofm[None, None, None, :]
            H = H.at[jnp.arange(K), 6, jnp.arange(K), 6].add(1.0)
            g = g * dofm[None, :]

        dx = _solve_damped(H.reshape(K * D, K * D), g.reshape(-1), lam)
        dx = dx.reshape(K, D) * fm[:, None]
        dS = sim3.exp(dx)
        R_new = dS.R @ R
        t_new = dS.s[:, None] * jnp.einsum("kij,kj->ki", dS.R, t) + dS.t
        s_new = dS.s * s
        new_cost = cost_of(R_new, t_new, s_new)
        acc = (new_cost < cost) & jnp.isfinite(new_cost)
        R = jnp.where(acc, R_new, R)
        t = jnp.where(acc, t_new, t)
        s = jnp.where(acc, s_new, s)
        lam = jnp.where(acc, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e3))
        cost = jnp.where(acc, new_cost, cost)
        return (R, t, s, lam, cost)

    cost0 = cost_of(R, t, s)
    R, t, s, _, cost = jax.lax.fori_loop(
        0, iters, gn_iter, (R, t, s, jnp.asarray(1e-6, jnp.float32), cost0))
    R = so3.normalize(R)
    return PoseGraphResult(R, t, s, cost)


@partial(jax.jit, static_argnames=("iters",))
def optimize_4dof_graph(R0: jnp.ndarray, t0: jnp.ndarray,
                        edge_i: jnp.ndarray, edge_j: jnp.ndarray,
                        edge_R: jnp.ndarray, edge_t: jnp.ndarray,
                        edge_w: jnp.ndarray,
                        fixed: jnp.ndarray, iters: int = 12) -> PoseGraphResult:
    """Yaw + translation pose graph for inertial maps (gravity-observable
    roll/pitch held fixed; reference: OptimizeEssentialGraph4DoF,
    Optimizer.cc:4852). States T_k = (R0, t0) world->KF; perturbation
    [dyaw, dt(3)] applied in the world frame: R <- R Rz(-dyaw)... implemented
    as left-composition on the inverse pose for clarity."""
    K = R0.shape[0]
    E = edge_i.shape[0]
    D = 4
    ez = jnp.array([0.0, 0.0, 1.0])

    def apply_pert(R, t, p):
        # world-frame yaw rotation about z + translation shift of the KF pose
        Rz = so3.exp(ez * p[0])
        # T_kw <- T_kw ∘ Rz(-yaw) shifted: perturb in world frame:
        # x_k = R (Rz x_w + dt) + t
        return R @ Rz, t + jnp.einsum("ij,j->i", R, p[1:4])

    def edge_res_g(Rl, tl, pi, pj, e):
        Ri, ti = apply_pert(Rl[edge_i[e]], tl[edge_i[e]], pi)
        Rj, tj = apply_pert(Rl[edge_j[e]], tl[edge_j[e]], pj)
        Ti = SE3(Ri, ti)
        Tj = SE3(Rj, tj)
        m = SE3(edge_R[e], edge_t[e])
        return se3.log(m.inverse().compose(Ti).compose(Tj.inverse()))

    def cost_of(R, t):
        z = jnp.zeros(4)
        def one(e):
            r = edge_res_g(R, t, z, z, e)
            return edge_w[e] * jnp.sum(r * r)
        return jnp.sum(jax.vmap(one)(jnp.arange(E)))

    def gn_iter(it, carry):
        R, t, lam, cost = carry

        def lin(e):
            z = jnp.zeros(4)
            f = lambda pi, pj: edge_res_g(R, t, pi, pj, e)
            return (f(z, z), jax.jacfwd(f, 0)(z, z), jax.jacfwd(f, 1)(z, z))

        r, Ji, Jj = jax.vmap(lin)(jnp.arange(E))
        w = edge_w
        H = jnp.zeros((K, D, K, D))
        g = jnp.zeros((K, D))
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        H = H.at[edge_i, :, edge_i, :].add(jnp.einsum("eki,ekj->eij", JiW, Ji))
        H = H.at[edge_j, :, edge_j, :].add(jnp.einsum("eki,ekj->eij", JjW, Jj))
        H = H.at[edge_i, :, edge_j, :].add(jnp.einsum("eki,ekj->eij", JiW, Jj))
        H = H.at[edge_j, :, edge_i, :].add(jnp.einsum("eki,ekj->eij", JjW, Ji))
        g = g.at[edge_i].add(-jnp.einsum("eki,ek->ei", JiW, r))
        g = g.at[edge_j].add(-jnp.einsum("eki,ek->ei", JjW, r))

        free = ~fixed
        fm = free.astype(H.dtype)
        H = H * fm[:, None, None, None] * fm[None, None, :, None]
        H = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.eye(D) * (~free)[:, None, None].astype(H.dtype))
        g = g * fm[:, None]

        dx = _solve_damped(H.reshape(K * D, K * D), g.reshape(-1), lam)
        dx = dx.reshape(K, D) * fm[:, None]
        Rt = jax.vmap(apply_pert)(R, t, dx)
        new_cost = cost_of(*Rt)
        acc = (new_cost < cost) & jnp.isfinite(new_cost)
        R = jnp.where(acc, Rt[0], R)
        t = jnp.where(acc, Rt[1], t)
        lam = jnp.where(acc, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e3))
        cost = jnp.where(acc, new_cost, cost)
        return (R, t, lam, cost)

    cost0 = cost_of(R0, t0)
    R, t, _, cost = jax.lax.fori_loop(
        0, iters, gn_iter, (R0, t0, jnp.asarray(1e-6, jnp.float32), cost0))
    return PoseGraphResult(so3.normalize(R), t, jnp.ones(K), cost)
