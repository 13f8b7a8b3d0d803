"""Inertial-only initialization: gravity direction, scale, biases, velocities.

Replaces Optimizer::InertialOptimization (reference: src/Optimizer.cc:3688 and
the scale/gravity-only variant at 4067) used by LocalMapping::InitializeIMU
(LocalMapping.cc:1516). Keyframe poses from visual SLAM are held fixed
(monocular: known only up to scale); the optimizer estimates

    theta = [rwg (2: gravity-direction tangent), log_s (1),
             bg (3), ba (3), v_1..K (3K)]

by Gauss-Newton on the stacked 9-dof preintegration residuals between
consecutive keyframes. On TPU the whole problem is one dense GN: the
Jacobian of the full residual vector is taken with jacfwd (the problem is a
few hundred variables) and the normal equations solved by Cholesky.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import so3
from . import factors, preintegration as pre_mod
from .preintegration import Preintegrated


class InertialInitResult(NamedTuple):
    R_wg: jnp.ndarray     # [3,3] gravity-direction rotation (g_w = R_wg @ (0,0,-9.81))
    scale: jnp.ndarray    # []
    bg: jnp.ndarray       # [3]
    ba: jnp.ndarray       # [3]
    velocities: jnp.ndarray  # [K, 3]
    cost: jnp.ndarray


def initial_gravity_estimate(R_wb: jnp.ndarray, pres: Preintegrated,
                             edge_valid=None) -> jnp.ndarray:
    """Gravity direction from the mean of -R * dV (reference:
    LocalMapping::InitializeIMU dirG accumulation, LocalMapping.cc:1583-1620).
    pres: stacked Preintegrated with leading axis K-1. edge_valid [K-1]:
    mask for bucket-padded chains (padding keeps compiled shapes stable)."""
    terms = jnp.einsum("kij,kj->ki", R_wb[:-1], pres.dV)
    if edge_valid is not None:
        terms = terms * edge_valid[:, None]
    dirG = -jnp.sum(terms, axis=0)
    dirG = dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI = jnp.array([0.0, 0.0, -1.0])
    v = jnp.cross(gI, dirG)
    cos = jnp.dot(gI, dirG)
    nv = jnp.linalg.norm(v)
    ang = jnp.arctan2(nv, cos)
    axis = v / jnp.maximum(nv, 1e-9)
    return so3.exp(axis * ang)


@partial(jax.jit, static_argnames=("iters",))
def estimate_gyro_bias(R_wb: jnp.ndarray, pres: Preintegrated,
                       iters: int = 4, edge_valid=None) -> jnp.ndarray:
    """Gyro bias from rotation-only alignment of preintegrations to the
    visual rotations: min_bg sum ||Log(dR(bg)^T R_i^T R_j)||^2.
    (stage 1 of the reference's IMU init; also used standalone before
    FullInertialBA so the joint problem starts inside its basin)."""
    K = R_wb.shape[0]

    def rot_residuals(bg):
        def pair(i):
            pre_i = jax.tree.map(lambda x: x[i], pres)
            dR = pre_mod.delta_rotation(pre_i, bg)
            r = so3.log(dR.T @ R_wb[i].T @ R_wb[i + 1])
            return r if edge_valid is None else r * edge_valid[i]
        return jax.vmap(pair)(jnp.arange(K - 1)).reshape(-1)

    def step(i, bg):
        r = rot_residuals(bg)
        J = jax.jacfwd(rot_residuals)(bg)
        return bg - jnp.linalg.solve(J.T @ J + 1e-8 * jnp.eye(3), J.T @ r)

    return jax.lax.fori_loop(0, iters, step, jnp.zeros(3))


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def inertial_optimization(R_wb: jnp.ndarray, p_w: jnp.ndarray,
                          pres: Preintegrated,
                          R_wg0: jnp.ndarray,
                          prior_gyro: float = 1e2, prior_acc: float = 1e10,
                          iters: int = 20, fix_scale: bool = False,
                          edge_valid=None) -> InertialInitResult:
    """R_wb [K,3,3], p_w [K,3] (visual, up-to-scale); pres: stacked [K-1]
    preintegrations between consecutive KFs. priors follow the reference's
    schedule (priorG/priorA, LocalMapping.cc:236-244). edge_valid [K-1]:
    mask for bucket-padded chains — padded edges contribute zero residual
    and padded velocities are pinned, so growing maps reuse ONE compiled
    program per bucket size instead of recompiling at every chain length."""
    K = R_wb.shape[0]
    g_mag = 9.81
    if edge_valid is None:
        edge_valid = jnp.ones(K - 1, jnp.float32)
    else:
        edge_valid = edge_valid.astype(jnp.float32)
    # state k participates if some adjacent edge does (k=0 always does)
    state_valid = jnp.concatenate(
        [jnp.ones(1), jnp.maximum(edge_valid[1:], edge_valid[:-1]),
         edge_valid[-1:]]) if K > 1 else jnp.ones(K)

    # initial velocities: finite differences of scaled positions
    def unpack(theta):
        rwg = theta[0:2]
        log_s = theta[2]
        bg = theta[3:6]
        ba = theta[6:9]
        v = theta[9:].reshape(K, 3)
        R_wg = R_wg0 @ so3.exp(jnp.concatenate([rwg, jnp.zeros(1)]))
        s = jnp.where(fix_scale, 1.0, jnp.exp(log_s))
        return R_wg, s, bg, ba, v

    def residuals(theta):
        R_wg, s, bg, ba, v = unpack(theta)
        g_w = R_wg @ jnp.array([0.0, 0.0, -g_mag])
        p = s * p_w

        def pair(i):
            pre_i = jax.tree.map(lambda x: x[i], pres)
            r = factors.inertial_residual(
                R_wb[i], p[i], v[i], R_wb[i + 1], p[i + 1], v[i + 1],
                bg, ba, pre_i, gravity=g_w)
            info = factors.information_9(pre_i)
            # whiten with cholesky of info
            L = jnp.linalg.cholesky(info + 1e-8 * jnp.eye(9))
            return (L.T @ r) * edge_valid[i]

        rs = jax.vmap(pair)(jnp.arange(K - 1)).reshape(-1)
        prior = jnp.concatenate([
            jnp.sqrt(prior_gyro) * bg, jnp.sqrt(prior_acc) * ba])
        # pin the velocities of bucket-padding states at zero
        pin = (10.0 * (1.0 - state_valid)[:, None] * v).reshape(-1)
        return jnp.concatenate([rs, prior, pin])

    # ---- stage 1: gyro bias from rotation-only alignment --------------
    bg_est = estimate_gyro_bias(R_wb, pres, edge_valid=edge_valid)

    # ---- stage 2: closed-form linear solve for (s, g_w, v_k) ----------
    # ev: R_i^T (v_j - v_i - g dt)                    = dV(bg)
    # ep: R_i^T (s p_j - s p_i - v_i dt - g dt^2 / 2) = dP(bg)
    # unknowns x = [s, g_w (3), v_0..K-1 (3K)] — all rows linear in x.
    nx = 4 + 3 * K
    dts = jnp.maximum(pres.dT, 1e-3)

    def lin_rows(i):
        pre_i = jax.tree.map(lambda x: x[i], pres)
        dt = dts[i]
        Ri_T = R_wb[i].T
        Av = jnp.zeros((3, nx))
        Av = Av.at[:, 1:4].set(-Ri_T * dt)
        Av = jax.lax.dynamic_update_slice(Av, -Ri_T, (0, 4 + 3 * i))
        Av = jax.lax.dynamic_update_slice(Av, Ri_T, (0, 4 + 3 * (i + 1)))
        bv = pre_mod.delta_velocity(pre_i, bg_est, jnp.zeros(3))
        Ap = jnp.zeros((3, nx))
        Ap = Ap.at[:, 0].set(Ri_T @ (p_w[i + 1] - p_w[i]))
        Ap = Ap.at[:, 1:4].set(-0.5 * Ri_T * dt * dt)
        Ap = jax.lax.dynamic_update_slice(Ap, -Ri_T * dt, (0, 4 + 3 * i))
        bp = pre_mod.delta_position(pre_i, bg_est, jnp.zeros(3))
        m = edge_valid[i]
        return (m * jnp.concatenate([Av, Ap]),
                m * jnp.concatenate([bv, bp]))

    A, b = jax.vmap(lin_rows)(jnp.arange(K - 1))
    A = A.reshape(-1, nx)
    b = b.reshape(-1)
    x = jnp.linalg.lstsq(A, b)[0]
    s_init = jnp.clip(x[0], 0.05, 50.0)
    g_init = x[1:4]
    v_init = x[4:].reshape(K, 3)
    # gravity direction -> rotation seed; override the caller's seed
    g_dir = g_init / jnp.maximum(jnp.linalg.norm(g_init), 1e-9)
    gI = jnp.array([0.0, 0.0, -1.0])
    vx = jnp.cross(gI, g_dir)
    ang = jnp.arctan2(jnp.linalg.norm(vx), jnp.dot(gI, g_dir))
    axis = vx / jnp.maximum(jnp.linalg.norm(vx), 1e-9)
    R_wg0 = so3.exp(axis * ang)

    theta0 = jnp.zeros(9 + 3 * K)
    theta0 = theta0.at[2].set(jnp.where(fix_scale, 0.0, jnp.log(s_init)))
    theta0 = theta0.at[3:6].set(bg_est)
    theta0 = theta0.at[9:].set(v_init.reshape(-1))

    n_var = 9 + 3 * K

    def gn_step(i, state):
        # Solve the damped least-squares step via QR on the stacked
        # [J; sqrt(lam) diag] system: the whitened Jacobian spans ~1e4 in
        # scale, so f32 normal equations (condition = kappa(J)^2) explode —
        # lstsq on J itself keeps the full f32 precision budget.
        theta, lam = state
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        col_norm = jnp.maximum(jnp.linalg.norm(J, axis=0), 1e-6)
        damp = jnp.sqrt(lam) * jnp.diag(col_norm)
        J_aug = jnp.concatenate([J, damp], axis=0)
        r_aug = jnp.concatenate([r, jnp.zeros(n_var)], axis=0)
        q, R_ = jnp.linalg.qr(J_aug)
        d = jax.scipy.linalg.solve_triangular(R_, q.T @ r_aug)
        # trust region: cap the step
        dn = jnp.linalg.norm(d)
        d = d * jnp.minimum(1.0, 50.0 / jnp.maximum(dn, 1e-9))
        theta_new = theta - d
        c_new = jnp.sum(residuals(theta_new) ** 2)
        better = (c_new < jnp.sum(r ** 2)) & jnp.isfinite(c_new)
        theta = jnp.where(better, theta_new, theta)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-8),
                        jnp.minimum(lam * 5.0, 1e6))
        return theta, lam

    theta, _ = jax.lax.fori_loop(0, iters, gn_step, (theta0, jnp.asarray(1e-3)))
    R_wg, s, bg, ba, v = unpack(theta)
    cost = jnp.sum(residuals(theta) ** 2)
    return InertialInitResult(R_wg, s, bg, ba, v, cost)
