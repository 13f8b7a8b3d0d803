"""Motion-only pose optimization (tracking hot loop #2).

Replaces Optimizer::PoseOptimization (reference: src/Optimizer.cc:55): 4
rounds x 10 iterations of Gauss-Newton with a Huber kernel, re-classifying
outliers at the chi2(0.95) gate between rounds and re-admitting observations
that recover. Here each GN iteration is a fused batched program (residuals,
6x6 normal equations, solve, retract) and the whole optimization — all rounds
included — is one jittable function, vmappable over frames for multi-chip
frame-parallel tracking.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import SE3, se3
from ..models import cameras
from . import reproj


class PoseOptResult(NamedTuple):
    T_cw: SE3
    inlier: jnp.ndarray   # [M] bool
    n_inliers: jnp.ndarray  # scalar int32


@partial(jax.jit, static_argnames=("cam", "iters", "rounds"))
def pose_optimization(T_cw0: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                      inv_sigma2: jnp.ndarray, valid: jnp.ndarray,
                      cam: cameras.CameraParams,
                      iters: int = 10, rounds: int = 4) -> PoseOptResult:
    """X_w [M,3] world points, uv [M,2] observations, inv_sigma2 [M] per-level
    information weights, valid [M] observation mask."""
    delta2 = reproj.CHI2_MONO

    def gn_iter(i, state):
        T, inlier = state
        r, J, depth_ok = reproj.residual_pose(T, X_w, uv, cam)
        w_info = inv_sigma2 * (valid & inlier & depth_ok)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w_rob = reproj.huber_weight(chi2, delta2)
        w = w_info * w_rob
        H = jnp.einsum("mki,m,mkj->ij", J, w, J)
        b = jnp.einsum("mki,m,mk->i", J, w, r)
        H = H + 1e-5 * jnp.eye(6, dtype=H.dtype) * jnp.maximum(jnp.trace(H) / 6.0, 1.0)
        dx = jnp.linalg.solve(H, b)
        T_new = se3.exp(dx).compose(T)
        return (SE3(T_new.R, T_new.t), inlier)

    def round_body(k, state):
        T, inlier = state
        T, inlier = jax.lax.fori_loop(0, iters, gn_iter, (T, inlier))
        # outlier re-classification at the chi2 gate; outliers can recover
        r, _, depth_ok = reproj.residual_pose(T, X_w, uv, cam)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        inlier = (chi2 <= delta2) & depth_ok & valid
        return (T, inlier)

    T, inlier = jax.lax.fori_loop(
        0, rounds, round_body, (T_cw0, jnp.ones(X_w.shape[0], jnp.bool_)))
    T = T.normalized()
    return PoseOptResult(T, inlier, jnp.sum(inlier.astype(jnp.int32)))


class PoseInertialResult(NamedTuple):
    T_cw: SE3
    v_w: jnp.ndarray      # [3] optimized world velocity
    inlier: jnp.ndarray   # [M] bool
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("cam", "iters", "rounds"))
def pose_inertial_optimization(T_cw0: SE3, v0: jnp.ndarray,
                               R_wb_a: jnp.ndarray, p_a: jnp.ndarray,
                               v_a: jnp.ndarray, bg: jnp.ndarray,
                               ba: jnp.ndarray, pre,
                               X_w: jnp.ndarray, uv: jnp.ndarray,
                               inv_sigma2: jnp.ndarray, valid: jnp.ndarray,
                               cam: cameras.CameraParams,
                               gravity: jnp.ndarray,
                               R_cb: jnp.ndarray = None,
                               t_cb: jnp.ndarray = None,
                               iters: int = 8, rounds: int = 2
                               ) -> PoseInertialResult:
    """Visual-inertial motion-only optimization: the current frame's 9-dof
    nav state (pose + velocity) against its visual matches plus one
    preintegrated edge to a fixed anchor state (the last keyframe or frame)
    (reference: Optimizer::PoseInertialOptimizationLastKeyFrame/LastFrame,
    Optimizer.cc:416/983). R_cb/t_cb: camera-from-body extrinsic (identity
    when omitted). Biases held at the anchor's (the reference optimizes them
    too, constrained by a random-walk edge — with per-frame windows of
    ~50 ms the motion-only bias update is negligible and the local inertial
    BA refines biases anyway).
    """
    from ..imu import factors
    delta2 = reproj.CHI2_MONO
    if R_cb is None:
        R_cb = jnp.eye(3)
    if t_cb is None:
        t_cb = jnp.zeros(3)
    # body init from the camera pose: R_bw = R_cb^T R_cw (R_bc = R_cb^T)
    R_wb0 = (R_cb.T @ T_cw0.R).T
    p0 = T_cw0.R.T @ (t_cb - T_cw0.t)
    info9 = factors.information_9(pre)
    L9 = jnp.linalg.cholesky(info9 + 1e-6 * jnp.eye(9))

    def unpack(x, R_base, p_base, v_base):
        from ..lie import so3 as so3_mod
        R = R_base @ so3_mod.exp(x[0:3])
        return R, p_base + x[3:6], v_base + x[6:9]

    def visual_residual(R_wb, p_w):
        x_b = (X_w - p_w) @ R_wb   # rows: R_bw (X - p)
        x_c = x_b @ R_cb.T + t_cb
        uv_hat = cameras.project(cam, x_c)
        return uv_hat - uv, x_c[:, 2] > 0.05

    def gn_iter(i, state):
        R_base, p_base, v_base, inlier = state

        def res_fn(x):
            R_wb, p_w, v_w = unpack(x, R_base, p_base, v_base)
            r_uv, _ = visual_residual(R_wb, p_w)
            r_i = factors.inertial_residual(
                R_wb_a, p_a, v_a, R_wb, p_w, v_w, bg, ba, pre, gravity)
            return r_uv, L9.T @ r_i

        x0 = jnp.zeros(9)
        r_uv, r_i = res_fn(x0)
        J_uv, J_i = jax.jacfwd(res_fn)(x0)
        _, depth_ok = visual_residual(R_base, p_base)
        chi2 = jnp.sum(r_uv * r_uv, axis=-1) * inv_sigma2
        w = (inv_sigma2 * reproj.huber_weight(chi2, delta2)
             * (valid & inlier & depth_ok))
        H = jnp.einsum("mki,m,mkj->ij", J_uv, w, J_uv) + J_i.T @ J_i
        b = jnp.einsum("mki,m,mk->i", J_uv, w, r_uv) + J_i.T @ r_i
        H = H + 1e-5 * jnp.eye(9) * jnp.maximum(jnp.trace(H) / 9.0, 1.0)
        dx = -jnp.linalg.solve(H, b)
        R_base, p_base, v_base = unpack(dx, R_base, p_base, v_base)
        return (R_base, p_base, v_base, inlier)

    def round_body(k, state):
        state = jax.lax.fori_loop(0, iters, gn_iter, state)
        R_b, p_b, v_b, inlier = state
        r_uv, depth_ok = visual_residual(R_b, p_b)
        chi2 = jnp.sum(r_uv * r_uv, axis=-1) * inv_sigma2
        inlier = (chi2 <= delta2) & depth_ok & valid
        return (R_b, p_b, v_b, inlier)

    R_f, p_f, v_f, inlier = jax.lax.fori_loop(
        0, rounds, round_body,
        (R_wb0, p0, v0, jnp.ones(X_w.shape[0], jnp.bool_)))
    from ..lie import so3 as so3_mod
    R_f = so3_mod.normalize(R_f)
    R_cw = R_cb @ R_f.T
    T = SE3(R_cw, t_cb - R_cw @ p_f)
    return PoseInertialResult(T, v_f, inlier, jnp.sum(inlier.astype(jnp.int32)))
