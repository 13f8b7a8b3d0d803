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
    information weights, valid [M] observation mask.

    The inner GN loop exits early once the applied step is below tolerance
    (GN on this problem converges in 2-4 iterations; the remaining
    iterations of the reference's fixed 10 are no-ops to ~1e-8 — measured
    7x faster on-device with the pose unchanged to float precision)."""
    delta2 = reproj.CHI2_MONO
    tol = jnp.float32(1e-8)  # on ||dx||^2, i.e. ||dx|| ~ 1e-4

    def gn_cond(state):
        i, _, _, nd2 = state
        return (i < iters) & (nd2 > tol)

    def gn_iter(state):
        i, T, inlier, _ = state
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
        return (i + 1, SE3(T_new.R, T_new.t), inlier, jnp.sum(dx * dx))

    def round_body(k, state):
        T, inlier = state
        _, T, inlier, _ = jax.lax.while_loop(
            gn_cond, gn_iter, (0, T, inlier, jnp.float32(1.0)))
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

    tol = jnp.float32(1e-8)   # early exit on ||dx||^2 (see pose_optimization)

    def gn_cond(state):
        i = state[0]
        nd2 = state[-1]
        return (i < iters) & (nd2 > tol)

    def gn_iter(state):
        i, R_base, p_base, v_base, inlier, _ = state

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
        return (i + 1, R_base, p_base, v_base, inlier, jnp.sum(dx * dx))

    def round_body(k, state):
        st = jax.lax.while_loop(
            gn_cond, gn_iter, (0,) + state + (jnp.float32(1.0),))
        R_b, p_b, v_b, inlier = st[1:-1]
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


class PriorPoseImu(NamedTuple):
    """Marginalization prior on one frame's 15-dof nav state
    (reference: ConstraintPoseImu / EdgePriorPoseImu, src/G2oTypes.h:820,
    src/G2oTypes.cc:851). Mean = (R_wb, p, v, bg, ba); H is the 15x15
    information in the tangent ordering [phi, dp, dv, dbg, dba]."""
    R_wb: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    H: jnp.ndarray


class PoseInertialLFResult(NamedTuple):
    T_cw: SE3
    v_w: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    inlier: jnp.ndarray
    n_inliers: jnp.ndarray
    prior: PriorPoseImu   # marginal prior ON THE CURRENT frame (next frame's)


def _prior_residual(R, p, v, bg, ba, prior: PriorPoseImu):
    from ..lie import so3 as so3_mod
    return jnp.concatenate([
        so3_mod.log(prior.R_wb.T @ R), p - prior.p, v - prior.v,
        bg - prior.bg, ba - prior.ba])


@partial(jax.jit, static_argnames=("cam", "iters", "rounds"))
def pose_inertial_optimization_last_frame(
        T_cw0: SE3, v0: jnp.ndarray, prior: PriorPoseImu, pre,
        X_w: jnp.ndarray, uv: jnp.ndarray, inv_sigma2: jnp.ndarray,
        valid: jnp.ndarray, cam: cameras.CameraParams, gravity: jnp.ndarray,
        R_cb: jnp.ndarray = None, t_cb: jnp.ndarray = None,
        iters: int = 8, rounds: int = 2) -> PoseInertialLFResult:
    """Visual-inertial motion-only optimization of the CURRENT frame jointly
    with the LAST frame's 15-dof nav state, the latter constrained by the
    running marginalization prior — the reference's steady-state tracking
    optimizer (Optimizer::PoseInertialOptimizationLastFrame,
    src/Optimizer.cc:983: EdgeMonoOnlyPose on frame j, EdgeInertial between
    i,j, EdgeGyroRW/EdgeAccRW, EdgePriorPoseImu on frame i; followed by
    Marginalize() of frame i to produce the next ConstraintPoseImu,
    src/Optimizer.cc:1644). One fused jitted program: GN over the stacked
    30-dof state, chi2 outlier rounds, then Schur marginalization of the
    older frame to emit the next prior."""
    from ..imu import factors
    from ..lie import so3 as so3_mod
    delta2 = reproj.CHI2_MONO
    if R_cb is None:
        R_cb = jnp.eye(3)
    if t_cb is None:
        t_cb = jnp.zeros(3)
    R2b = (R_cb.T @ T_cw0.R).T
    p2b = T_cw0.R.T @ (t_cb - T_cw0.t)
    info9 = factors.information_9(pre)
    L9 = jnp.linalg.cholesky(info9 + 1e-6 * jnp.eye(9))
    L6 = jnp.linalg.cholesky(factors.bias_walk_information(pre)
                             + 1e-6 * jnp.eye(6))
    Hp = 0.5 * (prior.H + prior.H.T) + 1e-4 * jnp.eye(15)
    Lp = jnp.linalg.cholesky(Hp)

    def unpack(x, b):
        (R1b, p1b, v1b, bg1b, ba1b, R2b_, p2b_, v2b, bg2b, ba2b) = b
        return (R1b @ so3_mod.exp(x[0:3]), p1b + x[3:6], v1b + x[6:9],
                bg1b + x[9:12], ba1b + x[12:15],
                R2b_ @ so3_mod.exp(x[15:18]), p2b_ + x[18:21], v2b + x[21:24],
                bg2b + x[24:27], ba2b + x[27:30])

    def visual_residual(R_wb, p_w):
        x_b = (X_w - p_w) @ R_wb
        x_c = x_b @ R_cb.T + t_cb
        uv_hat = cameras.project(cam, x_c)
        return uv_hat - uv, x_c[:, 2] > 0.05

    def whitened_rest(x, b):
        R1, p1, v1, bg1, ba1, R2, p2, v2, bg2, ba2 = unpack(x, b)
        r_i = factors.inertial_residual(R1, p1, v1, R2, p2, v2, bg1, ba1,
                                        pre, gravity)
        r_bw = factors.bias_walk_residual(bg1, ba1, bg2, ba2)
        r_pr = _prior_residual(R1, p1, v1, bg1, ba1, prior)
        return jnp.concatenate([L9.T @ r_i, L6.T @ r_bw, Lp.T @ r_pr])

    def normal_eqs(b, inlier):
        """(H, g) of the full 30-dof system at the current base."""
        x0 = jnp.zeros(30)

        def res_uv(x):
            st = unpack(x, b)
            return visual_residual(st[5], st[6])[0]

        r_uv = res_uv(x0)
        J_uv = jax.jacfwd(res_uv)(x0)
        r_c = whitened_rest(x0, b)
        J_c = jax.jacfwd(whitened_rest)(x0, b)
        depth_ok = visual_residual(b[5], b[6])[1]
        chi2 = jnp.sum(r_uv * r_uv, axis=-1) * inv_sigma2
        w = (inv_sigma2 * reproj.huber_weight(chi2, delta2)
             * (valid & inlier & depth_ok))
        H = jnp.einsum("mki,m,mkj->ij", J_uv, w, J_uv) + J_c.T @ J_c
        g = jnp.einsum("mki,m,mk->i", J_uv, w, r_uv) + J_c.T @ r_c
        return H, g

    tol = jnp.float32(1e-8)   # early exit on ||dx||^2 (see pose_optimization)

    def gn_cond(state):
        return (state[0] < iters) & (state[-1] > tol)

    def gn_iter(state):
        i, b, inlier, _ = state
        H, g = normal_eqs(b, inlier)
        H = H + 1e-5 * jnp.eye(30) * jnp.maximum(jnp.trace(H) / 30.0, 1.0)
        dx = -jnp.linalg.solve(H, g)
        return (i + 1, unpack(dx, b), inlier, jnp.sum(dx * dx))

    def round_body(k, state):
        _, b, inlier, _ = jax.lax.while_loop(
            gn_cond, gn_iter, (0,) + state + (jnp.float32(1.0),))
        r_uv, depth_ok = visual_residual(b[5], b[6])
        chi2 = jnp.sum(r_uv * r_uv, axis=-1) * inv_sigma2
        return (b, (chi2 <= delta2) & depth_ok & valid)

    base0 = (prior.R_wb, prior.p, prior.v, prior.bg, prior.ba,
             R2b, p2b, v0, prior.bg, prior.ba)
    b, inlier = jax.lax.fori_loop(
        0, rounds, round_body, (base0, jnp.ones(X_w.shape[0], jnp.bool_)))

    # Schur-marginalize the older frame: the next frame's prior
    # (reference: Optimizer::Marginalize, src/Optimizer.cc:1644)
    H, _ = normal_eqs(b, inlier)
    H11 = H[0:15, 0:15] + 1e-4 * jnp.eye(15)
    Hm = H[15:30, 15:30] - H[15:30, 0:15] @ jnp.linalg.solve(
        H11, H[0:15, 15:30])
    Hm = 0.5 * (Hm + Hm.T)

    R2, p2, v2, bg2, ba2 = b[5], b[6], b[7], b[8], b[9]
    R2 = so3_mod.normalize(R2)
    R_cw = R_cb @ R2.T
    T = SE3(R_cw, t_cb - R_cw @ p2)
    nxt = PriorPoseImu(R2, p2, v2, bg2, ba2, Hm)
    return PoseInertialLFResult(T, v2, bg2, ba2, inlier,
                                jnp.sum(inlier.astype(jnp.int32)), nxt)


@partial(jax.jit, static_argnames=("cam",))
def build_frame_prior(T_cw: SE3, v_w, bg, ba,
                      R_wb_a, p_a, v_a, pre,
                      X_w, uv, inv_sigma2, inlier,
                      cam: cameras.CameraParams, gravity,
                      R_cb: jnp.ndarray = None,
                      t_cb: jnp.ndarray = None) -> PriorPoseImu:
    """Seed the marginalization prior after an anchored (LastKeyFrame-style)
    optimization: 15x15 information of the just-optimized frame from its
    visual edges + the inertial edge to the (fixed) anchor, evaluated at the
    solution. The bias block uses the window's random-walk information
    (biases were held at the anchor's — see pose_inertial_optimization),
    which is the reference's EdgeGyroRW/EdgeAccRW contribution
    (reference: the mpcpi construction after
    PoseInertialOptimizationLastKeyFrame, src/Optimizer.cc:945-980)."""
    from ..imu import factors
    from ..lie import so3 as so3_mod
    if R_cb is None:
        R_cb = jnp.eye(3)
    if t_cb is None:
        t_cb = jnp.zeros(3)
    R_wb = (R_cb.T @ T_cw.R).T
    p_w = T_cw.R.T @ (t_cb - T_cw.t)
    info9 = factors.information_9(pre)

    def res_uv(x):
        R = R_wb @ so3_mod.exp(x[0:3])
        p = p_w + x[3:6]
        x_b = (X_w - p) @ R
        x_c = x_b @ R_cb.T + t_cb
        return cameras.project(cam, x_c) - uv

    def res_i(x):
        R = R_wb @ so3_mod.exp(x[0:3])
        p = p_w + x[3:6]
        v = v_w + x[6:9]
        return factors.inertial_residual(R_wb_a, p_a, v_a, R, p, v,
                                         bg, ba, pre, gravity)

    x0 = jnp.zeros(9)
    J_uv = jax.jacfwd(res_uv)(x0)          # [N,2,9]
    r_uv = res_uv(x0)
    chi2 = jnp.sum(r_uv * r_uv, axis=-1) * inv_sigma2
    w = inv_sigma2 * reproj.huber_weight(chi2, reproj.CHI2_MONO) * inlier
    J_i = jax.jacfwd(res_i)(x0)            # [9,9]
    H9 = (jnp.einsum("mki,m,mkj->ij", J_uv, w, J_uv)
          + J_i.T @ info9 @ J_i)
    H = jnp.zeros((15, 15))
    H = H.at[0:9, 0:9].set(H9)
    H = H.at[9:15, 9:15].set(factors.bias_walk_information(pre))
    return PriorPoseImu(R_wb, p_w, v_w, jnp.asarray(bg), jnp.asarray(ba), H)
