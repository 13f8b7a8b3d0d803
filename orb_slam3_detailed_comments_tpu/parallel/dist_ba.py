"""Distributed bundle adjustment over a device mesh.

The reference has no distributed compute at all (SURVEY.md §2.9); this module
is the TPU-native scaling path it lacks: observations are sharded across
devices along the mesh axis "obs", each device assembles its partial normal
equations (U, V, W, rhs) from its observation shard, and the camera-camera
Schur system is reduced with psum over ICI. The dense [6C, 6C] solve is
replicated (C is the local-BA window; tiny next to the reduction).

This is landmark/observation sharding — the SLAM analog of data parallelism
with a model-parallel-style psum reduction of the shared Hessian.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lie import SE3, se3
from ..models import cameras
from ..optim import ba as ba_mod
from ..optim import reproj

OBS_AXIS = "obs"


def _partial_normal_eqs(kf_R, kf_t, points, obs_cam, obs_pt, obs_uv, obs_w,
                        obs_valid, point_valid, cam, delta2):
    """Per-shard assembly of U, b_c, V, b_p, Wd from an observation shard."""
    C = kf_R.shape[0]
    Pn = points.shape[0]
    T = SE3(kf_R[obs_cam], kf_t[obs_cam])
    X = points[obs_pt]
    r, Jc, Jp, depth_ok = reproj.residual_full(T, X, obs_uv, cam)
    ok = obs_valid & depth_ok & point_valid[obs_pt]
    chi2 = jnp.sum(r * r, axis=-1) * obs_w
    w = obs_w * reproj.huber_weight(chi2, delta2) * ok
    JcW = Jc * w[:, None, None]
    JpW = Jp * w[:, None, None]
    # per-obs outer products as explicit 2-term broadcasts: the einsum form
    # ("oki,okj->oij") is an O-batched [6,2]x[2,6] dot_general that pays
    # per-batch MXU latency (see optim/ba.py table path, measured ~3x)
    GU = (JcW[:, 0, :, None] * Jc[:, 0, None, :]
          + JcW[:, 1, :, None] * Jc[:, 1, None, :])
    U = jnp.zeros((C, 6, 6)).at[obs_cam].add(GU)
    b_c = jnp.zeros((C, 6)).at[obs_cam].add(
        JcW[:, 0, :] * r[:, 0, None] + JcW[:, 1, :] * r[:, 1, None])
    GV = (JpW[:, 0, :, None] * Jp[:, 0, None, :]
          + JpW[:, 1, :, None] * Jp[:, 1, None, :])
    V = jnp.zeros((Pn, 3, 3)).at[obs_pt].add(GV)
    b_p = jnp.zeros((Pn, 3)).at[obs_pt].add(
        JpW[:, 0, :] * r[:, 0, None] + JpW[:, 1, :] * r[:, 1, None])
    Wo = (JcW[:, 0, :, None] * Jp[:, 0, None, :]
          + JcW[:, 1, :, None] * Jp[:, 1, None, :])
    Wd = jnp.zeros((Pn, C, 6, 3)).at[obs_pt, obs_cam].add(Wo)
    return U, b_c, V, b_p, Wd


def make_dist_ba_step(mesh: Mesh, cam: cameras.CameraParams,
                      delta2: float = reproj.CHI2_MONO,
                      lm_lambda: float = 1e-4):
    """Build a pjit-compiled single GN/LM iteration with obs sharded on
    `mesh` axis OBS_AXIS. Poses/points replicated; returns updated poses and
    points. Call repeatedly from the host LM loop."""

    def shard_body(kf_R, kf_t, points, obs_cam, obs_pt, obs_uv, obs_w,
                   obs_valid, fixed_cam, point_valid):
        U, b_c, V, b_p, Wd = _partial_normal_eqs(
            kf_R, kf_t, points, obs_cam, obs_pt, obs_uv, obs_w, obs_valid,
            point_valid, cam, delta2)
        # reduce partial normal equations over the observation shards (ICI)
        U = jax.lax.psum(U, OBS_AXIS)
        b_c = jax.lax.psum(b_c, OBS_AXIS)
        V = jax.lax.psum(V, OBS_AXIS)
        b_p = jax.lax.psum(b_p, OBS_AXIS)
        Wd = jax.lax.psum(Wd, OBS_AXIS)

        C = kf_R.shape[0]
        lam = lm_lambda
        Ud = U + lam * jnp.eye(6) * jnp.maximum(
            jnp.einsum("cii->c", U), 1e-3)[:, None, None] / 6.0
        Vd = V + lam * jnp.eye(3) * jnp.maximum(
            jnp.einsum("pii->p", V), 1e-3)[:, None, None] / 3.0
        Vinv = ba_mod._inv3x3(Vd)
        Vinv = jnp.where(point_valid[:, None, None], Vinv, 0.0)
        # Y = W@Vinv per point unrolled over the 3x3 (a P-batched tiny
        # dot_general pays per-batch MXU latency, see optim/ba.py), then the
        # P-contraction for S as ONE flat [6C, 3P] x [3P, 6C] matmul
        Pn_ = Wd.shape[0]
        A = Wd.reshape(Pn_, C * 6, 3)
        Y = jnp.stack([sum(A[:, :, z] * Vinv[:, z, x, None]
                           for z in range(3)) for x in range(3)], -1)
        Yf = Y.transpose(1, 0, 2).reshape(C * 6, Pn_ * 3)
        Wf = A.transpose(1, 0, 2).reshape(C * 6, Pn_ * 3)
        S = (-(Yf @ Wf.T)).reshape(C, 6, C, 6)
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Ud)
        rhs = b_c - (Yf @ b_p.reshape(Pn_ * 3)).reshape(C, 6)
        free = ~fixed_cam
        fmask = free[:, None].astype(S.dtype)
        S = S * fmask[:, :, None, None] * fmask[None, None, :, :]
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(
            jnp.eye(6) * (~free)[:, None, None].astype(S.dtype))
        rhs = rhs * fmask
        Sm = S.reshape(6 * C, 6 * C)
        jitter = 1e-5 * jnp.max(jnp.diag(Sm)) + 1e-3
        dc = jax.scipy.linalg.cho_solve(
            (jax.scipy.linalg.cholesky(Sm + jitter * jnp.eye(6 * C), lower=True),
             True), rhs.reshape(-1)).reshape(C, 6)
        dc = jnp.where(free[:, None], dc, 0.0)
        WTdc = jnp.einsum("pcix,ci->px", Wd, dc)
        dp = jnp.einsum("pxy,py->px", Vinv, b_p - WTdc)
        dp = jnp.where(point_valid[:, None], dp, 0.0)
        T_new = se3.exp(dc).compose(SE3(kf_R, kf_t))
        return T_new.R, T_new.t, points + dp

    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), P(),               # poses/points replicated
                  P(OBS_AXIS), P(OBS_AXIS), P(OBS_AXIS), P(OBS_AXIS),
                  P(OBS_AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def make_frame_parallel_pose_opt(mesh: Mesh, cam: cameras.CameraParams,
                                 axis: str = "frames"):
    """Frame-parallel motion-only optimization: a batch of frames sharded
    across chips (the SLAM analog of the data-parallel axis; per
    BASELINE.json 'tracking runs frames in parallel per chip')."""
    from ..optim import pose_opt

    def one_frame(R0, t0, X, uv, w, valid):
        res = pose_opt.pose_optimization(SE3(R0, t0), X, uv, w, valid, cam)
        return res.T_cw.R, res.T_cw.t, res.n_inliers

    def body(R0, t0, X, uv, w, valid):
        return jax.vmap(one_frame)(R0, t0, X, uv, w, valid)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False)
    return jax.jit(sharded)


def make_dist_viba_solve(mesh: Mesh, cam: cameras.CameraParams,
                         iters: int = 5,
                         prior_gyro: float = 0.0, prior_acc: float = 0.0,
                         fix_points: bool = False):
    """Distributed full-map visual-inertial BA (the sharded FullInertialBA,
    reference: Optimizer.cc:3237 run as the post-loop GBA on inertial maps,
    LoopClosing.cc:2886-2890): visual observations sharded over the mesh
    axis, their partial normal equations psum-reduced over ICI; the
    9-dof preintegration edges, bias random walks and the dense
    [15C, 15C] solve are replicated (tiny next to the visual reduction).

    Returns fn(prob: VIBAProblem, R_cb, t_cb, gravity) -> VIBAResult with
    prob.obs_* length a multiple of mesh devices (pad with obs_valid=False).
    """
    from ..optim import vi_ba, reproj as reproj_mod

    def body(prob, R_cb, t_cb, gravity):
        return vi_ba._solve_impl(
            prob, cam, R_cb, t_cb, gravity, prior_gyro, prior_acc,
            iters, reproj_mod.CHI2_MONO, 1e9, fix_points, axis=OBS_AXIS)

    in_specs = (vi_ba.VIBAProblem(
        R_wb=P(), p_w=P(), v_w=P(), bg=P(), ba=P(),
        points=P(), point_valid=P(),
        obs_cam=P(OBS_AXIS), obs_pt=P(OBS_AXIS), obs_uv=P(OBS_AXIS),
        obs_w=P(OBS_AXIS), obs_valid=P(OBS_AXIS),
        edge_i=P(), edge_j=P(), edge_pre=P(), edge_valid=P(),
        fixed_cam=P()), P(), P(), P())
    out_specs = vi_ba.VIBAResult(
        R_wb=P(), p_w=P(), v_w=P(), bg=P(), ba=P(), points=P(),
        obs_inlier=P(OBS_AXIS), cost=P())
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))


def make_dist_gba_pcg(mesh: Mesh, cam: cameras.CameraParams,
                      iters: int = 10, cg_iters: int = 100,
                      delta2: float = reproj.CHI2_MONO,
                      lm_lambda0: float = 1e-4):
    """Distributed Atlas-scale global BA: the matrix-free Schur-PCG solver
    (optim/schur_pcg.py) with observations sharded over the mesh.

    Unlike make_dist_ba_step this never materializes the [P, C, 6, 3]
    coupling, so it scales to full-Atlas problems; per CG matvec the
    collectives are one [P,3] and one [C,6] psum over ICI — tiny next to
    the O(O) per-obs work each device keeps local. The whole LM loop
    (damping, accept/reject, outlier phases) runs inside one program;
    every device computes identical replicated updates.

    Returns fn(prob: BAProblem) -> BAResult with prob.obs_* length a
    multiple of mesh devices (pad with obs_valid=False).
    """
    from ..optim import schur_pcg

    def body(prob):
        return schur_pcg._solve_impl(prob, cam, iters, delta2, lm_lambda0,
                                     cg_iters, axis=OBS_AXIS)

    in_specs = ba_mod.BAProblem(
        kf_R=P(), kf_t=P(), points=P(),
        obs_cam=P(OBS_AXIS), obs_pt=P(OBS_AXIS), obs_uv=P(OBS_AXIS),
        obs_w=P(OBS_AXIS), obs_valid=P(OBS_AXIS),
        fixed_cam=P(), point_valid=P())
    out_specs = ba_mod.BAResult(
        kf_R=P(), kf_t=P(), points=P(), obs_inlier=P(OBS_AXIS), cost=P())
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(in_specs,),
                                 out_specs=out_specs, check_vma=False))
