"""Visual-inertial bundle adjustment: 15-dof keyframe states.

Replaces Optimizer::LocalInertialBA / FullInertialBA (reference:
src/Optimizer.cc:2203, 3237): each keyframe state is
[dp (3), dphi (3), v (3), bg (3), ba (3)] — body pose in the world frame
(Forster right-multiplicative convention: R_wb <- R_wb Exp(dphi),
p <- p + R_wb dp), velocity, and per-KF biases with random-walk coupling.

Structure per LM iteration:
  * visual reprojection terms (through the body->camera extrinsic) enter the
    pose block analytically; landmarks are Schur-eliminated exactly as in
    optim/ba.py;
  * 9-dof preintegration edges between consecutive keyframes and 6-dof bias
    random-walk edges are linearized with jacfwd over the 30-dim pair state
    (a handful of edges — negligible next to the visual batch) and scattered
    into the [15C, 15C] reduced system;
  * bias priors (priorG/priorA, reference LocalMapping.cc:236-244) close the
    gauge during IMU initialization phases.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..imu import factors
from ..imu.preintegration import Preintegrated, GRAVITY
from ..lie import SE3, so3
from ..models import cameras
from . import ba as ba_mod
from . import reproj

D = 15  # per-KF state dim


class VIBAProblem(NamedTuple):
    # body states (world frame)
    R_wb: jnp.ndarray      # [C, 3, 3]
    p_w: jnp.ndarray       # [C, 3]
    v_w: jnp.ndarray       # [C, 3]
    bg: jnp.ndarray        # [C, 3]
    ba: jnp.ndarray        # [C, 3]
    # landmarks
    points: jnp.ndarray    # [P, 3]
    point_valid: jnp.ndarray
    # visual observations
    obs_cam: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_w: jnp.ndarray
    obs_valid: jnp.ndarray
    # inertial edges i -> i+1 (stacked Preintegrated, leading axis E)
    edge_i: jnp.ndarray    # [E] int32
    edge_j: jnp.ndarray    # [E]
    edge_pre: Preintegrated  # stacked
    edge_valid: jnp.ndarray  # [E]
    fixed_cam: jnp.ndarray   # [C]


class VIBAResult(NamedTuple):
    R_wb: jnp.ndarray
    p_w: jnp.ndarray
    v_w: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray
    cost: jnp.ndarray


def _camera_from_body(R_wb, p_w, R_cb, t_cb):
    """T_cw from body pose: x_c = R_cb R_bw (x_w - p) + t_cb."""
    R_bw = jnp.swapaxes(R_wb, -1, -2)
    R_cw = R_cb @ R_bw
    t_cw = t_cb - jnp.einsum("...ij,...j->...i", R_cw, p_w)
    return R_cw, t_cw


def _visual_terms(prob: VIBAProblem, cam, R_cb, t_cb, delta2):
    """Residuals + Jacobians wrt body-pose perturbation and point."""
    R_wb = prob.R_wb[prob.obs_cam]
    p = prob.p_w[prob.obs_cam]
    X = prob.points[prob.obs_pt]
    R_bw = jnp.swapaxes(R_wb, -1, -2)
    x_b = jnp.einsum("oij,oj->oi", R_bw, X - p)
    x_c = jnp.einsum("ij,oj->oi", R_cb, x_b) + t_cb
    pred = cameras.project(cam, x_c)
    r = prob.obs_uv - pred
    Jproj = cameras.project_jac(cam, x_c)                      # [O, 2, 3]
    # all small-axis matmul chains unrolled (batched [..,2,3]@[..,3,x]
    # lowers to per-entry tiny matmuls, 4x slower in composition; see
    # reproj._twist_jac): JR = Jproj @ R_cb; Jpose = [-I | hat(x_b)] so
    # Jc = JR @ Jpose = -[JR | JR @ (-hat(x_b))] = -_twist_jac(JR, x_b).
    JR = reproj._point_jac(Jproj, R_cb)                         # [O, 2, 3]
    Jc = -reproj._twist_jac(JR, x_b)                            # [O, 2, 6]
    Jp = reproj._point_jac(JR, R_bw)                            # [O, 2, 3]
    depth_ok = x_c[..., 2] > 0.05
    return r, Jc, Jp, depth_ok


def _inertial_terms(prob: VIBAProblem, gravity):
    """Linearize each preintegration edge over the 30-dim pair state."""
    def edge_res(pert, i, j, pre_e):
        dpi, dphii, dvi, dbgi, dbai = (pert[0:3], pert[3:6], pert[6:9],
                                       pert[9:12], pert[12:15])
        dpj, dphij, dvj = pert[15:18], pert[18:21], pert[21:24]
        R_i = prob.R_wb[i] @ so3.exp(dphii)
        p_i = prob.p_w[i] + prob.R_wb[i] @ dpi
        v_i = prob.v_w[i] + dvi
        R_j = prob.R_wb[j] @ so3.exp(dphij)
        p_j = prob.p_w[j] + prob.R_wb[j] @ dpj
        v_j = prob.v_w[j] + dvj
        bg = prob.bg[i] + dbgi
        ba = prob.ba[i] + dbai
        return factors.inertial_residual(R_i, p_i, v_i, R_j, p_j, v_j,
                                         bg, ba, pre_e, gravity)

    def one(e):
        i, j = prob.edge_i[e], prob.edge_j[e]
        pre_e = jax.tree.map(lambda x: x[e], prob.edge_pre)
        z = jnp.zeros(24)
        r = edge_res(z, i, j, pre_e)
        J = jax.jacfwd(edge_res)(z, i, j, pre_e)                # [9, 24]
        info = factors.information_9(pre_e)
        return r, J, info

    return jax.vmap(one)(jnp.arange(prob.edge_i.shape[0]))


@partial(jax.jit, static_argnames=("cam", "iters", "fix_points"))
def vi_ba_solve(prob: VIBAProblem, cam: cameras.CameraParams,
                R_cb: jnp.ndarray, t_cb: jnp.ndarray,
                gravity=GRAVITY,
                prior_gyro: float = 0.0, prior_acc: float = 0.0,
                iters: int = 8, delta2: float = reproj.CHI2_MONO,
                huber_imu2: float = 1e9,
                fix_points: bool = False) -> VIBAResult:
    return _solve_impl(prob, cam, R_cb, t_cb, gravity, prior_gyro, prior_acc,
                       iters, delta2, huber_imu2, fix_points, axis=None)


def _solve_impl(prob: VIBAProblem, cam: cameras.CameraParams,
                R_cb: jnp.ndarray, t_cb: jnp.ndarray,
                gravity, prior_gyro: float, prior_acc: float,
                iters: int, delta2: float, huber_imu2: float,
                fix_points: bool, axis) -> VIBAResult:
    """The LM loop. With `axis` set (inside shard_map), the visual
    observations are a per-device shard: the visual partial normal equations
    and the visual cost are psum-reduced over that mesh axis while the
    (tiny, replicated) inertial edges and the solve itself run identically
    on every device — the same ICI-reduction layout as
    parallel/dist_ba.make_dist_ba_step."""
    C = prob.R_wb.shape[0]
    P = prob.points.shape[0]
    E = prob.edge_i.shape[0]

    def cost_fn(pr):
        R_cw, t_cw = _camera_from_body(pr.R_wb[pr.obs_cam], pr.p_w[pr.obs_cam],
                                       R_cb, t_cb)
        x_c = jnp.einsum("oij,oj->oi", R_cw, pr.points[pr.obs_pt]) + t_cw
        pred = cameras.project(cam, x_c)
        rr = pr.obs_uv - pred
        chi2 = jnp.sum(rr * rr, -1) * pr.obs_w
        ok = pr.obs_valid & (x_c[..., 2] > 0.05) & pr.point_valid[pr.obs_pt]
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2)
        cv = jnp.sum(jnp.where(ok, rho, 0.0))
        if axis is not None:
            cv = jax.lax.psum(cv, axis)

        def edge_cost(e):
            i, j = pr.edge_i[e], pr.edge_j[e]
            pre_e = jax.tree.map(lambda x: x[e], pr.edge_pre)
            r = factors.inertial_residual(
                pr.R_wb[i], pr.p_w[i], pr.v_w[i], pr.R_wb[j], pr.p_w[j],
                pr.v_w[j], pr.bg[i], pr.ba[i], pre_e, gravity)
            info = factors.information_9(pre_e)
            c = r @ info @ r
            c = jnp.where(c <= huber_imu2, c,
                          2.0 * jnp.sqrt(huber_imu2 * jnp.maximum(c, 0.0)) - huber_imu2)
            return jnp.where(pr.edge_valid[e], c, 0.0)

        ci = jnp.sum(jax.vmap(edge_cost)(jnp.arange(E)))
        cp = prior_gyro * jnp.sum(pr.bg ** 2) + prior_acc * jnp.sum(pr.ba ** 2)
        return cv + ci + cp

    def lm_step(state):
        pr, lam, cost = state
        # ---- visual part with Schur elimination -----------------------
        r, Jc, Jp, depth_ok = _visual_terms(pr, cam, R_cb, t_cb, delta2)
        ok = pr.obs_valid & depth_ok & pr.point_valid[pr.obs_pt]
        chi2 = jnp.sum(r * r, -1) * pr.obs_w
        w = pr.obs_w * reproj.huber_weight(chi2, delta2) * ok
        JcW = Jc * w[:, None, None]
        JpW = Jp * w[:, None, None]
        # pose block occupies state dims 0:6 of each KF. Camera-indexed
        # sums ride an [O, C] one-hot matmul (MXU) instead of scatter-adds
        # (see optim/ba.py table path); point-indexed sums stay scatters
        # here (P is large, O modest for inertial windows).
        oh = jax.nn.one_hot(pr.obs_cam, C, dtype=jnp.float32)   # [O, C]
        G = (JcW[:, 0, :, None] * Jc[:, 0, None, :]
             + JcW[:, 1, :, None] * Jc[:, 1, None, :]).reshape(-1, 36)
        U6 = (oh.T @ G).reshape(C, 6, 6)
        bc_o = JcW[:, 0, :] * r[:, 0, None] + JcW[:, 1, :] * r[:, 1, None]
        b6 = oh.T @ bc_o
        V = jnp.zeros((P, 3, 3)).at[pr.obs_pt].add(
            JpW[:, 0, :, None] * Jp[:, 0, None, :]
            + JpW[:, 1, :, None] * Jp[:, 1, None, :])
        b_p = jnp.zeros((P, 3)).at[pr.obs_pt].add(
            JpW[:, 0, :] * r[:, 0, None] + JpW[:, 1, :] * r[:, 1, None])
        Wo = (JcW[:, 0, :, None] * Jp[:, 0, None, :]
              + JcW[:, 1, :, None] * Jp[:, 1, None, :])
        Wd = jnp.zeros((P, C, 6, 3)).at[pr.obs_pt, pr.obs_cam].add(Wo)
        if axis is not None:
            # reduce the visual partials over the observation shards (ICI)
            U6 = jax.lax.psum(U6, axis)
            b6 = jax.lax.psum(b6, axis)
            V = jax.lax.psum(V, axis)
            b_p = jax.lax.psum(b_p, axis)
            Wd = jax.lax.psum(Wd, axis)

        Vd = V + lam * jnp.eye(3) * jnp.maximum(
            jnp.einsum("pii->p", V), 1e-3)[:, None, None] / 3.0
        Vinv = ba_mod._inv3x3(Vd)
        Vinv = jnp.where(pr.point_valid[:, None, None] & (~jnp.asarray(fix_points)),
                         Vinv, 0.0)
        # flat-matmul Schur contraction (see ba._schur_lm_solve). Y = A@Vinv
        # per point is unrolled over the 3x3: the P-batched [C6,3]x[3,3]
        # dot_general lowers to P tiny MXU matmuls whose per-batch latency
        # dominates (measured in optim/ba.py); the 9-term form is one VPU pass.
        A = Wd.reshape(P, C * 6, 3)
        Y = jnp.stack([sum(A[:, :, z] * Vinv[:, z, x, None]
                           for z in range(3)) for x in range(3)], -1)
        Yf = Y.transpose(1, 0, 2).reshape(C * 6, P * 3)
        Wf = A.transpose(1, 0, 2).reshape(C * 6, P * 3)
        S6 = (-(Yf @ Wf.T)).reshape(C, 6, C, 6)              # [C,6,C,6]
        rhs6 = b6 - (Yf @ b_p.reshape(P * 3)).reshape(C, 6)

        # ---- assemble the [C*D, C*D] reduced system -------------------
        H = jnp.zeros((C, D, C, D))
        H = H.at[:, 0:6, :, 0:6].set(S6)
        H = H.at[jnp.arange(C), 0:6, jnp.arange(C), 0:6].add(U6)
        g = jnp.zeros((C, D))
        g = g.at[:, 0:6].set(rhs6)

        # inertial edges
        re, Je, info = _inertial_terms(pr, gravity)          # [E,9],[E,9,24],[E,9,9]
        chi_i = jnp.einsum("ei,eij,ej->e", re, info, re)
        w_imu = reproj.huber_weight(chi_i, huber_imu2) * pr.edge_valid
        JtW = jnp.einsum("eki,ekl->eil", Je, info) * w_imu[:, None, None]
        Hee = jnp.einsum("eil,elj->eij", JtW, Je)            # [E,24,24]
        ge = -jnp.einsum("eil,el->ei", JtW, re)              # note: e = residual
        # scatter: pair layout [i(0:15), j(15:24 -> dp,dphi,v of j)]
        ii, jj = pr.edge_i, pr.edge_j
        H = H.at[ii, :, ii, :].add(Hee[:, 0:15, 0:15])
        H = H.at[jj, 0:9, jj, 0:9].add(Hee[:, 15:24, 15:24])
        H = H.at[ii, :, jj, 0:9].add(Hee[:, 0:15, 15:24])
        H = H.at[jj, 0:9, ii, :].add(Hee[:, 15:24, 0:15])
        g = g.at[ii, :].add(ge[:, 0:15])
        g = g.at[jj, 0:9].add(ge[:, 15:24])

        # bias random-walk edges between consecutive KFs
        def rw_terms(e):
            i, j = pr.edge_i[e], pr.edge_j[e]
            rb = jnp.concatenate([pr.bg[j] - pr.bg[i], pr.ba[j] - pr.ba[i]])
            infb = factors.bias_walk_information(
                jax.tree.map(lambda x: x[e], pr.edge_pre))
            return rb, infb
        rb, infb = jax.vmap(rw_terms)(jnp.arange(E))
        # J: d rb / d (bias_i) = -I6, d/d(bias_j) = +I6
        WB = infb * pr.edge_valid[:, None, None]
        H = H.at[ii, 9:15, ii, 9:15].add(WB)
        H = H.at[jj, 9:15, jj, 9:15].add(WB)
        H = H.at[ii, 9:15, jj, 9:15].add(-WB)
        H = H.at[jj, 9:15, ii, 9:15].add(-WB)
        g = g.at[ii, 9:15].add(jnp.einsum("eij,ej->ei", WB, rb))
        g = g.at[jj, 9:15].add(-jnp.einsum("eij,ej->ei", WB, rb))

        # bias priors
        Hp = jnp.zeros((D, D))
        Hp = Hp.at[9:12, 9:12].set(prior_gyro * jnp.eye(3))
        Hp = Hp.at[12:15, 12:15].set(prior_acc * jnp.eye(3))
        H = H.at[jnp.arange(C), :, jnp.arange(C), :].add(Hp)
        g = g.at[:, 9:12].add(-prior_gyro * pr.bg)
        g = g.at[:, 12:15].add(-prior_acc * pr.ba)

        # damping + fixed cameras
        diagH = jnp.einsum("cdcd->cd", H)
        H = H.at[jnp.arange(C)[:, None], jnp.arange(D)[None, :],
                 jnp.arange(C)[:, None], jnp.arange(D)[None, :]].add(
            lam * jnp.maximum(diagH, 1e-3))
        free = ~pr.fixed_cam
        fmask = free.astype(H.dtype)
        H = H * fmask[:, None, None, None] * fmask[None, None, :, None]
        H = H.at[jnp.arange(C), :, jnp.arange(C), :].add(
            jnp.eye(D) * (~free)[:, None, None].astype(H.dtype))
        g = g * fmask[:, None]

        Hm = H.reshape(C * D, C * D)
        # Jacobi equilibration: IMU information (~1e9) and visual weights
        # (~1) coexist in one f32 system — without symmetric scaling the
        # Cholesky loses every digit. Solve (E H E) y = E g, dx = E y.
        Escale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(Hm), 1e-8))
        Hs = Hm * Escale[:, None] * Escale[None, :]
        jitter = 1e-5
        y = jax.scipy.linalg.cho_solve(
            (jax.scipy.linalg.cholesky(Hs + jitter * jnp.eye(C * D), lower=True),
             True), (g.reshape(-1) * Escale))
        dx = (y * Escale).reshape(C, D)
        dx = jnp.where(free[:, None], dx, 0.0)

        # landmark back-substitution (visual only)
        dc6 = dx[:, 0:6]
        WTdc = jnp.einsum("pcix,ci->px", Wd, dc6)
        dp_pt = jnp.einsum("pxy,py->px", Vinv, b_p - WTdc)

        # apply
        R_new = jax.vmap(lambda R, d: so3.normalize(R @ so3.exp(d)))(
            pr.R_wb, dx[:, 3:6])
        p_new = pr.p_w + jnp.einsum("cij,cj->ci", pr.R_wb, dx[:, 0:3])
        cand = pr._replace(
            R_wb=R_new, p_w=p_new, v_w=pr.v_w + dx[:, 6:9],
            bg=pr.bg + dx[:, 9:12], ba=pr.ba + dx[:, 12:15],
            points=pr.points + dp_pt)
        new_cost = cost_fn(cand)
        accept = (new_cost < cost) & jnp.isfinite(new_cost) & jnp.isfinite(dx).all()
        pr = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b) if a.shape == b.shape else a,
            cand, pr)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 4.0, 1e2))
        cost = jnp.where(accept, new_cost, cost)
        return (pr, lam, cost)

    cost0 = cost_fn(prob)
    state = (prob, jnp.asarray(1e-4, jnp.float32), cost0)
    state = jax.lax.fori_loop(0, iters, lambda i, s: lm_step(s), state)
    pr, _, cost = state

    r, _, _, depth_ok = _visual_terms(pr, cam, R_cb, t_cb, delta2)
    chi2 = jnp.sum(r * r, -1) * pr.obs_w
    inlier = pr.obs_valid & depth_ok & (chi2 <= delta2)
    return VIBAResult(pr.R_wb, pr.p_w, pr.v_w, pr.bg, pr.ba, pr.points,
                      inlier, cost)
