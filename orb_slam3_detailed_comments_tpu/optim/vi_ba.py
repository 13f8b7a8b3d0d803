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
    return _visual_terms_at(prob.R_wb[prob.obs_cam], prob.p_w[prob.obs_cam],
                            prob.points[prob.obs_pt], prob.obs_uv,
                            cam, R_cb, t_cb)


def _visual_terms_at(R_wb, p, X, uv, cam, R_cb, t_cb):
    """Core visual linearization at explicit per-entry (body pose, point,
    measurement) tuples — shared by the O-order path and the [P, d]
    observation-table path."""
    R_bw = jnp.swapaxes(R_wb, -1, -2)
    x_b = jnp.einsum("oij,oj->oi", R_bw, X - p)
    x_c = jnp.einsum("ij,oj->oi", R_cb, x_b) + t_cb
    pred = cameras.project(cam, x_c)
    r = uv - pred
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
        return r, J

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

    # ---- loop-invariant edge quantities, hoisted out of the LM loop ----
    # The 9x9 / 6x6 information inverses depend only on the preintegration
    # covariances, and the H/g placement structure only on edge_i/edge_j —
    # recomputing them per iteration cost ~0.3 ms (batched small inverses)
    # and the 12 tiny scatter-adds they fed another ~1 ms (each scatter op
    # pays fixed TPU overhead regardless of row count; measured).
    info_e = jax.vmap(lambda e: factors.information_9(
        jax.tree.map(lambda x: x[e], prob.edge_pre)))(jnp.arange(E))
    infb_e = jax.vmap(lambda e: factors.bias_walk_information(
        jax.tree.map(lambda x: x[e], prob.edge_pre)))(jnp.arange(E))
    oh_i = jax.nn.one_hot(prob.edge_i, C, dtype=jnp.float32)   # [E, C]
    oh_j = jax.nn.one_hot(prob.edge_j, C, dtype=jnp.float32)
    # pair-state placement Q [E, 24, C*D]: dims 0:15 live at camera i,
    # dims 15:24 at camera j's (dp, dphi, dv) block; H += sum_e Q^T Hee Q
    # and g += sum_e Q^T ge become two flat matmuls instead of scatters
    Q = jnp.concatenate([
        oh_i[:, None, :, None] * jnp.eye(15, D)[None, :, None, :],
        oh_j[:, None, :, None] * jnp.eye(9, D)[None, :, None, :],
    ], axis=1).reshape(E, 24, C * D)
    # bias random-walk Jacobian [E, 6, C*D]: +I6 at j's bias block (9:15),
    # -I6 at i's (rb = bias_j - bias_i)
    E6 = jnp.eye(D)[9:15]                                      # [6, D]
    J_rw = ((oh_j - oh_i)[:, None, :, None]
            * E6[None, :, None, :]).reshape(E, 6, C * D)
    # visual observations re-laid as a dense [P, d=C] table (one scatter,
    # here, once): the per-iteration V/b_p/Wd scatter-adds cost ~0.7 ms at
    # O=8k (see optim/ba.py — same machinery, shared helper). d = C is
    # always safe: a point is observed at most once per camera.
    dT = C
    TL = ba_mod.build_obs_table(prob.obs_pt, prob.obs_cam, prob.obs_uv,
                                prob.obs_w, prob.obs_valid, prob.point_valid,
                                P, C, dT)
    oh2 = TL.onehot.reshape(P * dT, C)
    uv_f = TL.uv_t.reshape(P * dT, 2)
    inval_f = TL.inval.reshape(P * dT)

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
            c = r @ info_e[e] @ r
            c = jnp.where(c <= huber_imu2, c,
                          2.0 * jnp.sqrt(huber_imu2 * jnp.maximum(c, 0.0)) - huber_imu2)
            return jnp.where(pr.edge_valid[e], c, 0.0)

        ci = jnp.sum(jax.vmap(edge_cost)(jnp.arange(E)))
        cp = prior_gyro * jnp.sum(pr.bg ** 2) + prior_acc * jnp.sum(pr.ba ** 2)
        return cv + ci + cp

    def lm_step(state):
        pr, lam, cost = state
        # ---- visual part with Schur elimination -----------------------
        # table-order linearization: per-slot body poses via flat one-hot
        # matmuls, then every reduction is a flat matmul or an unrolled
        # elementwise sum — NO scatters or gathers in the loop (optim/ba.py
        # table path, same forms)
        R_wb_e = ((oh2 @ pr.R_wb.reshape(C, 9)).reshape(P * dT, 3, 3)
                  + jnp.eye(3) * inval_f[:, None, None])
        p_e = (oh2 @ pr.p_w).reshape(P * dT, 3)
        X_e = jnp.broadcast_to(pr.points[:, None, :],
                               (P, dT, 3)).reshape(P * dT, 3)
        r_f, Jc_f, Jp_f, dok_f = _visual_terms_at(
            R_wb_e, p_e, X_e, uv_f, cam, R_cb, t_cb)
        r_t = r_f.reshape(P, dT, 2)
        chi2 = jnp.sum(r_t * r_t, -1) * TL.w_t
        w = TL.w_t * reproj.huber_weight(chi2, delta2) * dok_f.reshape(P, dT)
        wf = w.reshape(P * dT)
        JcW = Jc_f * wf[:, None, None]                     # [P*d, 2, 6]
        G = (JcW[:, 0, :, None] * Jc_f[:, 0, None, :]
             + JcW[:, 1, :, None] * Jc_f[:, 1, None, :]).reshape(P * dT, 36)
        U6 = (oh2.T @ G).reshape(C, 6, 6)
        bc_o = JcW[:, 0, :] * r_f[:, 0, None] + JcW[:, 1, :] * r_f[:, 1, None]
        b6 = oh2.T @ bc_o
        Jp_t = Jp_f.reshape(P, dT, 2, 3)
        JpW = (Jp_t * w[..., None, None]).reshape(P, 2 * dT, 3)
        Ef = Jp_t.reshape(P, 2 * dT, 3)
        rfp = r_t.reshape(P, 2 * dT)
        V = jnp.stack([jnp.stack([(JpW[:, :, x] * Ef[:, :, y]).sum(1)
                                  for y in range(3)], -1)
                       for x in range(3)], -2)             # [P, 3, 3]
        b_p = jnp.stack([(JpW[:, :, x] * rfp).sum(1) for x in range(3)], -1)
        Hm_w = (JcW[:, 0, :, None] * Jp_f[:, 0, None, :]
                + JcW[:, 1, :, None] * Jp_f[:, 1, None, :]).reshape(P, dT, 18)
        Wd = jnp.stack([(TL.onehot * Hm_w[:, :, i, None]).sum(1)
                        for i in range(18)], -1).reshape(P, C, 6, 3)
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
        # block-diag / edge placements ride precomputed one-hot structures
        # (eyeC broadcasts + the Q/J_rw matmuls) — each .at[] scatter-add
        # pays fixed TPU overhead, and the 12 of them cost ~1 ms/iteration
        eyeC = jnp.eye(C)[:, None, :, None]                  # [C,1,C,1]
        H = jnp.zeros((C, D, C, D))
        H = H.at[:, 0:6, :, 0:6].set(S6)
        U6p = jnp.pad(U6, ((0, 0), (0, D - 6), (0, D - 6)))
        H = H + U6p[:, :, None, :] * eyeC
        g = jnp.zeros((C, D))
        g = g.at[:, 0:6].set(rhs6)

        # inertial edges: H += sum_e Q^T Hee Q, g += sum_e Q^T ge
        re, Je = _inertial_terms(pr, gravity)                # [E,9],[E,9,24]
        chi_i = jnp.einsum("ei,eij,ej->e", re, info_e, re)
        w_imu = reproj.huber_weight(chi_i, huber_imu2) * pr.edge_valid
        JtW = jnp.einsum("eki,ekl->eil", Je, info_e) * w_imu[:, None, None]
        Hee = jnp.einsum("eil,elj->eij", JtW, Je)            # [E,24,24]
        ge = -jnp.einsum("eil,el->ei", JtW, re)              # note: e = residual
        R1 = jax.lax.dot_general(Hee, Q, (((2,), (1,)), ((0,), (0,))))
        H = H + jax.lax.dot_general(
            Q, R1, (((0, 1), (0, 1)), ((), ()))).reshape(C, D, C, D)
        g = g + (ge.reshape(1, E * 24) @ Q.reshape(E * 24, C * D)
                 ).reshape(C, D)

        # bias random-walk edges between consecutive KFs (J_rw = +-I6 at
        # the two bias blocks, precomputed): H += J^T W J, g += -J^T W rb
        rb = jnp.concatenate([pr.bg[pr.edge_j] - pr.bg[pr.edge_i],
                              pr.ba[pr.edge_j] - pr.ba[pr.edge_i]], axis=1)
        WB = infb_e * pr.edge_valid[:, None, None]
        R2 = jax.lax.dot_general(WB, J_rw, (((2,), (1,)), ((0,), (0,))))
        H = H + jax.lax.dot_general(
            J_rw, R2, (((0, 1), (0, 1)), ((), ()))).reshape(C, D, C, D)
        WBrb = jnp.einsum("eij,ej->ei", WB, rb)
        g = g - (WBrb.reshape(1, E * 6) @ J_rw.reshape(E * 6, C * D)
                 ).reshape(C, D)

        # bias priors
        Hp = jnp.zeros((D, D))
        Hp = Hp.at[9:12, 9:12].set(prior_gyro * jnp.eye(3))
        Hp = Hp.at[12:15, 12:15].set(prior_acc * jnp.eye(3))
        H = H + Hp[None, :, None, :] * eyeC
        g = g.at[:, 9:12].add(-prior_gyro * pr.bg)
        g = g.at[:, 12:15].add(-prior_acc * pr.ba)

        # damping + fixed cameras
        free = ~pr.fixed_cam
        fmask = free.astype(H.dtype)
        H = H * fmask[:, None, None, None] * fmask[None, None, :, None]
        g = g * fmask[:, None]
        Hm = H.reshape(C * D, C * D)
        diagH = jnp.diag(Hm)
        Hm = Hm + jnp.diag(lam * jnp.maximum(diagH, 1e-3)
                           + (~free)[:, None].astype(H.dtype)
                           .repeat(D, 1).reshape(-1))
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
