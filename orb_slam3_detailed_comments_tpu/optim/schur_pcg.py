"""Atlas-scale global bundle adjustment: matrix-free Schur-complement PCG.

Replaces g2o's sparse BlockSolver path for the big solves
(Optimizer::GlobalBundleAdjustemnt, reference src/Optimizer.cc:2813, run by
LoopClosing::RunGlobalBundleAdjustment, src/LoopClosing.cc:2869). The dense
formulation in optim/ba.py materializes the camera-point coupling
W as a [P, C, 6, 3] tensor and Cholesky-factors the [6C, 6C] Schur system —
fine for local-BA windows, but at Atlas scale (C in the hundreds, P in the
tens of thousands) W alone is gigabytes and the dense factorization is
O(C^3).

This solver never forms W or S. Each LM iteration runs preconditioned
conjugate gradients on the reduced camera system

    S dc = rhs,   S = U_d - W V_d^{-1} W^T,

where every S-matvec is two gathers + two segment-sums over the observation
list (the TPU-native form of g2o's sparse block products):

    t_p   = sum_{o in p} Jp_o^T w_o (Jc_o x_{cam(o)})      # scatter to points
    out_c = sum_{o in c} Jc_o^T w_o (Jp_o (V_d^{-1} t)_{pt(o)})  # to cameras
    S x   = U_d x - out

Preconditioner: the exact block diagonal of S. A point is observed at most
once per camera, so the (c,c) Schur block is U_d,c minus a plain per-
observation sum of K_o V^{-1} K_o^T with K_o = Jc_o^T w_o Jp_o — one more
segment-sum, no cross terms. Memory is O(O + C + P); compute per matvec is
O(O), all batched.

The LM outer loop (damping, accept/reject, two-phase Huber outlier gating,
final chi2 inlier mask) mirrors optim/ba.ba_solve so the two solvers are
drop-in interchangeable; ba.ba_solve routes here automatically above
_PCG_C_MIN cameras.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lie import SE3, se3
from ..models import cameras
from . import reproj
from .ba import BAProblem, BAResult, _inv3x3, _residuals
from .ba import _robust_cost as _ba_robust_cost
from .ba import _damped_blocks

# CG stops at ||r|| <= _CG_RTOL * ||rhs|| (inexact-Newton forcing term) or
# after cg_iters; both loose — LM damping absorbs an imperfect step.
_CG_RTOL = 1e-3
_REL_TOL = 1e-6


def _psum(x, axis):
    """Reduce over the observation-shard mesh axis (no-op single-device).
    Everything reduced this way is replicated state (camera/point blocks),
    so the collective payload is tiny next to the per-obs work."""
    return jax.lax.psum(x, axis) if axis is not None else x


def _robust_cost(prob, cam, delta2, axis=None):
    """ba._robust_cost reduced over the obs-shard axis (identical formula
    by construction — one definition, one psum)."""
    return _psum(_ba_robust_cost(prob, cam, delta2), axis)


def _jc_dot(Jc, x):
    """[O,2,6] x [O,6] -> [O,2] without small-axis einsum loops."""
    return jnp.stack([jnp.sum(Jc[:, 0, :] * x, -1),
                      jnp.sum(Jc[:, 1, :] * x, -1)], axis=-1)


def _jt_dot(J, a):
    """[O,2,k]^T x [O,2] -> [O,k]."""
    return J[:, 0, :] * a[:, :1] + J[:, 1, :] * a[:, 1:2]


def _normal_blocks(r, Jc, Jp, w, obs_cam, obs_pt, C, P, axis=None):
    """U, b_c, V, b_p via segment-sum (the only scatters per iteration)."""
    JcW = Jc * w[:, None, None]
    JpW = Jp * w[:, None, None]
    Uo = (JcW[:, 0, :, None] * Jc[:, 0, None, :]
          + JcW[:, 1, :, None] * Jc[:, 1, None, :])
    U = jax.ops.segment_sum(Uo, obs_cam, num_segments=C)
    b_c = jax.ops.segment_sum(_jt_dot(JcW, r), obs_cam, num_segments=C)
    Vo = (JpW[:, 0, :, None] * Jp[:, 0, None, :]
          + JpW[:, 1, :, None] * Jp[:, 1, None, :])
    V = jax.ops.segment_sum(Vo, obs_pt, num_segments=P)
    b_p = jax.ops.segment_sum(_jt_dot(JpW, r), obs_pt, num_segments=P)
    return (_psum(U, axis), _psum(b_c, axis),
            _psum(V, axis), _psum(b_p, axis))


def _schur_matvec(x, Ud, Vinv, Jc, Jp, w, obs_cam, obs_pt, free,
                  axis=None):
    """S x for x [C,6]; fixed cameras act as identity rows. Under an obs
    shard the per-point partials psum before V^{-1} and the per-camera
    output psums after — two small collectives per matvec."""
    C = Ud.shape[0]
    xf = x * free[:, None]
    a = _jc_dot(Jc, xf[obs_cam]) * w[:, None]              # [O,2]
    tp = _psum(jax.ops.segment_sum(_jt_dot(Jp, a), obs_pt,
                                   num_segments=Vinv.shape[0]), axis)
    y = jnp.einsum("pij,pj->pi", Vinv, tp)
    b = _jc_dot(Jp, y[obs_pt]) * w[:, None]                # [O,2] (Jp y)
    out = _psum(jax.ops.segment_sum(_jt_dot(Jc, b), obs_cam,
                                    num_segments=C), axis)
    Sx = jnp.einsum("cij,cj->ci", Ud, xf) - out
    return Sx * free[:, None] + x * (1.0 - free[:, None])


def _block_jacobi(Ud, Vinv, Jc, Jp, w, obs_cam, obs_pt, free, axis=None):
    """Exact diag blocks of S -> inverted 6x6 preconditioner [C,6,6].

    Exact only single-device: under an obs shard a (cam, pt) pair whose
    observations land on different shards contributes cross terms the
    per-shard sum misses — but pairs are unique (one obs per cam-pt), so
    the psum of per-obs terms IS still the exact diagonal."""
    C = Ud.shape[0]
    # K_o = Jc^T w Jp  [O,6,3]
    JcW = Jc * w[:, None, None]
    K = (JcW[:, 0, :, None] * Jp[:, 0, None, :]
         + JcW[:, 1, :, None] * Jp[:, 1, None, :])
    # unrolled over the tiny axes: the einsum forms are O-batched [6,3]x[3,3]
    # / [6,3]x[3,6] dot_generals paying per-batch MXU latency (see optim/ba.py)
    Vo = Vinv[obs_pt]
    KV = jnp.stack([sum(K[:, :, z] * Vo[:, z, y, None] for z in range(3))
                    for y in range(3)], -1)               # [O, 6, 3]
    KVKt = sum(KV[:, :, None, x] * K[:, None, :, x] for x in range(3))
    D = _psum(jax.ops.segment_sum(KVKt, obs_cam, num_segments=C), axis)
    M = Ud - D
    M = (M * free[:, None, None]
         + jnp.eye(6) * (1.0 - free)[:, None, None])
    # small SPD blocks; jitter for f32 roundoff
    M = M + jnp.eye(6) * (1e-6 * jnp.einsum("cii->c", M)[:, None, None] + 1e-8)
    return jnp.linalg.inv(M)


def _pcg(rhs, Minv, matvec, iters):
    """Standard PCG on S x = rhs; returns x."""
    rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs))
    tol = _CG_RTOL * rhs_norm + 1e-12

    def apply_M(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(s):
        _, r, _, _, k = s
        return (k < iters) & (jnp.sqrt(jnp.sum(r * r)) > tol)

    def body(s):
        x, r, p, rz, k = s
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
        return (x, r, p, rz_new, k + 1)

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return x


def _solve_impl(prob: BAProblem, cam: cameras.CameraParams, iters: int,
                delta2: float, lm_lambda0: float, cg_iters: int,
                axis=None) -> BAResult:
    """Shared body of the single-device and obs-sharded solvers. With
    `axis` set, obs_* fields hold this shard's observations while poses,
    points and masks are replicated; all reductions psum over the axis, so
    every device walks identical LM/CG trajectories (costs, predicates and
    updates are replicated values)."""
    C = prob.kf_R.shape[0]
    P = prob.points.shape[0]
    free = (~prob.fixed_cam).astype(jnp.float32)

    def lm_step(state):
        prb, lam, cost, k, done = state
        r, Jc, Jp, depth_ok = _residuals(prb, cam)
        ok = prb.obs_valid & depth_ok & prb.point_valid[prb.obs_pt]
        chi2 = jnp.sum(r * r, axis=-1) * prb.obs_w
        w = prb.obs_w * reproj.huber_weight(chi2, delta2) * ok

        U, b_c, V, b_p = _normal_blocks(r, Jc, Jp, w, prb.obs_cam,
                                        prb.obs_pt, C, P, axis)
        Ud, Vd = _damped_blocks(U, V, lam)
        Vinv = jnp.where(prb.point_valid[:, None, None], _inv3x3(Vd), 0.0)

        # rhs = b_c - W Vinv b_p, matrix-free
        y = jnp.einsum("pij,pj->pi", Vinv, b_p)
        b = _jc_dot(Jp, y[prb.obs_pt]) * w[:, None]
        rhs = (b_c - _psum(jax.ops.segment_sum(
            _jt_dot(Jc, b), prb.obs_cam, num_segments=C), axis)
        ) * free[:, None]

        matvec = partial(_schur_matvec, Ud=Ud, Vinv=Vinv, Jc=Jc, Jp=Jp, w=w,
                         obs_cam=prb.obs_cam, obs_pt=prb.obs_pt, free=free,
                         axis=axis)
        Minv = _block_jacobi(Ud, Vinv, Jc, Jp, w, prb.obs_cam, prb.obs_pt,
                             free, axis)
        dc = _pcg(rhs, Minv, matvec, cg_iters) * free[:, None]

        # landmark back-substitution: dp = Vinv (b_p - W^T dc)
        a = _jc_dot(Jc, dc[prb.obs_cam]) * w[:, None]
        tp = _psum(jax.ops.segment_sum(_jt_dot(Jp, a), prb.obs_pt,
                                       num_segments=P), axis)
        dp = jnp.einsum("pij,pj->pi", Vinv, b_p - tp)
        dp = jnp.where(prb.point_valid[:, None], dp, 0.0)

        T_new = se3.exp(dc).compose(SE3(prb.kf_R, prb.kf_t))
        cand = prb._replace(kf_R=T_new.R, kf_t=T_new.t,
                            points=prb.points + dp)
        new_cost = _robust_cost(cand, cam, delta2, axis)
        accept = ((new_cost < cost) & jnp.isfinite(new_cost)
                  & jnp.isfinite(dc).all() & jnp.isfinite(dp).all())
        prb = jax.tree.map(
            lambda A, B: jnp.where(accept, A, B) if A.shape == B.shape else A,
            cand, prb)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 4.0, 1e2))
        done = accept & (cost - new_cost <= _REL_TOL * cost + 1e-6)
        cost = jnp.where(accept, new_cost, cost)
        return (prb, lam, cost, k + 1, done)

    def run(prb, n):
        cost0 = _robust_cost(prb, cam, delta2, axis)
        state = (prb, jnp.asarray(lm_lambda0, jnp.float32), cost0,
                 jnp.int32(0), jnp.bool_(False))
        state = jax.lax.while_loop(lambda s: (s[3] < n) & ~s[4],
                                   lm_step, state)
        return state[0], state[2]

    # two-phase Huber/outlier schedule, identical to ba.ba_solve
    n1 = max(iters // 3, 2)
    prob2, _ = run(prob, n1)
    r, _, _, depth_ok = _residuals(prob2, cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob2.obs_w
    prob2 = prob2._replace(
        obs_valid=prob2.obs_valid & depth_ok & (chi2 <= 2.0 * delta2))
    prob2, cost = run(prob2, max(iters - n1, 1))

    Tn = SE3(prob2.kf_R, prob2.kf_t).normalized()
    prob2 = prob2._replace(kf_R=Tn.R)
    r, _, _, depth_ok = _residuals(prob2, cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob2.obs_w
    # prob2.obs_valid carries the mid-solve 2*delta2 gate — matching the
    # COO ba_solve path so the two solvers stay interchangeable at the
    # 128-camera routing boundary
    inlier = prob2.obs_valid & depth_ok & (chi2 <= delta2)
    return BAResult(prob2.kf_R, prob2.kf_t, prob2.points, inlier, cost)


@partial(jax.jit, static_argnames=("cam", "iters", "cg_iters"))
def ba_solve_pcg(prob: BAProblem, cam: cameras.CameraParams, iters: int = 10,
                 delta2: float = reproj.CHI2_MONO, lm_lambda0: float = 1e-4,
                 cg_iters: int = 100) -> BAResult:
    """LM bundle adjustment with an inner Schur-PCG; API-compatible with
    ba.ba_solve. Intended for C beyond the dense solver's reach."""
    return _solve_impl(prob, cam, iters, delta2, lm_lambda0, cg_iters)
