"""Bundle adjustment: Levenberg-Marquardt with Schur-complement landmark
elimination, fully batched.

Replaces g2o's BlockSolver_6_3 + OptimizationAlgorithmLevenberg pipeline as
used by Optimizer::LocalBundleAdjustment / GlobalBundleAdjustemnt (reference:
src/Optimizer.cc:1740, 2813; Schur trick noted at Optimizer.cc:1972 and
Thirdparty/g2o/g2o/core/block_solver.h). Design:

  * the problem is SoA COO: observations (cam_idx, pt_idx, uv, weight, valid)
    padded to a static size;
  * per-iteration: batched residuals/Jacobians -> segment-sum assembly of
    U (per-camera 6x6), V (per-point 3x3), and the dense [P, C, 6, 3]
    camera-point coupling W -> Schur system S = U - W V^-1 W^T reduced on
    the MXU with one einsum -> dense Cholesky of the [6C, 6C] system ->
    batched back-substitution for landmarks;
  * adaptive LM damping with accept/reject, all inside lax.while-style
    control flow so the entire optimization is a single XLA program.

The dense-W formulation targets local-BA windows (C <= ~64, P <= ~4096):
memory is P*C*18 floats. Global BA at Atlas scale uses the implicit-matvec
PCG variant in optim/schur_pcg.py (same residual code).
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import SE3, se3
from ..models import cameras
from . import reproj


class BAProblem(NamedTuple):
    """Static-shape BA problem. C cameras, P points, O observations."""

    kf_R: jnp.ndarray      # [C, 3, 3] world->camera rotations
    kf_t: jnp.ndarray      # [C, 3]
    points: jnp.ndarray    # [P, 3] world points
    obs_cam: jnp.ndarray   # [O] int32
    obs_pt: jnp.ndarray    # [O] int32
    obs_uv: jnp.ndarray    # [O, 2]
    obs_w: jnp.ndarray     # [O] information (1/sigma^2)
    obs_valid: jnp.ndarray  # [O] bool
    fixed_cam: jnp.ndarray  # [C] bool — poses held constant
    point_valid: jnp.ndarray  # [P] bool


class BAResult(NamedTuple):
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # [O] bool after the final chi2 gate
    cost: jnp.ndarray        # final robust cost


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (MXU-free, VPU friendly)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _residuals(prob: BAProblem, cam: cameras.CameraParams):
    T = SE3(prob.kf_R[prob.obs_cam], prob.kf_t[prob.obs_cam])
    X = prob.points[prob.obs_pt]
    return reproj.residual_full(T, X, prob.obs_uv, cam)


def _robust_cost(prob, cam, delta2):
    r, _, _, depth_ok = _residuals(prob, cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_w
    ok = prob.obs_valid & depth_ok
    # Huber rho(chi2)
    rho = jnp.where(chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2)
    return jnp.sum(jnp.where(ok, rho, 0.0))


def _damped_blocks(U, V, lam):
    """Trace-scaled LM damping of the camera/point diagonal blocks (shared
    with the Schur-PCG solver — the two must stay numerically identical
    for the solver routing at _PCG_C_MIN to be behavior-neutral)."""
    Ud = U + lam * jnp.eye(6) * jnp.maximum(
        jnp.einsum("cii->c", U), 1e-3)[:, None, None] / 6.0
    Vd = V + lam * jnp.eye(3) * jnp.maximum(
        jnp.einsum("pii->p", V), 1e-3)[:, None, None] / 3.0
    return Ud, Vd


def _schur_lm_solve(U, b_c, V, b_p, Wd, lam, fixed_cam, point_valid):
    """Damped Schur reduction + dense Cholesky + landmark back-substitution.
    Shared by the COO and table assembly paths."""
    C = U.shape[0]
    Ud, Vd = _damped_blocks(U, V, lam)
    Vinv = _inv3x3(Vd)
    Vinv = jnp.where(point_valid[:, None, None], Vinv, 0.0)

    # Schur reduction (MXU): S = U - W V^-1 W^T, rhs = b_c - W V^-1 b_p.
    # The P-contraction runs as one flat [6C, 3P] x [3P, 6C] matmul — the
    # cidj einsum form lowers to padded small-axis loops.
    P = Wd.shape[0]
    A = Wd.reshape(P, C * 6, 3)
    # Y = A @ Vinv per point, unrolled over the 3x3: a P-batched [C6,3]x[3,3]
    # dot_general lowers to P tiny MXU matmuls whose per-batch latency alone
    # costs ~0.3 ms at P=4096 (measured); the 9-term elementwise form fuses
    # into one VPU pass.
    Y = jnp.stack([sum(A[:, :, z] * Vinv[:, z, x, None] for z in range(3))
                   for x in range(3)], -1)         # [P, C*6, 3]
    Yf = Y.transpose(1, 0, 2).reshape(C * 6, P * 3)
    Wf = A.transpose(1, 0, 2).reshape(C * 6, P * 3)
    S = (-(Yf @ Wf.T)).reshape(C, 6, C, 6)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Ud)
    rhs = b_c - (Yf @ b_p.reshape(P * 3)).reshape(C, 6)

    # fixed cameras: identity rows/cols, zero rhs
    free = ~fixed_cam
    fmask = free[:, None].astype(S.dtype)          # [C,1]
    S = S * fmask[:, :, None, None] * fmask[None, None, :, :]
    eye_fix = jnp.eye(6) * (~free)[:, None, None].astype(S.dtype)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(eye_fix)
    rhs = rhs * fmask

    Sm = S.reshape(6 * C, 6 * C)
    # Schur reduction in f32 leaves O(eps * ||S||) asymmetry/indefiniteness;
    # jitter must scale with the spectrum or Cholesky fails at small lambda.
    jitter = 1e-5 * jnp.max(jnp.diag(Sm)) + 1e-3
    dc = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(Sm + jitter * jnp.eye(6 * C), lower=True),
         True),
        rhs.reshape(-1)).reshape(C, 6)
    dc = jnp.where(free[:, None], dc, 0.0)

    # back-substitute landmarks: dp = Vinv (b_p - W^T dc)
    WTdc = jnp.einsum("pcix,ci->px", Wd, dc)
    dp = jnp.einsum("pxy,py->px", Vinv, b_p - WTdc)
    dp = jnp.where(point_valid[:, None], dp, 0.0)
    return dc, dp


# Relative cost decrease below which an ACCEPTED LM step ends the solve
# early (GN/LM converges in a handful of iterations on tracking-grade
# problems; the remaining fixed iterations are numerically inert).
_REL_TOL = 1e-6

# Above this camera count the [P, d=C] observation tables (and the [P,d,C]
# one-hot) outgrow their win; fall back to COO scatter assembly (global BA).
_TABLE_C_MAX = 48

# Route the table tier through the packed 'entries-on-lanes' LM body
# (optim/ba_packed.py): measured 1.67x on the deployed local-BA solve
# (387.6 -> 232.0 us/LM-iteration on one v5e chip, scripts/ab_ba_packed.py)
# with identical cost and 100% inlier agreement. TPU-only: the packing is
# a 128-lane-axis layout argument, and on XLA:CPU the same scalar-array
# graph measures 2.07x SLOWER than the einsum form (8.3 s vs 4.0 s per
# 9-iter solve at C=16/P=2048) — so CPU (the test mesh) keeps the
# reference path, whose semantics tests/test_ba_packed.py pins the packed
# body against. None = resolve from jax.default_backend() on first use
# (lazy: importing this module must not force backend init); set
# True/False explicitly to override.
USE_PACKED = None


def _use_packed() -> bool:
    global USE_PACKED
    if USE_PACKED is None:
        USE_PACKED = jax.default_backend() == "tpu"
    return USE_PACKED

# Above this camera count even the COO path's dense [P, C, 6, 3] coupling
# and [6C, 6C] Cholesky are untenable (gigabytes / O(C^3)); route to the
# matrix-free Schur-PCG solver in optim/schur_pcg.py.
_PCG_C_MIN = 128


class ObsTable(NamedTuple):
    """Dense [P, d] observation-table layout (see _ba_solve_tables).

    tab: [P, d] obs id or -1; tvalid: [P, d]; cam_t: [P, d] camera per slot;
    uv_t: [P, d, 2]; w_t: [P, d] (0 on padding / invalid points);
    onehot: [P, d, C] camera one-hot (0 rows on padding); inval: [P, d]
    float 1.0 on padding; pos: [O] flat table slot per obs (P*d = absent).
    """
    tab: jnp.ndarray
    tvalid: jnp.ndarray
    cam_t: jnp.ndarray
    uv_t: jnp.ndarray
    w_t: jnp.ndarray
    onehot: jnp.ndarray
    inval: jnp.ndarray
    pos: jnp.ndarray


def build_obs_table(obs_pt, obs_cam, obs_uv, obs_w, obs_valid, point_valid,
                    P: int, C: int, d: int) -> ObsTable:
    """Re-lay observations as a dense [P, d] table (one scatter, done once;
    the per-iteration assembly then has no scatters or gathers at all)."""
    O = obs_pt.shape[0]
    pt = jnp.where(obs_valid, obs_pt, P)               # invalid -> dump row
    order = jnp.argsort(pt)
    pt_s = pt[order]
    starts = jnp.searchsorted(pt_s, jnp.arange(P))
    rank = jnp.arange(O, dtype=jnp.int32) - starts[jnp.clip(pt_s, 0, P - 1)]
    rank = jnp.where(pt_s < P, rank, d)                # invalid -> dump col
    tab = jnp.full((P + 1, d + 1), -1, jnp.int32).at[
        jnp.minimum(pt_s, P), jnp.clip(rank, 0, d)].set(order)
    tab = tab[:P, :d]                                  # [P, d] obs id or -1
    tvalid = tab >= 0
    # inverse mapping obs id -> flat table slot (P*d = "not in table"):
    # built once here so inlier classification is a gather in O-order
    # instead of a [P*d] scatter whose shared dump row serializes
    in_tab = (pt_s < P) & (rank < d)
    flat_slot = jnp.minimum(pt_s, P - 1) * d + jnp.clip(rank, 0, d - 1)
    pos = jnp.full(O, P * d, jnp.int32).at[order].set(
        jnp.where(in_tab, flat_slot, P * d).astype(jnp.int32))
    idx = jnp.maximum(tab, 0)
    cam_t = jnp.where(tvalid, obs_cam[idx], 0)
    uv_t = obs_uv[idx]
    w_t = jnp.where(tvalid & point_valid[:, None], obs_w[idx], 0.0)
    onehot = (jax.nn.one_hot(cam_t, C, dtype=jnp.float32)
              * tvalid[..., None].astype(jnp.float32))  # [P, d, C]
    inval = (~tvalid).astype(jnp.float32)
    return ObsTable(tab, tvalid, cam_t, uv_t, w_t, onehot, inval, pos)


@partial(jax.jit, static_argnames=("P", "C", "d"))
def _build_obs_table_jit(obs_pt, obs_cam, obs_uv, obs_w, obs_valid,
                         point_valid, P: int, C: int, d: int) -> ObsTable:
    return build_obs_table(obs_pt, obs_cam, obs_uv, obs_w, obs_valid,
                           point_valid, P, C, d)


def table_depth_of(prob: BAProblem, table_depth: int = 0) -> int:
    C = int(prob.kf_R.shape[0])
    return min(table_depth, C) if table_depth > 0 else C


def prepare_table(prob: BAProblem, table_depth: int = 0) -> ObsTable:
    """Build the dense observation table as its OWN device program.

    Two reasons (both measured, scripts/profile_ba_trace.py):
    - the argsort + binary-search construction costs ~1.3 ms and depends
      only on the problem STRUCTURE — loops that re-solve the same problem
      (chunked/2-round GBA) reuse it instead of rebuilding every call;
    - fused into the solve program, the sort's layout choices propagate
      into the LM loop and poison every downstream op (the same
      residual+product sweep measures ~46 us standalone vs ~470 us inside
      the fused program). A jit boundary resets layouts to defaults.
    """
    C = int(prob.kf_R.shape[0])
    P = int(prob.points.shape[0])
    d = table_depth_of(prob, table_depth)
    tab = _build_obs_table_jit(prob.obs_pt, prob.obs_cam, prob.obs_uv,
                               prob.obs_w, prob.obs_valid, prob.point_valid,
                               P=P, C=C, d=d)
    # under-sized buckets must fail LOUDLY in debug runs: a valid
    # observation that overflows the static depth (pos == P*d) is never
    # solved against yet is reported as an inlier (the deliberate
    # degrade-not-detach semantics above) — silent at runtime otherwise.
    # build_ba_problem sizes d from the true per-point max, so this only
    # fires for direct callers passing an explicit table_depth (ADVICE r4).
    if os.environ.get("ORB_TPU_DEBUG_CHECKS"):
        n_over = int(np.asarray(
            ((tab.pos == P * d) & np.asarray(prob.obs_valid)).sum()))
        assert n_over == 0, (
            f"obs table depth {d} overflows: {n_over} valid observations "
            f"exceed the per-point bucket (raise table_depth)")
    return tab


def _ba_solve_tables(prob: BAProblem, cam: cameras.CameraParams, iters: int,
                     delta2: float, lm_lambda0: float,
                     table_depth: int = 0, table: ObsTable = None) -> BAResult:
    """LM-BA with observations re-laid-out as a dense [P, d] table.

    XLA scatter-adds (the COO path's U/V/W assembly) cost ~5 ms/iteration
    at local-BA sizes on TPU; in table layout every per-iteration reduction
    is a dense einsum (points on rows, observing cameras on a padded depth
    axis, per-camera aggregation through a precomputed one-hot) — no
    scatters or gathers inside the LM loop at all. A point is observed at
    most once per camera so d = C is always safe; callers that know the
    true max observations per point pass it as table_depth (typically 4-8
    vs C=16-48: every [P, d, ...] tensor and both residual sweeps shrink
    by the same factor).
    """
    C = prob.kf_R.shape[0]
    P = prob.points.shape[0]
    O = prob.obs_pt.shape[0]
    d = min(table_depth, C) if table_depth > 0 else C

    # ---- one-time table construction (see prepare_table; vi_ba passes
    # none and builds inline) ----
    TL = table if table is not None else build_obs_table(
        prob.obs_pt, prob.obs_cam, prob.obs_uv, prob.obs_w,
        prob.obs_valid, prob.point_valid, P, C, d)
    tab, tvalid, uv_t, w_t0 = TL.tab, TL.tvalid, TL.uv_t, TL.w_t
    onehot, inval, pos = TL.onehot, TL.inval, TL.pos

    def residuals(kf_R, kf_t, points):
        # per-entry poses via one-hot einsum (exact: single nonzero per row);
        # invalid entries get the identity pose at z=1 so no NaN leaks into
        # the 0-weighted sums
        R_e = (jnp.einsum("pdc,cij->pdij", onehot, kf_R)
               + jnp.eye(3) * inval[..., None, None])
        t_e = (jnp.einsum("pdc,ci->pdi", onehot, kf_t)
               + jnp.array([0.0, 0.0, 1.0]) * inval[..., None])
        X = jnp.broadcast_to(points[:, None, :], (P, d, 3))
        T = SE3(R_e.reshape(-1, 3, 3), t_e.reshape(-1, 3))
        r, Jc, Jp, depth_ok = reproj.residual_full(
            T, X.reshape(-1, 3), uv_t.reshape(-1, 2), cam)
        return (r.reshape(P, d, 2), Jc.reshape(P, d, 2, 6),
                Jp.reshape(P, d, 2, 3), depth_ok.reshape(P, d))

    def chi2_sweep(kf_R, kf_t, points):
        """Forward-only per-entry chi2 + depth gate (NO Jacobians): the two
        out-of-loop outlier gates only classify, and the jacfwd-bearing
        residuals() sweep costs ~470 us vs ~60 us for this on the device
        trace (scripts/profile_ba_trace.py)."""
        R_e = (jnp.einsum("pdc,cij->pdij", onehot, kf_R)
               + jnp.eye(3) * inval[..., None, None])
        t_e = (jnp.einsum("pdc,ci->pdi", onehot, kf_t)
               + jnp.array([0.0, 0.0, 1.0]) * inval[..., None])
        pc = jnp.einsum("pdij,pj->pdi", R_e, points) + t_e
        pred = cameras.project(cam, pc.reshape(-1, 3)).reshape(P, d, 2)
        r = uv_t - pred
        return jnp.sum(r * r, axis=-1), pc[..., 2] > 0.05

    def robust_cost(kf_R, kf_t, points, w_t):
        R_e = (jnp.einsum("pdc,cij->pdij", onehot, kf_R)
               + jnp.eye(3) * inval[..., None, None])
        t_e = (jnp.einsum("pdc,ci->pdi", onehot, kf_t)
               + jnp.array([0.0, 0.0, 1.0]) * inval[..., None])
        pc = jnp.einsum("pdij,pj->pdi", R_e, points) + t_e
        pred = cameras.project(cam, pc.reshape(-1, 3)).reshape(P, d, 2)
        r = uv_t - pred
        chi2 = jnp.sum(r * r, axis=-1) * w_t
        ok = (w_t > 0) & (pc[..., 2] > 0.05)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0))
                        - delta2)
        return jnp.sum(jnp.where(ok, rho, 0.0))

    oh2 = onehot.reshape(P * d, C)

    def lm_step(state):
        kf_R, kf_t, points, w_t, lam, cost, k, done = state
        r, Jc, Jp, depth_ok = residuals(kf_R, kf_t, points)
        chi2 = jnp.sum(r * r, axis=-1) * w_t
        w = w_t * reproj.huber_weight(chi2, delta2) * depth_ok

        # Assembly as FLAT matmuls: einsums with 6/3-sized free axes lower
        # to padded VPU loops (~15x slower, measured); reshaping so the
        # contraction is a [C or P, big] matmul puts them on the MXU.
        JcW = (Jc * w[..., None, None]).reshape(P * d, 2, 6)
        Jcf = Jc.reshape(P * d, 2, 6)
        Jpf = Jp.reshape(P * d, 2, 3)
        rf = r.reshape(P * d, 2)
        G = (JcW[:, 0, :, None] * Jcf[:, 0, None, :]
             + JcW[:, 1, :, None] * Jcf[:, 1, None, :]).reshape(P * d, 36)
        U = (oh2.T @ G).reshape(C, 6, 6)
        bc_o = JcW[:, 0, :] * rf[:, 0, None] + JcW[:, 1, :] * rf[:, 1, None]
        b_c = oh2.T @ bc_o

        # V/b_p/Wd: the natural P-batched dot_generals ([3,2d]x[2d,3] etc.)
        # lower to P tiny MXU matmuls — per-batch latency alone costs
        # ~0.7 ms/iteration at P=4096 (measured); unrolled elementwise
        # multiply+reduce forms fuse into a few VPU passes (3x whole-step).
        # Reductions stay in the native [P, d, 2, .] layout: merging (d, 2)
        # into one axis forced a physical copy+reshape of every [P*d, 2, 3]
        # operand inside the LM body (~130 us/iteration of pure data
        # movement on the device trace; see scripts/profile_ba_trace.py).
        JpW4 = Jp * w[..., None, None]                   # [P, d, 2, 3]
        V = jnp.stack([jnp.stack([(JpW4[..., x] * Jp[..., y]).sum((1, 2))
                                  for y in range(3)], -1)
                       for x in range(3)], -2)           # [P, 3, 3]
        b_p = jnp.stack([(JpW4[..., x] * r).sum((1, 2)) for x in range(3)],
                        -1)

        Hm = (JcW[:, 0, :, None] * Jpf[:, 0, None, :]
              + JcW[:, 1, :, None] * Jpf[:, 1, None, :]).reshape(P, d, 18)
        Wd = jnp.stack([(onehot * Hm[:, :, i, None]).sum(1)
                        for i in range(18)], -1).reshape(P, C, 6, 3)

        dc, dp = _schur_lm_solve(U, b_c, V, b_p, Wd, lam,
                                 prob.fixed_cam, prob.point_valid)

        T_new = se3.exp(dc).compose(SE3(kf_R, kf_t))
        pts_new = points + dp
        new_cost = robust_cost(T_new.R, T_new.t, pts_new, w_t)
        accept = ((new_cost < cost) & jnp.isfinite(new_cost)
                  & jnp.isfinite(dc).all() & jnp.isfinite(dp).all())
        kf_R = jnp.where(accept, T_new.R, kf_R)
        kf_t = jnp.where(accept, T_new.t, kf_t)
        points = jnp.where(accept, pts_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 4.0, 1e2))
        done = accept & (cost - new_cost <= _REL_TOL * cost + 1e-6)
        cost = jnp.where(accept, new_cost, cost)
        return (kf_R, kf_t, points, w_t, lam, cost, k + 1, done)

    def run(kf_R, kf_t, points, w_t, n):
        cost0 = robust_cost(kf_R, kf_t, points, w_t)
        state = (kf_R, kf_t, points, w_t,
                 jnp.asarray(lm_lambda0, jnp.float32), cost0,
                 jnp.int32(0), jnp.bool_(False))
        state = jax.lax.while_loop(
            lambda s: (s[6] < n) & ~s[7], lm_step, state)
        return state[0], state[1], state[2], state[5]

    # Phase 1 (reference LocalBundleAdjustment: 5 iters with Huber), then
    # drop gross outliers at the chi2 gate, then phase 2 on survivors.
    n1 = max(iters // 3, 2)
    kf_R, kf_t, points, _ = run(prob.kf_R, prob.kf_t, prob.points, w_t0, n1)
    err2, depth_ok = chi2_sweep(kf_R, kf_t, points)
    chi2 = err2 * w_t0
    w_t = jnp.where(depth_ok & (chi2 <= 2.0 * delta2), w_t0, 0.0)
    kf_R, kf_t, points, cost = run(kf_R, kf_t, points, w_t,
                                   max(iters - n1, 1))

    # final renormalization + chi2 gate in O-order (reference erases obs >
    # chi2 threshold after LocalBundleAdjustment, Optimizer.cc:2040-2100)
    Tn = SE3(kf_R, kf_t).normalized()
    kf_R = Tn.R
    err2, depth_ok = chi2_sweep(kf_R, kf_t, points)
    chi2 = err2 * w_t0
    ok_t = tvalid & depth_ok & (chi2 <= delta2) & (w_t0 > 0)
    # pad slot P*d is True: a VALID observation that overflowed the static
    # table depth (rank >= d) was never solved against, so an under-sized
    # table_depth degrades to a weaker solve — NOT to silently detaching
    # (and potentially killing) the overflow observations as outliers
    ok_flat = jnp.concatenate([ok_t.reshape(P * d),
                               jnp.ones(1, bool)])     # [P*d + 1]
    inlier = ok_flat[pos] & prob.obs_valid
    return BAResult(kf_R, kf_t, points, inlier, cost)


@partial(jax.jit, static_argnames=("cam", "iters", "table_depth"))
def _ba_solve_tables_jit(prob: BAProblem, table: ObsTable,
                         cam: cameras.CameraParams, iters: int,
                         delta2: float, lm_lambda0: float,
                         table_depth: int) -> BAResult:
    return _ba_solve_tables(prob, cam, iters, delta2, lm_lambda0,
                            table_depth, table=table)


@partial(jax.jit, static_argnames=("cam", "iters", "table_depth"))
def ba_solve_fused(prob: BAProblem, cam: cameras.CameraParams,
                   iters: int = 10, delta2: float = reproj.CHI2_MONO,
                   lm_lambda0: float = 1e-4,
                   table_depth: int = 0) -> BAResult:
    """Build + solve as ONE program (the pre-split form), same routing as
    ba_solve. The racing async-GBA worker uses this: one dispatch per
    chunk from the background thread. The split form's extra dispatches
    from a non-main thread made XLA:CPU's concurrency abort reproducible
    (three threads executing/dispatching; see LoopCloser._gba_worker) —
    the fused single-dispatch form ran stably that way for two rounds.
    Main-thread callers should prefer ba_solve (the jit split keeps the
    table build's layouts out of the LM loop and reuses tables across
    rounds)."""
    C = prob.kf_R.shape[0]
    if C <= _TABLE_C_MAX:
        if _use_packed():
            from . import ba_packed
            return ba_packed.ba_solve_packed(prob, cam, iters, delta2,
                                             lm_lambda0, table_depth)
        return _ba_solve_tables(prob, cam, iters, delta2, lm_lambda0,
                                table_depth)
    if C > _PCG_C_MIN:
        from . import schur_pcg
        return schur_pcg.ba_solve_pcg(prob, cam, iters, delta2, lm_lambda0)
    return _ba_solve_coo(prob, cam, iters, delta2, lm_lambda0)


def ba_solve(prob: BAProblem, cam: cameras.CameraParams, iters: int = 10,
             delta2: float = reproj.CHI2_MONO, lm_lambda0: float = 1e-4,
             max_points_dense: int = 0, table_depth: int = 0,
             table: ObsTable = None) -> BAResult:
    """Run LM-BA; returns updated poses/points and the final inlier mask.

    table_depth: static depth of the dense observation table (0 = C). The
    caller can pass the true max-observations-per-point (bucketed, see
    build_ba_problem) to shrink every per-iteration tensor by C/d — points
    observed by more than table_depth cameras would have the excess
    observations silently dropped, so callers must bucket >= the true max.

    table: optional prebuilt observation table (prepare_table). It depends
    only on the problem STRUCTURE, so callers that re-solve with updated
    states (GBA rounds/chunks) pass it once; when absent, the build runs
    as its own program anyway — the jit boundary keeps the sort's layout
    choices out of the LM loop (see prepare_table).
    """
    C = int(prob.kf_R.shape[0])
    if C <= _TABLE_C_MAX:
        if table is None:
            table = prepare_table(prob, table_depth)
        if _use_packed():
            from . import ba_packed
            return ba_packed.ba_solve_packed_jit(
                prob, table, cam, iters, delta2, lm_lambda0,
                table_depth_of(prob, table_depth))
        return _ba_solve_tables_jit(
            prob, table, cam, iters, delta2, lm_lambda0,
            table_depth_of(prob, table_depth))
    if C > _PCG_C_MIN:
        from . import schur_pcg  # local import: schur_pcg imports this module
        return schur_pcg.ba_solve_pcg(prob, cam, iters, delta2, lm_lambda0)
    return _ba_solve_coo(prob, cam, iters, delta2, lm_lambda0)


@partial(jax.jit, static_argnames=("cam", "iters"))
def _ba_solve_coo(prob: BAProblem, cam: cameras.CameraParams, iters: int,
                  delta2: float, lm_lambda0: float) -> BAResult:
    """COO scatter-add fallback for mid-size C (table too wide, PCG not
    yet warranted)."""
    C = prob.kf_R.shape[0]
    P = prob.points.shape[0]

    def lm_step(state):
        prob, lam, cost = state
        r, Jc, Jp, depth_ok = _residuals(prob, cam)
        ok = prob.obs_valid & depth_ok & prob.point_valid[prob.obs_pt]
        chi2 = jnp.sum(r * r, axis=-1) * prob.obs_w
        w = prob.obs_w * reproj.huber_weight(chi2, delta2) * ok

        # weighted blocks per observation — explicit 2-term broadcasts; the
        # einsum form is an O-batched tiny dot_general paying per-batch MXU
        # latency (see the table path / DESIGN.md)
        JcW = Jc * w[:, None, None]
        JpW = Jp * w[:, None, None]
        U = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
            JcW[:, 0, :, None] * Jc[:, 0, None, :]
            + JcW[:, 1, :, None] * Jc[:, 1, None, :])
        b_c = jnp.zeros((C, 6)).at[prob.obs_cam].add(
            JcW[:, 0, :] * r[:, 0, None] + JcW[:, 1, :] * r[:, 1, None])
        V = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
            JpW[:, 0, :, None] * Jp[:, 0, None, :]
            + JpW[:, 1, :, None] * Jp[:, 1, None, :])
        b_p = jnp.zeros((P, 3)).at[prob.obs_pt].add(
            JpW[:, 0, :] * r[:, 0, None] + JpW[:, 1, :] * r[:, 1, None])
        Wo = (JcW[:, 0, :, None] * Jp[:, 0, None, :]
              + JcW[:, 1, :, None] * Jp[:, 1, None, :])     # [O, 6, 3]
        Wd = jnp.zeros((P, C, 6, 3)).at[prob.obs_pt, prob.obs_cam].add(Wo)

        dc, dp = _schur_lm_solve(U, b_c, V, b_p, Wd, lam,
                                 prob.fixed_cam, prob.point_valid)

        # candidate update
        T_new = se3.exp(dc).compose(SE3(prob.kf_R, prob.kf_t))
        cand = prob._replace(kf_R=T_new.R, kf_t=T_new.t,
                             points=prob.points + dp)
        new_cost = _robust_cost(cand, cam, delta2)
        # a failed Cholesky (indefinite S) yields NaN updates and a bogus
        # zero cost — such steps must be rejected, not embraced
        accept = ((new_cost < cost) & jnp.isfinite(new_cost)
                  & jnp.isfinite(dc).all() & jnp.isfinite(dp).all())
        prob = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b) if a.shape == b.shape else a,
            cand, prob)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 4.0, 1e2))
        cost = jnp.where(accept, new_cost, cost)
        return (prob, lam, cost)

    def run(prob, n):
        cost0 = _robust_cost(prob, cam, delta2)
        state = (prob, jnp.asarray(lm_lambda0, jnp.float32), cost0)
        state = jax.lax.fori_loop(0, n, lambda i, s: lm_step(s), state)
        return state[0], state[2]

    # Phase 1 (reference LocalBundleAdjustment: 5 iters with Huber), then
    # drop gross outliers at the chi2 gate, then phase 2 on survivors.
    n1 = max(iters // 3, 2)
    prob, _ = run(prob, n1)
    r, _, _, depth_ok = _residuals(prob, cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_w
    prob = prob._replace(obs_valid=prob.obs_valid & depth_ok & (chi2 <= 2.0 * delta2))
    prob, cost = run(prob, iters - n1)

    # final renormalization + chi2 gate (reference erases obs > chi2 threshold
    # after LocalBundleAdjustment, Optimizer.cc:2040-2100)
    Tn = SE3(prob.kf_R, prob.kf_t).normalized()
    prob = prob._replace(kf_R=Tn.R)
    r, _, _, depth_ok = _residuals(prob, cam)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_w
    inlier = prob.obs_valid & depth_ok & (chi2 <= delta2)
    return BAResult(prob.kf_R, prob.kf_t, prob.points, inlier, cost)
