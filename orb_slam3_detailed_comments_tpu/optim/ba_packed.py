"""Packed ("entries-on-lanes") LM bundle adjustment.

Same semantics as `ba._ba_solve_tables` (two-phase Huber LM with the
mid-solve chi2 re-gate, trace-scaled damping, Schur + dense Cholesky,
O-order inlier classification — reference:
/root/reference/src/Optimizer.cc:1740 LocalBundleAdjustment's
solve + chi2-erase schedule, with g2o's BlockSolver Schur elimination
/root/reference/Thirdparty/g2o/g2o/core/block_solver.h), but every
per-entry quantity lives as a SCALAR array of shape [d, P] so the TPU
VPU's (8, 128) native tile rides the big point axis.

Why (r4 per-op device trace, scripts/profile_ba_trace.py): the table
solve is compute-bound with ~0 scheduling gap, and the wall is dominated
by elementwise/reduce ops over tensors whose MINOR dims are the residual/
Jacobian small axes (2, 3, 6, 18, 36). XLA tiles the minor-most dim onto
the 128-wide lane axis, so those ops run at 2/128-6/128 lane utilization
and the solve sits ~10x above its HBM floor. Packing puts P (4096) on
lanes: every multiply-add in the residual -> Jacobian -> normal-equation
chain is a full-width VPU op, and the only non-elementwise work is
- one [12, C] x [C, dP] matmul scattering per-camera poses to entries,
- one [21+6, dP] x [dP, C] matmul reducing G/b_c to per-camera blocks,
- the [C6, 3P] x [3P, C6] Schur product + 6C Cholesky (unchanged math).

The LM loop math matches ba.py term-for-term; float reduction ORDER
differs (documented — the 520-frame gauntlets gate the end-to-end effect).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lie import SE3, se3
from ..models import cameras
from . import reproj
from .ba import (BAProblem, BAResult, ObsTable, _REL_TOL, build_obs_table,
                 table_depth_of)


# ---------------------------------------------------------------- projection
def _project_scalars(cam: cameras.CameraParams, x, y, z):
    """cameras.project on unpacked coordinate arrays (any shape); the
    same math (Pinhole.cpp / KannalaBrandt8.cpp projection), no [..., 3]
    minor axis anywhere."""
    if cam.kind == cameras.PINHOLE:
        k1, k2, p1, p2, k3 = cam.dist
        safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        xn = x / safe_z
        yn = y / safe_z
        r2 = xn * xn + yn * yn
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
        yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
        return cam.fx * xd + cam.cx, cam.fy * yd + cam.cy
    elif cam.kind == cameras.FISHEYE_KB8:
        k1, k2, k3, k4, _ = cam.dist
        r = jnp.sqrt(x * x + y * y)
        safe_r = jnp.maximum(r, 1e-9)
        theta = jnp.arctan2(r, z)
        t2 = theta * theta
        td = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        scale = td / safe_r
        return cam.fx * x * scale + cam.cx, cam.fy * y * scale + cam.cy
    raise ValueError(f"unknown camera kind {cam.kind}")


def _project_with_jac(cam, x, y, z):
    """(u, v) and the 2x3 projection Jacobian as six scalar arrays, exact
    via three packed jvp sweeps (stays elementwise in [d, P] layout)."""
    f = lambda p: _project_scalars(cam, p[0], p[1], p[2])
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    (u, v), (ux, vx) = jax.jvp(f, ((x, y, z),), ((ones, zeros, zeros),))
    _, (uy, vy) = jax.jvp(f, ((x, y, z),), ((zeros, ones, zeros),))
    _, (uz, vz) = jax.jvp(f, ((x, y, z),), ((zeros, zeros, ones),))
    return (u, v), ((ux, uy, uz), (vx, vy, vz))


# ---------------------------------------------------------------- solve
def _sym3_inv(a, b, c, e, f, i, valid):
    """Closed-form inverse of symmetric [[a,b,c],[b,e,f],[c,f,i]], packed.
    Same guard thresholds as ba._inv3x3; zeroed where ~valid."""
    i00 = e * i - f * f
    i01 = c * f - b * i
    i02 = b * f - c * e
    i11 = a * i - c * c
    i12 = b * c - a * f
    i22 = a * e - b * b
    det = a * i00 + b * i01 + c * i02
    s = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = jnp.where(valid, s, 0.0)
    return i00 * s, i01 * s, i02 * s, i11 * s, i12 * s, i22 * s


_SYM6 = [(i, j) for i in range(6) for j in range(i, 6)]     # 21 upper pairs
_SYM6_AT = {(i, j): k for k, (i, j) in enumerate(_SYM6)}


def _sym6_index(i, j):
    return _SYM6_AT[(i, j) if i <= j else (j, i)]


def ba_solve_packed(prob: BAProblem, cam: cameras.CameraParams, iters: int,
                    delta2: float, lm_lambda0: float,
                    table_depth: int = 0,
                    table: ObsTable = None) -> BAResult:
    """Drop-in for ba._ba_solve_tables with the packed LM body."""
    C = int(prob.kf_R.shape[0])
    P = int(prob.points.shape[0])
    d = table_depth_of(prob, table_depth)
    TL = table if table is not None else build_obs_table(
        prob.obs_pt, prob.obs_cam, prob.obs_uv, prob.obs_w,
        prob.obs_valid, prob.point_valid, P, C, d)

    # ---- packed statics (built once, outside the LM loop) ----
    # onehot [P, d, C] -> [C, d*P] in d-major flat order, matching every
    # packed [d, P].reshape(d*P) below
    onehot_cdp = TL.onehot.transpose(2, 1, 0).reshape(C, d * P)
    uvu = TL.uv_t[..., 0].T                                  # [d, P]
    uvv = TL.uv_t[..., 1].T
    w_t0 = TL.w_t.T                                          # [d, P]
    inval = TL.inval.T                                       # [d, P]
    # camera id per entry, invalid -> C (matches no compare)
    cam_p = jnp.where(TL.tvalid, TL.cam_t, C).T              # [d, P] int32

    def entry_pose(kf_R, kf_t):
        """Per-entry pose components as twelve [d, P] arrays via ONE MXU
        matmul (replaces the pdc,cij einsums); invalid entries get the
        identity pose at z=1 so no NaN leaks into the 0-weighted sums."""
        Pflat = jnp.concatenate([kf_R.reshape(C, 9), kf_t], axis=1)  # [C,12]
        M = jax.lax.dot_general(Pflat, onehot_cdp,
                                (((0,), (0,)), ((), ())))    # [12, d*P]
        M = M.reshape(12, d, P)
        R = [M[0] + inval, M[1], M[2],
             M[3], M[4] + inval, M[5],
             M[6], M[7], M[8] + inval]
        t = [M[9], M[10], M[11] + inval]
        return R, t

    def entry_pc(kf_R, kf_t, points):
        R, t = entry_pose(kf_R, kf_t)
        x = points[:, 0][None, :]
        y = points[:, 1][None, :]
        z = points[:, 2][None, :]
        pcx = R[0] * x + R[1] * y + R[2] * z + t[0]
        pcy = R[3] * x + R[4] * y + R[5] * z + t[1]
        pcz = R[6] * x + R[7] * y + R[8] * z + t[2]
        return R, (pcx, pcy, pcz)

    def chi2_sweep(kf_R, kf_t, points):
        """Forward-only chi2 + depth gate, packed (the classification
        sweeps of the two-phase schedule)."""
        _, (pcx, pcy, pcz) = entry_pc(kf_R, kf_t, points)
        u, v = _project_scalars(cam, pcx, pcy, pcz)
        ru = uvu - u
        rv = uvv - v
        return ru * ru + rv * rv, pcz > 0.05

    def robust_cost(kf_R, kf_t, points, w_t):
        err2, depth_ok = chi2_sweep(kf_R, kf_t, points)
        chi2 = err2 * w_t
        ok = (w_t > 0) & depth_ok
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0))
                        - delta2)
        return jnp.sum(jnp.where(ok, rho, 0.0))

    def lm_step(state):
        kf_R, kf_t, points, w_t, lam, cost, k, done = state
        R, (pcx, pcy, pcz) = entry_pc(kf_R, kf_t, points)
        (u, v), ((ux, uy, uz), (vx, vy, vz)) = _project_with_jac(
            cam, pcx, pcy, pcz)
        ru = uvu - u
        rv = uvv - v
        depth_ok = pcz > 0.05
        chi2 = (ru * ru + rv * rv) * w_t
        w = w_t * reproj.huber_weight(chi2, delta2) * depth_ok

        # twist Jacobian rows (left-multiplied delta, d pc/d delta =
        # [I | -hat(pc)] — reproj._twist_jac written on scalars)
        Jc0 = [ux, uy, uz,
               uz * pcy - uy * pcz, ux * pcz - uz * pcx,
               uy * pcx - ux * pcy]
        Jc1 = [vx, vy, vz,
               vz * pcy - vy * pcz, vx * pcz - vz * pcx,
               vy * pcx - vx * pcy]
        # point Jacobian rows: Jproj @ R_e
        Jp0 = [ux * R[0] + uy * R[3] + uz * R[6],
               ux * R[1] + uy * R[4] + uz * R[7],
               ux * R[2] + uy * R[5] + uz * R[8]]
        Jp1 = [vx * R[0] + vy * R[3] + vz * R[6],
               vx * R[1] + vy * R[4] + vz * R[7],
               vx * R[2] + vy * R[5] + vz * R[8]]

        # per-camera blocks: G (upper-symmetric 21) and b_c (6) reduced to
        # [C] columns by ONE matmul against the one-hot
        Gb = [w * (Jc0[i] * Jc0[j] + Jc1[i] * Jc1[j]) for i, j in _SYM6]
        Gb += [w * (Jc0[i] * ru + Jc1[i] * rv) for i in range(6)]
        Gm = jnp.stack([g.reshape(d * P) for g in Gb])       # [27, d*P]
        red = jax.lax.dot_general(Gm, onehot_cdp,
                                  (((1,), (1,)), ((), ())))  # [27, C]
        U = jnp.stack([red[_sym6_index(i, j)]
                       for i in range(6) for j in range(6)])  # [36, C]
        U = U.T.reshape(C, 6, 6)
        b_c = red[21:].T                                     # [C, 6]

        # per-point blocks: V (sym 6), b_p (3) — reduce over the d axis
        Vc = [(w * (Jp0[x] * Jp0[y] + Jp1[x] * Jp1[y])).sum(0)
              for x, y in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]]
        bp = [(w * (Jp0[x] * ru + Jp1[x] * rv)).sum(0) for x in range(3)]

        # coupling blocks W[i][x] as [C, P]: reduce the d axis against an
        # ON-THE-FLY camera-id compare — the materialized one-hot would be
        # re-read (4 MB x 18 comps) every iteration; the compare fuses from
        # one [d, P] int32 read (invalid entries carry w == 0 already)
        camsel = (cam_p[None, :, :] == jnp.arange(C)[:, None, None])
        Wc = [[(jnp.where(camsel,
                          (w * (Jc0[i] * Jp0[x] + Jc1[i] * Jp1[x]))[None],
                          0.0)).sum(1)
               for x in range(3)] for i in range(6)]

        dc, dp = _schur_packed(U, b_c, Vc, bp, Wc, lam,
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

    # two-phase schedule, identical to ba._ba_solve_tables
    n1 = max(iters // 3, 2)
    kf_R, kf_t, points, _ = run(prob.kf_R, prob.kf_t, prob.points, w_t0, n1)
    err2, depth_ok = chi2_sweep(kf_R, kf_t, points)
    chi2 = err2 * w_t0
    w_t = jnp.where(depth_ok & (chi2 <= 2.0 * delta2), w_t0, 0.0)
    kf_R, kf_t, points, cost = run(kf_R, kf_t, points, w_t,
                                   max(iters - n1, 1))

    Tn = SE3(kf_R, kf_t).normalized()
    kf_R = Tn.R
    err2, depth_ok = chi2_sweep(kf_R, kf_t, points)
    chi2 = err2 * w_t0
    ok_t = TL.tvalid.T & depth_ok & (chi2 <= delta2) & (w_t0 > 0)  # [d, P]
    # back to P-major flat order for the O-order gather (pad slot True:
    # overflowed-but-valid observations degrade, not detach — see ba.py)
    ok_flat = jnp.concatenate([ok_t.T.reshape(P * d), jnp.ones(1, bool)])
    inlier = ok_flat[TL.pos] & prob.obs_valid
    return BAResult(kf_R, kf_t, points, inlier, cost)


def _schur_packed(U, b_c, Vc, bp, Wc, lam, fixed_cam, point_valid):
    """ba._schur_lm_solve with the point-side blocks packed: V as six [P]
    components, W as 6x3 [C, P] components. Damping, guards, jitter and
    the 6C Cholesky match the reference path term-for-term."""
    C = U.shape[0]
    P = Vc[0].shape[0]
    # trace-scaled damping (ba._damped_blocks)
    Ud = U + lam * jnp.eye(6) * jnp.maximum(
        jnp.einsum("cii->c", U), 1e-3)[:, None, None] / 6.0
    trV = Vc[0] + Vc[3] + Vc[5]
    dv = lam * jnp.maximum(trV, 1e-3) / 3.0
    a, b, c0 = Vc[0] + dv, Vc[1], Vc[2]
    e, f = Vc[3] + dv, Vc[4]
    i_ = Vc[5] + dv
    Vi = _sym3_inv(a, b, c0, e, f, i_, point_valid)          # 6 comps [P]

    def vinv(x, y):
        return Vi[_sym6_index3(x, y)]

    # Y[i][x] [C, P] = sum_z W[i][z] * Vinv[z, x]
    Y = [[sum(Wc[i][z] * vinv(z, x)[None, :] for z in range(3))
          for x in range(3)] for i in range(6)]
    # S = U_blockdiag - Y W^T as one [C6, 3P] x [3P, C6] MXU product
    Yf = jnp.stack([jnp.stack(Y[i], 1) for i in range(6)],
                   1).transpose(0, 1, 2, 3)                  # [C, 6, 3, P]
    Wf = jnp.stack([jnp.stack(Wc[i], 1) for i in range(6)], 1)
    Yf = Yf.reshape(C * 6, 3 * P)

    S = (-(Yf @ Wf.reshape(C * 6, 3 * P).T)).reshape(C, 6, C, 6)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Ud)
    rhs = b_c - jnp.stack(
        [sum((Y[i][x] * bp[x][None, :]).sum(-1) for x in range(3))
         for i in range(6)], 1)

    free = ~fixed_cam
    fmask = free[:, None].astype(S.dtype)
    S = S * fmask[:, :, None, None] * fmask[None, None, :, :]
    eye_fix = jnp.eye(6) * (~free)[:, None, None].astype(S.dtype)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(eye_fix)
    rhs = rhs * fmask

    Sm = S.reshape(6 * C, 6 * C)
    jitter = 1e-5 * jnp.max(jnp.diag(Sm)) + 1e-3
    dc = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(Sm + jitter * jnp.eye(6 * C), lower=True),
         True),
        rhs.reshape(-1)).reshape(C, 6)
    dc = jnp.where(free[:, None], dc, 0.0)

    # back-substitute landmarks: dp = Vinv (b_p - W^T dc), packed
    WTdc = [sum((Wc[i][x] * dc[:, i, None]).sum(0) for i in range(6))
            for x in range(3)]
    rx = [bp[x] - WTdc[x] for x in range(3)]
    dp = jnp.stack([sum(vinv(x, y) * rx[y] for y in range(3))
                    for x in range(3)], -1)                  # [P, 3]
    dp = jnp.where(point_valid[:, None], dp, 0.0)
    return dc, dp


_SYM3 = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
_SYM3_AT = {(x, y): k for k, (x, y) in enumerate(_SYM3)}


def _sym6_index3(x, y):
    return _SYM3_AT[(x, y) if x <= y else (y, x)]


@partial(jax.jit, static_argnames=("cam", "iters", "table_depth"))
def ba_solve_packed_jit(prob: BAProblem, table: ObsTable,
                        cam: cameras.CameraParams, iters: int,
                        delta2: float, lm_lambda0: float,
                        table_depth: int) -> BAResult:
    return ba_solve_packed(prob, cam, iters, delta2, lm_lambda0,
                           table_depth, table=table)
