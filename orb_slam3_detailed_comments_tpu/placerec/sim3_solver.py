"""Sim3/SE3 estimation from 3D-3D correspondences: batched Horn RANSAC.

Replaces Sim3Solver (reference: src/Sim3Solver.cc): closed-form Horn
similarity from 3-point minimal samples inside RANSAC, inliers by
reprojection error in both images. All hypotheses are solved and scored
simultaneously (one batched eigh for the quaternion method).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import so3


def horn_sim3(x1: jnp.ndarray, x2: jnp.ndarray, fix_scale: bool = False):
    """Closed-form similarity x2 = s R x1 + t from [..., M, 3] pairs.

    Horn's quaternion method (reference: Sim3Solver::ComputeSim3); batched
    over leading dims.
    """
    c1 = jnp.mean(x1, axis=-2, keepdims=True)
    c2 = jnp.mean(x2, axis=-2, keepdims=True)
    a = x1 - c1
    b = x2 - c2
    M = jnp.einsum("...mi,...mj->...ij", b, a)     # Σ b aᵀ
    # quaternion eigen-problem
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)
    _, v = jnp.linalg.eigh(N)
    q = v[..., :, -1]                               # largest eigval -> [w,x,y,z]
    R = so3.from_quat(jnp.stack([q[..., 1], q[..., 2], q[..., 3], q[..., 0]], -1))
    R = jnp.swapaxes(R, -1, -2)   # N above is built for the inverse rotation
    if fix_scale:
        s = jnp.ones(R.shape[:-2])
    else:
        num = jnp.sum(b * jnp.einsum("...ij,...mj->...mi", R, a), axis=(-1, -2))
        den = jnp.sum(a * a, axis=(-1, -2))
        s = num / jnp.maximum(den, 1e-12)
    t = c2[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, c1[..., 0, :])
    return R, t, s


class Sim3Result(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray   # [N]
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def solve_sim3_ransac(x1: jnp.ndarray, x2: jnp.ndarray, valid: jnp.ndarray,
                      xn1: jnp.ndarray, xn2: jnp.ndarray,
                      key: jnp.ndarray, focal: float = 460.0,
                      n_hyp: int = 128, th_px2: float = 10.0,
                      min_inliers: int = 20,
                      fix_scale: bool = False) -> Sim3Result:
    """x1/x2 [N, 3]: matched 3D points in the two keyframes' CAMERA frames;
    xn1/xn2 [N, 2]: their observed normalized image coords. Finds S12 such
    that x1 ~ S12 x2 ... returns transform mapping frame-2 points into
    frame 1 (x1 = s R x2 + t), inliers via reprojection in both images
    (reference: Sim3Solver::CheckInliers)."""
    N = x1.shape[0]
    g = jax.random.uniform(key, (n_hyp, N))
    g = jnp.where(valid[None, :], g, -1.0)
    _, idx = jax.lax.top_k(g, 3)                    # [H, 3]
    R, t, s = horn_sim3(x2[idx], x1[idx], fix_scale)  # maps 2 -> 1

    def score(R, t, s):
        # project frame-2 points through S12 into image 1
        y1 = s * jnp.einsum("ij,nj->ni", R, x2) + t
        p1 = y1[:, :2] / jnp.where(jnp.abs(y1[:, 2:3]) < 1e-9, 1e-9, y1[:, 2:3])
        e1 = jnp.sum((p1 - xn1) ** 2, -1) * focal * focal
        # inverse transform: x2 = (R^T (x1 - t)) / s
        y2 = jnp.einsum("ji,nj->ni", R, x1 - t) / jnp.maximum(s, 1e-9)
        p2 = y2[:, :2] / jnp.where(jnp.abs(y2[:, 2:3]) < 1e-9, 1e-9, y2[:, 2:3])
        e2 = jnp.sum((p2 - xn2) ** 2, -1) * focal * focal
        inl = (e1 < th_px2) & (e2 < th_px2) & valid & (y1[:, 2] > 0) & (y2[:, 2] > 0)
        return inl

    inls = jax.vmap(score)(R, t, s)
    counts = jnp.sum(inls, axis=-1)
    best = jnp.argmax(counts)
    inl = inls[best]
    # polish: re-fit on all inliers
    w = inl.astype(jnp.float32)
    # weighted Horn: subsample via masking (weight zero pairs at centroid)
    c1 = jnp.sum(x1 * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
    c2 = jnp.sum(x2 * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
    x1w = jnp.where(inl[:, None], x1, c1)
    x2w = jnp.where(inl[:, None], x2, c2)
    Rb, tb, sb = horn_sim3(x2w, x1w, fix_scale)
    inl2 = score(Rb, tb, sb)
    use_polish = jnp.sum(inl2) >= jnp.sum(inl)
    Rf = jnp.where(use_polish, Rb, R[best])
    tf = jnp.where(use_polish, tb, t[best])
    sf = jnp.where(use_polish, sb, s[best])
    inlf = jnp.where(use_polish, inl2, inl)
    n = jnp.sum(inlf)
    return Sim3Result(Rf, tf, sf, inlf, n, n >= min_inliers)


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def refine_sim3_gn(R0, t0, s0, x1, x2, xn1, xn2, valid,
                   focal: float = 460.0, iters: int = 8,
                   fix_scale: bool = False,
                   th_px2: float = 10.0,
                   min_inliers: int = 20) -> Sim3Result:
    """Gauss-Newton refinement of a Sim3 on bidirectional reprojection
    error with Huber weighting — the reference's Optimizer::OptimizeSim3
    (src/Optimizer.cc:4195: g2o VertexSim3Expmap + EdgeSim3ProjectXYZ /
    EdgeInverseSim3ProjectXYZ, 5 iterations, chi2 gate th2=10) as one
    jitted GN loop relinearized each iteration. Inputs follow
    solve_sim3_ransac's convention (x1 = s R x2 + t)."""

    def residuals(p, R, t, s):
        dR = so3.exp(p[:3])
        Rp = dR @ R
        tp = t + p[3:6]
        sp = s * jnp.exp(jnp.where(fix_scale, 0.0, p[6]))
        y1 = sp * jnp.einsum("ij,nj->ni", Rp, x2) + tp
        p1 = y1[:, :2] / jnp.where(jnp.abs(y1[:, 2:3]) < 1e-9, 1e-9,
                                   y1[:, 2:3])
        y2 = jnp.einsum("ji,nj->ni", Rp, x1 - tp) / jnp.maximum(sp, 1e-9)
        p2 = y2[:, :2] / jnp.where(jnp.abs(y2[:, 2:3]) < 1e-9, 1e-9,
                                   y2[:, 2:3])
        r = jnp.concatenate([(p1 - xn1) * focal, (p2 - xn2) * focal],
                            axis=-1)                  # [N, 4]
        front = (y1[:, 2] > 0) & (y2[:, 2] > 0)
        return r, front

    def gn_iter(_, state):
        R, t, s = state
        p0 = jnp.zeros(7)
        r, front = residuals(p0, R, t, s)
        chi2 = (jnp.sum(r[:, :2] ** 2, -1) + jnp.sum(r[:, 2:] ** 2, -1)) / 2
        w = jnp.where(valid & front, 1.0, 0.0)
        w = w * jnp.minimum(1.0, jnp.sqrt(th_px2 / jnp.maximum(chi2, 1e-9)))
        J = jax.jacfwd(lambda p: residuals(p, R, t, s)[0])(p0)   # [N,4,7]
        Jf = (J * w[:, None, None]).reshape(-1, 7)
        rf = (r * w[:, None]).reshape(-1)
        H = Jf.T @ Jf + 1e-6 * jnp.eye(7)
        g = Jf.T @ rf
        dp = -jnp.linalg.solve(H, g)
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0)
        R = so3.exp(dp[:3]) @ R
        t = t + dp[3:6]
        s = s * jnp.exp(jnp.where(fix_scale, 0.0, dp[6]))
        return (R, t, s)

    R, t, s = jax.lax.fori_loop(0, iters, gn_iter, (R0, t0, s0))
    # final chi2 inlier gate, same criterion as the RANSAC scorer
    r, front = residuals(jnp.zeros(7), R, t, s)
    e1 = jnp.sum(r[:, :2] ** 2, -1)
    e2 = jnp.sum(r[:, 2:] ** 2, -1)
    inl = (e1 < th_px2) & (e2 < th_px2) & valid & front
    n = jnp.sum(inl)
    return Sim3Result(R, t, s, inl, n, n >= min_inliers)
