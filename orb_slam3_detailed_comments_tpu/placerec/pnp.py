"""Batched-hypothesis PnP RANSAC for relocalization.

Replaces MLPnPsolver (reference: src/MLPnPsolver.cpp, used by
Tracking::Relocalization at Tracking.cc:4324). Works on bearing-style
normalized coordinates so it is camera-model agnostic (fisheye-safe, like
MLPnP). Each hypothesis solves the 6-point DLT for the 3x4 projection
matrix — all hypotheses as one batched eigenproblem — then the best
hypothesis is polished by MLPnP's maximum-likelihood refinement: Gauss-
Newton on the nullspace-tangent residuals of the observed bearing vectors
(reference: MLPnPsolver.cpp:mlpnp_gn / residuals_and_jacs), which stays
well-defined for >90° fisheye bearings where perspective division breaks.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import SE3, so3


def _pnp_dlt(X: jnp.ndarray, xn: jnp.ndarray):
    """Minimal DLT: X [..., M, 3] world, xn [..., M, 2] normalized coords ->
    R [..., 3, 3], t [..., 3] (world->camera), least squares over M >= 6."""
    M = X.shape[-2]
    zeros = jnp.zeros_like(X[..., 0])
    ones = jnp.ones_like(X[..., 0])
    u, v = xn[..., 0], xn[..., 1]
    Xh = jnp.concatenate([X, ones[..., None]], axis=-1)     # [..., M, 4]
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -u[..., None] * Xh], axis=-1)
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -v[..., None] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)                   # [..., 2M, 12]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vec = jnp.linalg.eigh(AtA)
    p = vec[..., :, 0].reshape(*A.shape[:-2], 3, 4)
    Rr = p[..., :3]
    # orthogonalize via SVD, fix scale/sign
    U, s, Vt = jnp.linalg.svd(Rr)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = U @ (D[..., :, None] * Vt)
    scale = jnp.mean(s, axis=-1) * jnp.sign(det)
    t = p[..., 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)[..., None]
    return R, t


def _tangent_basis(b: jnp.ndarray):
    """Orthonormal (s, u) spanning the nullspace of each unit bearing b
    [N, 3] (MLPnPsolver.cpp computes the same basis via Householder)."""
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], b.dtype), b.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], b.dtype), b.shape)
    a = jnp.where(jnp.abs(b[..., :1]) < 0.9, ex, ey)
    s = jnp.cross(b, a)
    s = s / jnp.linalg.norm(s, axis=-1, keepdims=True)
    u = jnp.cross(b, s)
    return s, u


def _ml_refine(R0: jnp.ndarray, t0: jnp.ndarray, X: jnp.ndarray,
               bear: jnp.ndarray, w: jnp.ndarray, n_iter: int = 6):
    """MLPnP maximum-likelihood polish: GN on the 2-dof tangent-space
    residuals r_i = [s_i; u_i]^T (R X_i + t)/|R X_i + t|, weighted by w
    (inlier mask; per-point covariance would slot in here identically)."""
    s, u = _tangent_basis(bear)

    def residuals(xi, R, t):
        dR = so3.exp(xi[:3])
        Rn = dR @ R
        tn = dR @ t + xi[3:]
        p = X @ Rn.T + tn
        ph = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
        return jnp.stack([jnp.sum(s * ph, -1), jnp.sum(u * ph, -1)], -1)

    def step(carry, _):
        R, t = carry
        zero = jnp.zeros(6, X.dtype)
        r = residuals(zero, R, t)                       # [N, 2]
        J = jax.jacfwd(residuals)(zero, R, t)           # [N, 2, 6]
        Jw = J * w[:, None, None]
        H = jnp.einsum("nki,nkj->ij", Jw, J) + 1e-9 * jnp.eye(6, dtype=X.dtype)
        g = jnp.einsum("nki,nk->i", Jw, r)
        xi = -jnp.linalg.solve(H, g)
        dR = so3.exp(xi[:3])
        return (dR @ R, dR @ t + xi[3:]), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=n_iter)
    return R, t


class PnPResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("n_hyp",))
def solve_pnp_ransac(X: jnp.ndarray, xn: jnp.ndarray, valid: jnp.ndarray,
                     key: jnp.ndarray, focal: float = 460.0,
                     n_hyp: int = 256, th_px2: float = 5.991,
                     min_inliers: int = 10) -> PnPResult:
    """X [N, 3] world points, xn [N, 2] observed normalized coords."""
    N = X.shape[0]
    g = jax.random.uniform(key, (n_hyp, N))
    g = jnp.where(valid[None, :], g, -1.0)
    _, idx = jax.lax.top_k(g, 6)
    R, t = _pnp_dlt(X[idx], xn[idx])                         # [H, 3, 3], [H, 3]

    def score(R, t):
        pc = jnp.einsum("ij,nj->ni", R, X) + t
        p = pc[:, :2] / jnp.where(jnp.abs(pc[:, 2:3]) < 1e-9, 1e-9, pc[:, 2:3])
        e = jnp.sum((p - xn) ** 2, -1) * focal * focal
        return (e < th_px2) & valid & (pc[:, 2] > 0)

    inls = jax.vmap(score)(R, t)
    counts = jnp.sum(inls, -1)
    best = jnp.argmax(counts)
    inl = inls[best]
    # MLPnP-style ML polish over the inliers (bearing tangent residuals)
    bear = jnp.concatenate([xn, jnp.ones_like(xn[:, :1])], axis=-1)
    bear = bear / jnp.linalg.norm(bear, axis=-1, keepdims=True)
    Rb, tb = _ml_refine(R[best], t[best], X, bear, inl.astype(X.dtype))
    inl2 = score(Rb, tb)
    use = jnp.sum(inl2) >= jnp.sum(inl)
    Rf = jnp.where(use, Rb, R[best])
    tf = jnp.where(use, tb, t[best])
    inlf = jnp.where(use, inl2, inl)
    n = jnp.sum(inlf)
    return PnPResult(Rf, tf, inlf, n, n >= min_inliers)
