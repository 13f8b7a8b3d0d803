"""Batched-hypothesis PnP RANSAC for relocalization.

Replaces MLPnPsolver (reference: src/MLPnPsolver.cpp, used by
Tracking::Relocalization at Tracking.cc:4324). Works on bearing-style
normalized coordinates so it is camera-model agnostic (fisheye-safe, like
MLPnP). Each hypothesis solves the 6-point DLT for the 3x4 projection
matrix — all hypotheses as one batched eigenproblem — then the best
hypothesis is polished by the GN pose optimizer.
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
    # polish with all inliers via weighted DLT
    c = jnp.sum(X * inl[:, None], 0) / jnp.maximum(jnp.sum(inl), 1.0)
    Xw = jnp.where(inl[:, None], X, c)
    xnw = jnp.where(inl[:, None], xn, 0.0)
    # weight rows: set non-inlier rows to duplicated centroid (harmless)
    Rb, tb = _pnp_dlt(Xw, xnw)
    inl2 = score(Rb, tb)
    use = jnp.sum(inl2) >= jnp.sum(inl)
    Rf = jnp.where(use, Rb, R[best])
    tf = jnp.where(use, tb, t[best])
    inlf = jnp.where(use, inl2, inl)
    n = jnp.sum(inlf)
    return PnPResult(Rf, tf, inlf, n, n >= min_inliers)
