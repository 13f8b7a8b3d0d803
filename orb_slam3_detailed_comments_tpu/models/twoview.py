"""Monocular map initialization: two-view reconstruction.

Replaces TwoViewReconstruction (reference: src/TwoViewReconstruction.cc):
parallel RANSAC of a homography and an essential matrix, model selection by
score ratio, motion recovery (E -> 4 motions, H -> 8 Faugeras motions),
cheirality/parallax voting, triangulation.

TPU redesign: instead of 200 sequential RANSAC iterations with early exits,
ALL hypotheses are solved simultaneously — minimal 8-point/4-point systems
become a batched [NH, 9, 9] eigenproblem, and all hypotheses are scored
against all correspondences with one [NH, N] fused computation. Everything
runs in NORMALIZED camera coordinates (rays through K^-1), so the "F" model
is directly the essential matrix and the math is camera-model-agnostic
(works for fisheye via unproject_bearing).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import SE3
from ..ops import triangulate as tri

CHI2_H = 5.991
CHI2_E = 3.841
SCORE_TH = 5.991


class TwoViewResult(NamedTuple):
    success: jnp.ndarray     # bool scalar
    R21: jnp.ndarray         # [3, 3] rotation frame1 -> frame2
    t21: jnp.ndarray         # [3] unit-norm translation
    points3d: jnp.ndarray    # [N, 3] in frame-1 coordinates
    is_good: jnp.ndarray     # [N] triangulated + cheirality-clean
    used_homography: jnp.ndarray  # bool scalar


def _smallest_eigvec9(A: jnp.ndarray) -> jnp.ndarray:
    """A [..., M, 9] -> unit null-ish vector [..., 9] via eigh of A^T A."""
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, v = jnp.linalg.eigh(AtA)
    return v[..., :, 0]


def _essential_from_8pts(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """x1, x2 [..., 8, 2] normalized coords -> E [..., 3, 3] (rank-2 enforced)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    # rows of x2^T E x1 = 0 with x = (u, v, 1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one],
                  axis=-1)                                   # [..., 8, 9]
    e = _smallest_eigvec9(A)
    E = e.reshape(*e.shape[:-1], 3, 3)
    # enforce the essential-matrix singular values (s, s, 0)
    U, s, Vt = jnp.linalg.svd(E)
    s_mean = (s[..., 0] + s[..., 1]) * 0.5
    s_new = jnp.stack([s_mean, s_mean, jnp.zeros_like(s_mean)], axis=-1)
    return U @ (s_new[..., :, None] * Vt)


def _homography_from_4pts(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """x1, x2 [..., 4, 2] -> H [..., 3, 3] with x2 ~ H x1."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([zero, zero, zero, -u1, -v1, -one, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)                   # [..., 8, 9]
    h = _smallest_eigvec9(A)
    return h.reshape(*h.shape[:-1], 3, 3)


def _epipolar_chi2(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, f2: float):
    """Squared point-to-epipolar-line distances both directions.

    E [H,3,3]; x1/x2 [N,2]. f2 scales normalized-coordinate errors to px^2.
    Returns chi2_1, chi2_2 each [H, N].
    """
    ones = jnp.ones_like(x1[..., :1])
    X1 = jnp.concatenate([x1, ones], axis=-1)                # [N, 3]
    X2 = jnp.concatenate([x2, ones], axis=-1)
    l2 = jnp.einsum("hij,nj->hni", E, X1)                    # line in image 2
    l1 = jnp.einsum("hji,nj->hni", E, X2)                    # line in image 1
    num = jnp.einsum("ni,hni->hn", X2, l2)
    d2 = num * num / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = num * num / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    return d1 * f2, d2 * f2


def _homography_chi2(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, f2: float):
    Hinv = jnp.linalg.inv(H)
    ones = jnp.ones_like(x1[..., :1])
    X1 = jnp.concatenate([x1, ones], axis=-1)
    X2 = jnp.concatenate([x2, ones], axis=-1)

    def transfer(M, X, target):
        y = jnp.einsum("hij,nj->hni", M, X)
        y = y[..., :2] / jnp.where(jnp.abs(y[..., 2:3]) < 1e-12, 1e-12, y[..., 2:3])
        d = y - target[None]
        return jnp.sum(d * d, axis=-1)

    return transfer(Hinv, X2, x1) * f2, transfer(H, X1, x2) * f2


def _check_rt(R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
              inlier: jnp.ndarray, f2: float, sigma2: float = 1.0):
    """Count points passing cheirality + parallax + reprojection for one
    (R, t) candidate (reference: TwoViewReconstruction::CheckRT)."""
    T1 = SE3.identity()
    T2 = SE3(R, t)
    X, ok = tri.triangulate(T1, x1, T2, x2)
    z1 = X[..., 2]
    z2 = T2.apply(X)[..., 2]
    cosp = tri.parallax_cos(T1, T2, X)
    # reprojection error in both views (normalized -> approx px via f2)
    p1 = X[..., :2] / jnp.where(jnp.abs(z1[..., None]) < 1e-9, 1e-9, z1[..., None])
    pc2 = T2.apply(X)
    p2 = pc2[..., :2] / jnp.where(jnp.abs(z2[..., None]) < 1e-9, 1e-9, z2[..., None])
    e1 = jnp.sum((p1 - x1) ** 2, axis=-1) * f2
    e2 = jnp.sum((p2 - x2) ** 2, axis=-1) * f2
    good = (inlier & ok & (z1 > 0) & (z2 > 0) & (cosp < 0.99998)
            & (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2))
    # median-ish parallax of good points: use a high quantile of cos
    cos_good = jnp.where(good, cosp, -1.0)
    return good, jnp.sum(good), X, cos_good


def _motions_from_E(E: jnp.ndarray):
    """E [3,3] -> 4 candidate (R [4,3,3], t [4,3])."""
    U, _, Vt = jnp.linalg.svd(E)
    # keep rotations proper
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _motions_from_H(H: jnp.ndarray):
    """Faugeras-Lustman decomposition of a normalized homography -> 8 motions.

    (reference: TwoViewReconstruction::ReconstructH's 8-solution set)
    """
    U, s, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = s[0], s[1], s[2]
    detUV = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    H_ = H / d2  # scale so middle singular value is 1

    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    eps = jnp.array([[1.0, 1.0], [1.0, -1.0], [-1.0, 1.0], [-1.0, -1.0]])

    def case_dpos(e):  # d' = +d2
        e1, e3 = e[0], e[1]
        sin_t = (d1 - d3) * x1 * x3 / d2
        cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2
        # guard: for degenerate (x1=x3=0) this is identity
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-e1 * e3 * sin_t)
        Rp = Rp.at[2, 0].set(e1 * e3 * sin_t).at[2, 2].set(cos_t)
        tp = jnp.array([e1 * x1, 0.0, -e3 * x3]) * (d1 - d3)
        return Rp, tp

    def case_dneg(e):  # d' = -d2
        e1, e3 = e[0], e[1]
        sin_p = (d1 + d3) * x1 * x3 / d2
        cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / d2
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(e1 * e3 * sin_p)
        Rp = Rp.at[2, 0].set(e1 * e3 * sin_p).at[2, 2].set(-cos_p)
        tp = jnp.array([e1 * x1, 0.0, e3 * x3]) * (d1 + d3)
        return Rp, tp

    Rs, ts = [], []
    for i in range(4):
        Rp, tp = case_dpos(eps[i])
        Rs.append(detUV * (U @ Rp @ Vt))
        ts.append((U @ tp))
    for i in range(4):
        Rp, tp = case_dneg(eps[i])
        Rs.append(detUV * (U @ Rp @ Vt))
        ts.append((U @ tp))
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


def _essential_refit(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Least-squares E from all rows, weighted by inlier mask w [N]."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one],
                  axis=-1) * w[:, None]
    e = _smallest_eigvec9(A)
    E = e.reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    s_mean = (s[0] + s[1]) * 0.5
    return U @ (jnp.array([s_mean, s_mean, 0.0])[:, None] * Vt)


def _homography_refit(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([zero, zero, zero, -u1, -v1, -one, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=-2)
    h = _smallest_eigvec9(A)
    return h.reshape(3, 3)


@partial(jax.jit, static_argnames=("n_hyp", "focal"))
def reconstruct(xn1: jnp.ndarray, xn2: jnp.ndarray, valid: jnp.ndarray,
                key: jnp.ndarray, n_hyp: int = 256,
                focal: float = 460.0, sigma: float = 1.0,
                min_triangulated: int = 50) -> TwoViewResult:
    """Full two-view reconstruction from matched normalized coordinates.

    xn1/xn2 [N, 2]: matched normalized (undistorted, K-free) coordinates;
    valid [N]: match mask. Returns pose of frame 2 wrt frame 1 and
    triangulated points in frame-1 coordinates.
    """
    N = xn1.shape[0]
    f2 = (focal / sigma) ** 2

    # --- batched minimal samples (sample from valid matches via masked
    # gumbel-top-k: random keys, invalid entries pushed to the bottom) ---
    def sample_idx(key, k):
        g = jax.random.uniform(key, (n_hyp, N))
        g = jnp.where(valid[None, :], g, -1.0)
        _, idx = jax.lax.top_k(g, k)
        return idx                                            # [n_hyp, k]

    k_e, k_h = jax.random.split(key)
    idx_e = sample_idx(k_e, 8)
    idx_h = sample_idx(k_h, 4)

    # --- essential hypotheses ---
    E = _essential_from_8pts(xn1[idx_e], xn2[idx_e])          # [H, 3, 3]
    c1, c2 = _epipolar_chi2(E, xn1, xn2, f2)
    inl_e = (c1 < CHI2_E) & (c2 < CHI2_E) & valid[None]
    # per-direction score accumulation (reference CheckFundamental:529-547:
    # gate at 3.841, score with 5.991 - chi2, directions independent)
    score_e = jnp.sum(
        jnp.where((c1 < CHI2_E) & valid[None], SCORE_TH - c1, 0.0)
        + jnp.where((c2 < CHI2_E) & valid[None], SCORE_TH - c2, 0.0), axis=-1)
    best_e = jnp.argmax(score_e)
    SE_score = score_e[best_e]
    inlier_e = inl_e[best_e]
    # polish: re-estimate from ALL inliers (weighted least squares rows)
    E_best = _essential_refit(xn1, xn2, inlier_e)
    c1r, c2r = _epipolar_chi2(E_best[None], xn1, xn2, f2)
    inlier_e = (c1r[0] < CHI2_E) & (c2r[0] < CHI2_E) & valid

    # --- homography hypotheses ---
    Hm = _homography_from_4pts(xn1[idx_h], xn2[idx_h])
    h1, h2 = _homography_chi2(Hm, xn1, xn2, f2)
    inl_h = (h1 < CHI2_H) & (h2 < CHI2_H) & valid[None]
    score_h = jnp.sum(
        jnp.where((h1 < CHI2_H) & valid[None], SCORE_TH - h1, 0.0)
        + jnp.where((h2 < CHI2_H) & valid[None], SCORE_TH - h2, 0.0), axis=-1)
    best_h = jnp.argmax(score_h)
    SH_score = score_h[best_h]
    inlier_h = inl_h[best_h]
    H_best = _homography_refit(xn1, xn2, inlier_h)
    h1r, h2r = _homography_chi2(H_best[None], xn1, xn2, f2)
    inlier_h = (h1r[0] < CHI2_H) & (h2r[0] < CHI2_H) & valid

    # 0.45: epipolar error is 1-D so the E-score is biased high vs the 2-D
    # homography transfer error; the reference's 0.50 (TwoViewReconstruction.cc:141,
    # with "if(RH>0.40)" as the historical value in the comment) relies on
    # ReconstructF failing + retrying for planar scenes — selecting H directly
    # initializes planar scenes one frame earlier.
    use_h = SH_score / jnp.maximum(SH_score + SE_score, 1e-9) > 0.45

    # --- motion recovery: score all 12 candidates (4 from E, 8 from H),
    # masked by which model won ---
    Re, te = _motions_from_E(E_best)
    Rh, th = _motions_from_H(H_best)
    Rs = jnp.concatenate([Re, Rh], axis=0)                    # [12, 3, 3]
    ts = jnp.concatenate([te, th], axis=0)
    model_mask = jnp.concatenate([
        jnp.full((4,), ~use_h), jnp.full((8,), use_h)])
    inlier = jnp.where(use_h, inlier_h, inlier_e)

    goods, ngoods, Xs, cosg = jax.vmap(
        lambda R, t: _check_rt(R, t, xn1, xn2, inlier, f2, sigma ** 2))(Rs, ts)
    ngoods = jnp.where(model_mask, ngoods, -1)
    best = jnp.argmax(ngoods)
    n_best = ngoods[best]
    n_second = jnp.max(jnp.where(jnp.arange(12) == best, -1, ngoods))
    n_inl = jnp.sum(inlier)

    # parallax check: the ~50th-good-point parallax must exceed ~1 deg
    cos_sorted = jnp.sort(cosg[best])[::-1]  # descending; good ones first? no:
    # cosg has -1 for bad; take the min cos among good = max parallax...
    # use the quantile trick: parallax of the min(50, n)-th best point
    cos_good = jnp.where(goods[best], cosg[best], -2.0)
    topk = jnp.sort(cos_good)[::-1]
    k50 = jnp.minimum(50, jnp.maximum(n_best - 1, 0))
    cos50 = topk[k50]
    parallax_ok = cos50 < jnp.cos(jnp.deg2rad(1.0))

    success = ((n_best >= min_triangulated)
               & (n_best.astype(jnp.float32) > 0.75 * n_inl.astype(jnp.float32))
               & (n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
               & parallax_ok)

    return TwoViewResult(
        success=success,
        R21=Rs[best], t21=ts[best],
        points3d=Xs[best],
        is_good=goods[best],
        used_homography=use_h,
    )
