"""Motion-only pose optimization (tracking hot loop #2).

Replaces Optimizer::PoseOptimization (reference: src/Optimizer.cc:55): 4
rounds x 10 iterations of Gauss-Newton with a Huber kernel, re-classifying
outliers at the chi2(0.95) gate between rounds and re-admitting observations
that recover. Here each GN iteration is a fused batched program (residuals,
6x6 normal equations, solve, retract) and the whole optimization — all rounds
included — is one jittable function, vmappable over frames for multi-chip
frame-parallel tracking.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import SE3, se3
from ..models import cameras
from . import reproj


class PoseOptResult(NamedTuple):
    T_cw: SE3
    inlier: jnp.ndarray   # [M] bool
    n_inliers: jnp.ndarray  # scalar int32


@partial(jax.jit, static_argnames=("cam", "iters", "rounds"))
def pose_optimization(T_cw0: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                      inv_sigma2: jnp.ndarray, valid: jnp.ndarray,
                      cam: cameras.CameraParams,
                      iters: int = 10, rounds: int = 4) -> PoseOptResult:
    """X_w [M,3] world points, uv [M,2] observations, inv_sigma2 [M] per-level
    information weights, valid [M] observation mask."""
    delta2 = reproj.CHI2_MONO

    def gn_iter(i, state):
        T, inlier = state
        r, J, depth_ok = reproj.residual_pose(T, X_w, uv, cam)
        w_info = inv_sigma2 * (valid & inlier & depth_ok)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w_rob = reproj.huber_weight(chi2, delta2)
        w = w_info * w_rob
        H = jnp.einsum("mki,m,mkj->ij", J, w, J)
        b = jnp.einsum("mki,m,mk->i", J, w, r)
        H = H + 1e-5 * jnp.eye(6, dtype=H.dtype) * jnp.maximum(jnp.trace(H) / 6.0, 1.0)
        dx = jnp.linalg.solve(H, b)
        T_new = se3.exp(dx).compose(T)
        return (SE3(T_new.R, T_new.t), inlier)

    def round_body(k, state):
        T, inlier = state
        T, inlier = jax.lax.fori_loop(0, iters, gn_iter, (T, inlier))
        # outlier re-classification at the chi2 gate; outliers can recover
        r, _, depth_ok = reproj.residual_pose(T, X_w, uv, cam)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        inlier = (chi2 <= delta2) & depth_ok & valid
        return (T, inlier)

    T, inlier = jax.lax.fori_loop(
        0, rounds, round_body, (T_cw0, jnp.ones(X_w.shape[0], jnp.bool_)))
    T = T.normalized()
    return PoseOptResult(T, inlier, jnp.sum(inlier.astype(jnp.int32)))
