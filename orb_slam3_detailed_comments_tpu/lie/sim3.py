"""Sim(3): similarity transforms (scale * rotation + translation).

Replaces Sophus Sim3 (reference: Thirdparty/Sophus/sophus/sim3.hpp) and the
g2o Sim3 type (reference: Thirdparty/g2o/g2o/types/sim3/sim3.h) used by loop
closing and map merging.

Tangent ordering: (rho, phi, sigma) — translation, rotation, log-scale.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3

_EPS = 1e-6


class Sim3(NamedTuple):
    """x_out = s * R @ x + t."""

    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]
    s: jnp.ndarray  # [...]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3)),
            jnp.zeros((*batch_shape, 3), dtype=dtype),
            jnp.ones(batch_shape, dtype=dtype),
        )

    @staticmethod
    def from_se3(R: jnp.ndarray, t: jnp.ndarray, s=None) -> "Sim3":
        if s is None:
            s = jnp.ones(t.shape[:-1], dtype=t.dtype)
        return Sim3(R, t, s)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            self.R @ other.R,
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
            self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        inv_s = 1.0 / self.s
        return Sim3(Rt, -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t), inv_s)


def _WV_coeffs(phi: jnp.ndarray, sigma: jnp.ndarray):
    """Coefficients (A, B, C) of W = A I + B hat(phi) + C hat(phi)^2 such that
    t = W @ rho for sim3 exp (Sophus sim3.hpp calcW)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    s = jnp.exp(sigma)
    small_sig = jnp.abs(sigma) < _EPS
    small_th = theta < _EPS
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_th = jnp.where(small_th, 1.0, theta)

    # C = (s - 1) / sigma  (scale integral)
    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / safe_sig)

    sin_t, cos_t = jnp.sin(safe_th), jnp.cos(safe_th)

    # Both small: Taylor in sigma only (theta -> 0 limits).
    # A -> (s*sin t terms)/.. ; standard Sophus formulas:
    sig2 = safe_sig * safe_sig
    th2 = safe_th * safe_th
    denom = sig2 + th2

    # Generic case (sigma != 0, theta != 0):
    a_g = s * sin_t
    b_g = s * cos_t
    A_gen = (a_g * safe_sig + (1.0 - b_g) * safe_th) / (safe_th * denom)
    B_gen = (C - ((b_g - 1.0) * safe_sig + a_g * safe_th) / denom) / th2

    # sigma ~ 0, theta != 0:
    A_s0 = (1.0 - cos_t) / th2
    B_s0 = (safe_th - sin_t) / (th2 * safe_th)

    # theta ~ 0, sigma != 0:
    A_t0 = ((safe_sig - 1.0) * s + 1.0) / sig2
    B_t0 = (s * 0.5 * sig2 + s - 1.0 - safe_sig * s) / (sig2 * safe_sig)

    # both ~ 0:
    A_00 = 0.5 + sigma / 6.0
    B_00 = 1.0 / 6.0 + sigma / 24.0

    A = jnp.where(
        small_sig & small_th, A_00,
        jnp.where(small_sig, A_s0, jnp.where(small_th, A_t0, A_gen)),
    )
    B = jnp.where(
        small_sig & small_th, B_00,
        jnp.where(small_sig, B_s0, jnp.where(small_th, B_t0, B_gen)),
    )
    return A, B, C


def _calcW(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    A, B, C = _WV_coeffs(phi, sigma)
    W = so3.hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return C[..., None, None] * I + A[..., None, None] * W + B[..., None, None] * W2


def exp(xi: jnp.ndarray) -> Sim3:
    """sim(3) exp: [..., 7] = (rho, phi, sigma) -> Sim3."""
    rho, phi, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    R = so3.exp(phi)
    W = _calcW(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return Sim3(R, t, jnp.exp(sigma))


def log(S: Sim3) -> jnp.ndarray:
    """Sim3 -> [..., 7] = (rho, phi, sigma)."""
    phi = so3.log(S.R)
    sigma = jnp.log(S.s)
    W = _calcW(phi, sigma)
    rho = jnp.linalg.solve(W, S.t[..., :, None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
