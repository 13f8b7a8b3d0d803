"""SE(3): rigid transforms, batched and jit-friendly.

Replaces Sophus SE3 (reference: Thirdparty/Sophus/sophus/se3.hpp).

Representation: a pair (R [..., 3, 3], t [..., 3]) or a packed 4x4 / 7-vector.
Twists are ordered (rho, phi): translation part first, rotation part second —
matching Sophus' tangent convention used throughout the reference optimizers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class SE3(NamedTuple):
    """Rigid transform: x_out = R @ x + t."""

    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(R, t)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transform points x [..., 3]."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other (apply other first)."""
        return SE3(self.R @ other.R, jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def matrix(self) -> jnp.ndarray:
        """[..., 4, 4] homogeneous matrix."""
        batch = self.t.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype), (*batch, 1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def params7(self) -> jnp.ndarray:
        """Pack to [..., 7]: (tx, ty, tz, qx, qy, qz, qw) — trajectory format."""
        return jnp.concatenate([self.t, so3.to_quat(self.R)], axis=-1)

    @staticmethod
    def from_params7(p: jnp.ndarray) -> "SE3":
        return SE3(so3.from_quat(p[..., 3:7]), p[..., 0:3])

    def normalized(self) -> "SE3":
        return SE3(so3.normalize(self.R), self.t)


def exp(xi: jnp.ndarray) -> SE3:
    """se(3) exp: twist [..., 6] = (rho, phi) -> SE3.

    t = Jl(phi) @ rho, R = exp(phi).
    """
    rho, phi = xi[..., 0:3], xi[..., 3:6]
    R = so3.exp(phi)
    Jl = so3.left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", Jl, rho)
    return SE3(R, t)


def log(T: SE3) -> jnp.ndarray:
    """SE3 -> twist [..., 6] = (rho, phi)."""
    phi = so3.log(T.R)
    Jl_inv = so3.inv_left_jacobian(phi)
    rho = jnp.einsum("...ij,...j->...i", Jl_inv, T.t)
    return jnp.concatenate([rho, phi], axis=-1)


def adjoint(T: SE3) -> jnp.ndarray:
    """Adjoint [..., 6, 6] for the (rho, phi) ordering:

        Ad = [[R, hat(t) R], [0, R]]
    """
    tR = so3.hat(T.t) @ T.R
    zeros = jnp.zeros_like(T.R)
    top = jnp.concatenate([T.R, tR], axis=-1)
    bot = jnp.concatenate([zeros, T.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def boxplus(T: SE3, xi: jnp.ndarray) -> SE3:
    """Left-multiplicative update exp(xi) ∘ T (the GN/LM retraction)."""
    return exp(xi).compose(T)


def relative(T_a: SE3, T_b: SE3) -> SE3:
    """T_a^-1 ∘ T_b."""
    return T_a.inverse().compose(T_b)
