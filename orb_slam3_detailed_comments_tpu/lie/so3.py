"""SO(3): rotation group ops, batched and jit-friendly.

Replaces the vendored Sophus SO3 (reference: Thirdparty/Sophus/sophus/so3.hpp)
and the right-Jacobian helpers used by IMU preintegration
(reference: include/ImuTypes.h:254-260, src/ImuTypes.cc).

All functions accept arbitrary leading batch dimensions; rotations are 3x3
matrices in float32 (TPU-friendly). Small-angle branches use Taylor series
selected with jnp.where so everything stays traceable under jit/vmap.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: w [..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_cos_coeffs(theta2: jnp.ndarray):
    """Return (A, B) = (sin t / t, (1 - cos t) / t^2) with Taylor fallback."""
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < _EPS
    # Guard theta for the division path; the small branch uses Taylor series.
    safe_t = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / jnp.maximum(theta2, _EPS * _EPS))
    return A, B


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector [..., 3] -> rotation matrix [..., 3, 3].

    Rodrigues: R = I + A * hat(w) + B * hat(w)^2.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    A, B = _sinc_cos_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: rotation matrix [..., 3, 3] -> rotation vector [..., 3].

    Numerically robust near theta = 0 and theta = pi, AND differentiation-
    safe: optimizers (pose graph, inertial alignment) take jacfwd/jacrev of
    rotation residuals that sit exactly at identity, so every branch here
    uses the safe-where pattern (guard the *input* of sqrt/atan2 so the
    untaken branch cannot generate NaN tangents).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Antisymmetric part gives sin(theta) * axis.
    w_sin = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s2 = jnp.sum(w_sin * w_sin, axis=-1)          # sin^2(theta), smooth
    small = (s2 < 1e-10) & (cos_theta > 0.0)      # theta ~ 0 (sin~0 & cos~+1)
    near_pi = cos_theta < -1.0 + 1e-6
    # theta via atan2 (smooth); guard sqrt input for the small branch
    sin_theta = jnp.sqrt(jnp.where(small, 1.0, s2))
    theta = jnp.arctan2(jnp.where(small, 0.0, sin_theta), cos_theta)

    # Generic: w = theta / sin(theta) * w_sin; small: (1 + s2/6) * w_sin
    # (for small angles theta^2 ~= s2, so the Taylor factor uses s2 directly
    # — no dependence on the non-differentiable theta-at-zero)
    scale = jnp.where(small, 1.0 + s2 / 6.0,
                      theta / jnp.where(small, 1.0, sin_theta))
    w_generic = scale[..., None] * w_sin

    # Near pi: use the symmetric part. R + I = (1 + cos t) I + (1 - cos t) aa^T + sin t hat(a)
    # diag(R) = cos t + (1 - cos t) a_i^2  ->  a_i^2 = (R_ii - cos t) / (1 - cos t)
    one_minus = jnp.maximum(1.0 - cos_theta, 1e-12)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / one_minus[..., None], 0.0, 1.0)
    axis_abs = jnp.sqrt(axis_sq)
    # Fix signs from off-diagonal sums: (R_ij + R_ji) = 2 (1 - cos t) a_i a_j
    # Pick the largest component positive, sign others consistently.
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    amax = jnp.argmax(axis_abs, axis=-1)
    ax = axis_abs[..., 0]
    ay = axis_abs[..., 1]
    az = axis_abs[..., 2]
    # Resolve signs relative to the dominant axis component.
    sx = jnp.where(amax == 0, ax, jnp.where(amax == 1, jnp.sign(s01) * ax, jnp.sign(s02) * ax))
    sy = jnp.where(amax == 0, jnp.sign(s01) * ay, jnp.where(amax == 1, ay, jnp.sign(s12) * ay))
    sz = jnp.where(amax == 0, jnp.sign(s02) * az, jnp.where(amax == 1, jnp.sign(s12) * az, az))
    axis_pi = jnp.stack([sx, sy, sz], axis=-1)
    # Align overall sign with the antisymmetric part (which may be tiny but
    # carries the correct orientation unless exactly at pi).
    dot = jnp.sum(axis_pi * w_sin, axis=-1, keepdims=True)
    axis_pi = jnp.where(dot < 0, -axis_pi, axis_pi)
    w_pi = theta[..., None] * axis_pi

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian Jl of SO(3): [..., 3] -> [..., 3, 3].

    Jl = I + B * hat(w) + C * hat(w)^2, B = (1-cos t)/t^2, C = (t - sin t)/t^3.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < _EPS
    safe_t = jnp.where(small, 1.0, theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / jnp.maximum(theta2, _EPS * _EPS))
    C = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (safe_t - jnp.sin(safe_t)) / jnp.maximum(theta2 * safe_t, _EPS * _EPS),
    )
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian Jr(w) = Jl(-w) (reference: ImuTypes RightJacobianSO3)."""
    return left_jacobian(-w)


def inv_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian: Jl^-1 = I - 1/2 hat(w) + D hat(w)^2.

    D = 1/t^2 - (1 + cos t) / (2 t sin t), Taylor: 1/12 + t^2/720.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < _EPS
    safe_t = jnp.where(small, 1.0, theta)
    sin_t = jnp.sin(safe_t)
    D = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / jnp.maximum(theta2, _EPS * _EPS)
        - (1.0 + jnp.cos(safe_t)) / jnp.maximum(2.0 * safe_t * sin_t, 1e-12),
    )
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + D[..., None, None] * W2


def inv_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian (reference: ImuTypes InverseRightJacobianSO3)."""
    return inv_left_jacobian(-w)


def normalize(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize a drifting rotation matrix via Gram-Schmidt.

    Cheap alternative to SVD projection; adequate for incremental drift in f32
    (reference keeps rotations normalized via Sophus' quaternion storage).
    """
    r0 = R[..., 0, :]
    r0 = r0 / jnp.linalg.norm(r0, axis=-1, keepdims=True)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r0 * r1, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (x, y, z, w) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (x, y, z, w).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the best-conditioned one (largest pivot) with where-selects.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the max.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], axis=-1) / (4.0 * qw0[..., None])

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1) / (4.0 * qx1[..., None])

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], axis=-1) / (4.0 * qy2[..., None])

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], axis=-1) / (4.0 * qz3[..., None])

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.where(
        (best == 0)[..., None], q0,
        jnp.where((best == 1)[..., None], q1, jnp.where((best == 2)[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
