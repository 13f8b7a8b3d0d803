"""Reprojection residuals + analytic Jacobians for GN/LM.

Replaces the g2o edge types (reference: src/OptimizableTypes.cpp
EdgeSE3ProjectXYZ[OnlyPose], src/G2oTypes.cc EdgeMono/EdgeStereo). Everything
is batched over observations; pose perturbations are LEFT-multiplied twists
delta = (rho, phi):  T_cw <- exp(delta) ∘ T_cw, giving
d(p_c)/d(delta) = [ I | -hat(p_c) ].
"""
from __future__ import annotations

import jax.numpy as jnp

from ..lie import SE3
from ..models import cameras


def camera_points(T_cw: SE3, X_w: jnp.ndarray) -> jnp.ndarray:
    return T_cw.apply(X_w)


def _twist_jac(Jproj: jnp.ndarray, pc: jnp.ndarray) -> jnp.ndarray:
    """J_cam = Jproj @ [I | -hat(pc)], written out element-wise.

    The batched [..,2,3]@[..,3,6] form lowers to per-entry tiny matmuls on
    TPU (4x slower end-to-end in BA, measured); unrolled, the products fuse
    into the surrounding element-wise graph.
    """
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    rows = []
    for k in range(Jproj.shape[-2]):
        Jk0, Jk1, Jk2 = (Jproj[..., k, 0], Jproj[..., k, 1],
                         Jproj[..., k, 2])
        rows.append(jnp.stack([
            Jk0, Jk1, Jk2,
            Jk2 * y - Jk1 * z,
            Jk0 * z - Jk2 * x,
            Jk1 * x - Jk0 * y], axis=-1))
    return jnp.stack(rows, axis=-2)                  # [.., 2, 6]


def _point_jac(Jproj: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """J_pt = Jproj @ R, unrolled (see _twist_jac). R broadcasts: [3,3] for
    one pose or [.., 3, 3] batched."""
    rows = []
    for k in range(Jproj.shape[-2]):
        Jk0, Jk1, Jk2 = (Jproj[..., k, 0], Jproj[..., k, 1],
                         Jproj[..., k, 2])
        rows.append(jnp.stack([
            Jk0 * R[..., 0, j] + Jk1 * R[..., 1, j] + Jk2 * R[..., 2, j]
            for j in range(3)], axis=-1))
    return jnp.stack(rows, axis=-2)                  # [.., 2, 3]


def residual_pose(T_cw: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                  cam: cameras.CameraParams):
    """r = uv - proj(T_cw X) and J = d proj / d twist.

    X_w [M, 3], uv [M, 2] -> r [M, 2], J [M, 2, 6], depth_ok [M].
    """
    pc = camera_points(T_cw, X_w)
    pred = cameras.project(cam, pc)
    r = uv - pred
    Jproj = cameras.project_jac(cam, pc)             # [M, 2, 3]
    return r, _twist_jac(Jproj, pc), pc[..., 2] > 0.05


def residual_point(T_cw: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                   cam: cameras.CameraParams):
    """Same residual, Jacobian wrt the world point: J_p = Jproj @ R
    (J is d(prediction)/d(state); the residual is z - h)."""
    pc = camera_points(T_cw, X_w)
    pred = cameras.project(cam, pc)
    r = uv - pred
    Jproj = cameras.project_jac(cam, pc)
    return r, _point_jac(Jproj, T_cw.R), pc[..., 2] > 0.05


def residual_full(T_cw: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                  cam: cameras.CameraParams):
    """r, J_cam [M,2,6], J_pt [M,2,3], depth_ok — for BA."""
    pc = camera_points(T_cw, X_w)
    pred = cameras.project(cam, pc)
    r = uv - pred
    Jproj = cameras.project_jac(cam, pc)
    return (r, _twist_jac(Jproj, pc), _point_jac(Jproj, T_cw.R),
            pc[..., 2] > 0.05)


# --- robust kernels ---------------------------------------------------------

CHI2_MONO = 5.991    # chi2(0.95, 2 dof)  (reference: Optimizer.cc:291)
CHI2_STEREO = 7.815  # chi2(0.95, 3 dof)


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given squared error chi2 = e^T Ω e.

    w = 1 for chi2 <= delta^2 else delta / |e|.
    """
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
