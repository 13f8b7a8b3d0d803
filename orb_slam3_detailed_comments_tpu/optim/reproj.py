"""Reprojection residuals + analytic Jacobians for GN/LM.

Replaces the g2o edge types (reference: src/OptimizableTypes.cpp
EdgeSE3ProjectXYZ[OnlyPose], src/G2oTypes.cc EdgeMono/EdgeStereo). Everything
is batched over observations; pose perturbations are LEFT-multiplied twists
delta = (rho, phi):  T_cw <- exp(delta) ∘ T_cw, giving
d(p_c)/d(delta) = [ I | -hat(p_c) ].
"""
from __future__ import annotations

import jax.numpy as jnp

from ..lie import SE3, so3
from ..models import cameras


def camera_points(T_cw: SE3, X_w: jnp.ndarray) -> jnp.ndarray:
    return T_cw.apply(X_w)


def residual_pose(T_cw: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                  cam: cameras.CameraParams):
    """r = uv - proj(T_cw X) and J = d proj / d twist.

    X_w [M, 3], uv [M, 2] -> r [M, 2], J [M, 2, 6], depth_ok [M].
    """
    pc = camera_points(T_cw, X_w)
    pred = cameras.project(cam, pc)
    r = uv - pred
    Jproj = cameras.project_jac(cam, pc)             # [M, 2, 3]
    dP = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3)),
         -so3.hat(pc)], axis=-1)                     # [M, 3, 6]
    J = Jproj @ dP                                   # [M, 2, 6]
    return r, J, pc[..., 2] > 0.05


def residual_point(T_cw: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                   cam: cameras.CameraParams):
    """Same residual, Jacobian wrt the world point: J_p = Jproj @ R
    (J is d(prediction)/d(state); the residual is z - h)."""
    pc = camera_points(T_cw, X_w)
    pred = cameras.project(cam, pc)
    r = uv - pred
    Jproj = cameras.project_jac(cam, pc)
    Jp = Jproj @ jnp.broadcast_to(T_cw.R, (*pc.shape[:-1], 3, 3))
    return r, Jp, pc[..., 2] > 0.05


def residual_full(T_cw: SE3, X_w: jnp.ndarray, uv: jnp.ndarray,
                  cam: cameras.CameraParams):
    """r, J_cam [M,2,6], J_pt [M,2,3], depth_ok — for BA."""
    pc = camera_points(T_cw, X_w)
    pred = cameras.project(cam, pc)
    r = uv - pred
    Jproj = cameras.project_jac(cam, pc)
    dP = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3)),
         -so3.hat(pc)], axis=-1)
    Jc = Jproj @ dP
    Jp = Jproj @ jnp.broadcast_to(T_cw.R, (*pc.shape[:-1], 3, 3))
    return r, Jc, Jp, pc[..., 2] > 0.05


# --- robust kernels ---------------------------------------------------------

CHI2_MONO = 5.991    # chi2(0.95, 2 dof)  (reference: Optimizer.cc:291)
CHI2_STEREO = 7.815  # chi2(0.95, 3 dof)


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given squared error chi2 = e^T Ω e.

    w = 1 for chi2 <= delta^2 else delta / |e|.
    """
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
