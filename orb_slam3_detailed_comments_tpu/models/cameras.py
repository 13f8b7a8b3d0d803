"""Camera models: pinhole (radial-tangential) and Kannala-Brandt8 fisheye.

Replaces the reference's CameraModels/ (GeometricCamera.h, Pinhole.cpp,
KannalaBrandt8.cpp). Everything is batched over points ([..., 3] / [..., 2])
and traceable: no python branching on data, so models can live inside jitted
tracking/BA steps. Model parameters travel as a flat f32 vector so a stack of
heterogeneous-intrinsic cameras is just a [C, P] array.

Conventions: points are in camera frame (z forward); pixel coords (u, v).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Camera kind enum (static python int per camera object; the functional ops
# below are per-kind, dispatch happens at trace time).
PINHOLE = 0
FISHEYE_KB8 = 1


class CameraParams(NamedTuple):
    """Flat camera description.

    kind: PINHOLE or FISHEYE_KB8 (python int, static under jit)
    fx, fy, cx, cy: pinhole core
    dist: distortion coefficients —
        PINHOLE:      (k1, k2, p1, p2, k3)   [OpenCV radtan; k3 optional=0]
        FISHEYE_KB8:  (k1, k2, k3, k4, 0)    [equidistant polynomial]
    width, height: image size in px (static python ints)
    """

    kind: int
    fx: float
    fy: float
    cx: float
    cy: float
    dist: tuple
    width: int
    height: int

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def fov_bound_cos(self) -> float:
        """cos of a conservative max half-FOV used for frustum checks."""
        import math

        # diagonal half-angle through the pinhole core
        half_w = max(self.cx, self.width - self.cx) / self.fx
        half_h = max(self.cy, self.height - self.cy) / self.fy
        tan_d = math.hypot(half_w, half_h)
        if self.kind == FISHEYE_KB8:
            tan_d = max(tan_d, math.tan(math.radians(89.0)))
        return math.cos(math.atan(tan_d))


def pinhole(fx, fy, cx, cy, width, height, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0):
    return CameraParams(PINHOLE, float(fx), float(fy), float(cx), float(cy),
                        (float(k1), float(k2), float(p1), float(p2), float(k3)),
                        int(width), int(height))


def fisheye_kb8(fx, fy, cx, cy, width, height, k1=0.0, k2=0.0, k3=0.0, k4=0.0):
    return CameraParams(FISHEYE_KB8, float(fx), float(fy), float(cx), float(cy),
                        (float(k1), float(k2), float(k3), float(k4), 0.0),
                        int(width), int(height))


# ---------------------------------------------------------------------------
# Pinhole + radtan distortion (reference: CameraModels/Pinhole.cpp)
# ---------------------------------------------------------------------------

def _radtan_distort(xn: jnp.ndarray, dist) -> jnp.ndarray:
    k1, k2, p1, p2, k3 = dist
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _radtan_undistort(xd: jnp.ndarray, dist, iters: int = 8) -> jnp.ndarray:
    """Iterative inverse of radtan distortion (fixed-point, as OpenCV)."""
    def body(_, xn):
        k1, k2, p1, p2, k3 = dist
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xn_new = (xd - jnp.stack([dx, dy], axis=-1)) / radial[..., None]
        return xn_new

    return jax.lax.fori_loop(0, iters, body, xd)


# ---------------------------------------------------------------------------
# Kannala-Brandt equidistant fisheye (reference: CameraModels/KannalaBrandt8.cpp:40-228)
# ---------------------------------------------------------------------------

def _kb8_theta_d(theta: jnp.ndarray, dist) -> jnp.ndarray:
    k1, k2, k3, k4, _ = dist
    t2 = theta * theta
    return theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))


def _kb8_invert_theta(theta_d: jnp.ndarray, dist, iters: int = 10) -> jnp.ndarray:
    """Newton solve theta from theta_d (reference: KannalaBrandt8.cpp:142-228)."""
    k1, k2, k3, k4, _ = dist

    def body(_, th):
        t2 = th * th
        f = th * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d
        df = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + t2 * 9.0 * k4)))
        return th - f / jnp.maximum(df, 1e-6)

    theta0 = jnp.clip(theta_d, -jnp.pi, jnp.pi)
    return jax.lax.fori_loop(0, iters, body, theta0)


# ---------------------------------------------------------------------------
# Public API: project / unproject / project_jac — per camera kind
# ---------------------------------------------------------------------------

def project(cam: CameraParams, pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points [..., 3] -> pixels [..., 2].

    Points behind the camera get garbage projections; callers must gate on
    valid_depth / in_image masks (XLA-friendly: no NaNs produced).
    """
    if cam.kind == PINHOLE:
        z = pc[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        xn = pc[..., 0:2] / safe_z[..., None]
        xd = _radtan_distort(xn, cam.dist)
        u = cam.fx * xd[..., 0] + cam.cx
        v = cam.fy * xd[..., 1] + cam.cy
        return jnp.stack([u, v], axis=-1)
    elif cam.kind == FISHEYE_KB8:
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        r = jnp.sqrt(x * x + y * y)
        safe_r = jnp.maximum(r, 1e-9)
        theta = jnp.arctan2(r, z)
        td = _kb8_theta_d(theta, cam.dist)
        scale = td / safe_r
        u = cam.fx * x * scale + cam.cx
        v = cam.fy * y * scale + cam.cy
        return jnp.stack([u, v], axis=-1)
    raise ValueError(f"unknown camera kind {cam.kind}")


def unproject(cam: CameraParams, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] -> unit-depth bearing rays [..., 3] (z = 1 plane for
    pinhole; normalized so z=1 for fisheye too, valid for theta < pi/2...
    for wider angles use unproject_bearing)."""
    b = unproject_bearing(cam, uv)
    z = jnp.where(jnp.abs(b[..., 2]) < 1e-6, 1e-6, b[..., 2])
    return b / z[..., None]


def unproject_bearing(cam: CameraParams, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] -> unit-norm bearing vectors [..., 3]."""
    xd = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    if cam.kind == PINHOLE:
        xn = _radtan_undistort(xd, cam.dist)
        b = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    elif cam.kind == FISHEYE_KB8:
        theta_d = jnp.sqrt(jnp.sum(xd * xd, axis=-1))
        theta = _kb8_invert_theta(theta_d, cam.dist)
        safe_td = jnp.maximum(theta_d, 1e-9)
        sin_t = jnp.sin(theta)
        b = jnp.stack(
            [
                sin_t * xd[..., 0] / safe_td,
                sin_t * xd[..., 1] / safe_td,
                jnp.cos(theta),
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown camera kind {cam.kind}")
    return b / jnp.linalg.norm(b, axis=-1, keepdims=True)


def project_jac(cam: CameraParams, pc: jnp.ndarray) -> jnp.ndarray:
    """d(uv)/d(pc): [..., 2, 3] via jacfwd of the scalar-point projection.

    XLA fuses this with the surrounding BA residual computation; there is no
    benefit to hand-derived Jacobians on TPU (reference hand-codes them in
    Pinhole::projectJac / KannalaBrandt8::projectJac).
    """
    flat = pc.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(lambda p: project(cam, p)))(flat)
    return J.reshape(*pc.shape[:-1], 2, 3)


def in_image(cam: CameraParams, uv: jnp.ndarray, border: float = 0.0) -> jnp.ndarray:
    """Boolean mask [...]: pixel inside image bounds (with border margin)."""
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < cam.width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < cam.height - border)
    )


def undistort_points(cam: CameraParams, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels -> ideal-pinhole pixels with the same K.

    Used by the frontend to build the undistorted-keypoint table the matcher
    and BA operate on (reference: Frame::UndistortKeyPoints, Frame.cc:1003).
    For fisheye the reference keeps raw keypoints and projects through the
    model instead — callers pass through in that case.
    """
    if cam.kind == FISHEYE_KB8:
        return uv
    xn = unproject(cam, uv)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)
