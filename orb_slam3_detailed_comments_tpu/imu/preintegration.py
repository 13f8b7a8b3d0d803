"""IMU preintegration on manifold (Forster et al.), batched as a lax.scan.

Replaces IMU::Preintegrated (reference: src/ImuTypes.cc:247
IntegrateNewMeasurement, include/ImuTypes.h:210-266): delta rotation /
velocity / position between frames, 15x15 noise covariance propagation, and
the five bias Jacobians (JRg, JVg, JVa, JPg, JPa) that allow first-order
bias correction without reintegration.

State ordering for the covariance: [phi (3), v (3), p (3), bg (3), ba (3)].
All functions are jit-friendly; integration over a measurement window is a
single scan so a whole frame gap (hundreds of samples) is one device program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import so3

GRAVITY = jnp.array([0.0, 0.0, -9.81])


class ImuCalib(NamedTuple):
    """Noise densities (already discretized per sqrt(s)) + extrinsics.

    (reference: IMU::Calib, include/ImuTypes.h:92-126)
    """
    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    R_bc: jnp.ndarray = None   # body<-camera rotation
    t_bc: jnp.ndarray = None

    @staticmethod
    def default():
        return ImuCalib(R_bc=jnp.eye(3), t_bc=jnp.zeros(3))


class Preintegrated(NamedTuple):
    dT: jnp.ndarray       # [] total time
    dR: jnp.ndarray       # [3, 3]
    dV: jnp.ndarray       # [3]
    dP: jnp.ndarray       # [3]
    C: jnp.ndarray        # [15, 15] covariance
    JRg: jnp.ndarray      # [3, 3] d dR / d bg
    JVg: jnp.ndarray      # [3, 3]
    JVa: jnp.ndarray      # [3, 3]
    JPg: jnp.ndarray      # [3, 3]
    JPa: jnp.ndarray      # [3, 3]
    bg0: jnp.ndarray      # [3] gyro bias used during integration
    ba0: jnp.ndarray      # [3] acc bias used


def init(bg0=None, ba0=None) -> Preintegrated:
    z3 = jnp.zeros(3)
    return Preintegrated(
        dT=jnp.zeros(()), dR=jnp.eye(3), dV=z3, dP=z3,
        C=jnp.zeros((15, 15)),
        JRg=jnp.zeros((3, 3)), JVg=jnp.zeros((3, 3)), JVa=jnp.zeros((3, 3)),
        JPg=jnp.zeros((3, 3)), JPa=jnp.zeros((3, 3)),
        bg0=bg0 if bg0 is not None else z3,
        ba0=ba0 if ba0 is not None else z3)


def integrate_step(state: Preintegrated, meas, calib: ImuCalib) -> Preintegrated:
    """One measurement (acc [3], gyro [3], dt []) — the reference's
    IntegrateNewMeasurement math (ImuTypes.cc:247-330)."""
    acc, gyro, dt = meas
    a = acc - state.ba0
    w = gyro - state.bg0

    dt2 = dt * dt
    Ra = state.dR @ so3.hat(a) * 1.0   # used via hat below
    a_hat = so3.hat(a)

    # position/velocity update with the OLD rotation (midpoint order as ref)
    dP = state.dP + state.dV * dt + 0.5 * (state.dR @ a) * dt2
    dV = state.dV + (state.dR @ a) * dt

    # covariance propagation (A, B blocks) BEFORE rotation update,
    # matching eq. (62-63) Forster / reference A,B matrices
    dRi = so3.exp(w * dt)
    Jr = so3.right_jacobian(w * dt)

    I3 = jnp.eye(3)
    A = jnp.zeros((9, 9))
    A = A.at[0:3, 0:3].set(dRi.T)
    A = A.at[3:6, 0:3].set(-state.dR @ a_hat * dt)
    A = A.at[6:9, 0:3].set(-0.5 * state.dR @ a_hat * dt2)
    A = A.at[3:6, 3:6].set(I3)
    A = A.at[6:9, 3:6].set(I3 * dt)
    A = A.at[6:9, 6:9].set(I3)
    B = jnp.zeros((9, 6))
    B = B.at[0:3, 0:3].set(Jr * dt)
    B = B.at[3:6, 3:6].set(state.dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * state.dR * dt2)

    Nga = jnp.diag(jnp.array([calib.noise_gyro ** 2] * 3
                             + [calib.noise_acc ** 2] * 3)) / dt
    Cnav = A @ state.C[0:9, 0:9] @ A.T + B @ Nga @ B.T
    Nwalk = jnp.diag(jnp.array([calib.walk_gyro ** 2] * 3
                               + [calib.walk_acc ** 2] * 3)) * dt
    C = state.C.at[0:9, 0:9].set(Cnav)
    C = C.at[9:15, 9:15].add(Nwalk)

    # bias Jacobians (reference: ImuTypes.cc:310-325)
    JPa = state.JPa + state.JVa * dt - 0.5 * state.dR * dt2
    JPg = state.JPg + state.JVg * dt - 0.5 * state.dR @ a_hat @ state.JRg * dt2
    JVa = state.JVa - state.dR * dt
    JVg = state.JVg - state.dR @ a_hat @ state.JRg * dt
    JRg = dRi.T @ state.JRg - Jr * dt

    dR = so3.normalize(state.dR @ dRi)
    return Preintegrated(state.dT + dt, dR, dV, dP, C,
                         JRg, JVg, JVa, JPg, JPa, state.bg0, state.ba0)


@jax.jit
def integrate(accs: jnp.ndarray, gyros: jnp.ndarray, dts: jnp.ndarray,
              calib: ImuCalib, bg0=None, ba0=None,
              valid: jnp.ndarray = None) -> Preintegrated:
    """Integrate a padded measurement window [M, 3]x[M, 3]x[M] with a scan.
    valid [M] masks padding (dt of padded entries should be 0 anyway).

    jitted at module level: an un-jitted lax.scan re-traces (and re-COMPILES)
    on every call because the step closure is a fresh function object each
    time — measured at 0.86 s of XLA compile per tracked frame."""
    state = init(bg0, ba0)
    if valid is None:
        valid = jnp.ones(dts.shape[0], bool)

    def step(s, x):
        acc, gyro, dt, v = x
        s2 = integrate_step(s, (acc, gyro, dt), calib)
        s = jax.tree.map(lambda a, b: jnp.where(v, a, b), s2, s)
        return s, None

    state, _ = jax.lax.scan(step, state, (accs, gyros, dts, valid))
    return state


# --- bias-corrected getters (reference: ImuTypes.cc GetDeltaRotation etc.) --

def delta_rotation(pre: Preintegrated, bg: jnp.ndarray) -> jnp.ndarray:
    db = bg - pre.bg0
    return pre.dR @ so3.exp(pre.JRg @ db)


def delta_velocity(pre: Preintegrated, bg, ba) -> jnp.ndarray:
    return pre.dV + pre.JVg @ (bg - pre.bg0) + pre.JVa @ (ba - pre.ba0)


def delta_position(pre: Preintegrated, bg, ba) -> jnp.ndarray:
    return pre.dP + pre.JPg @ (bg - pre.bg0) + pre.JPa @ (ba - pre.ba0)


@jax.jit
def merge(a: Preintegrated, b: Preintegrated) -> Preintegrated:
    """Concatenate two preintegrations (a then b) sharing a's bias.

    (reference: Preintegrated::MergePrevious, ImuTypes.cc:330). Used when a
    keyframe between two others is culled, and per frame to extend the
    since-keyframe window; jitted so the per-frame call is one dispatch.
    First-order in b's bias deltas.
    """
    # re-express b at a's bias
    dRb = delta_rotation(b, a.bg0)
    dVb = delta_velocity(b, a.bg0, a.ba0)
    dPb = delta_position(b, a.bg0, a.ba0)
    dR = so3.normalize(a.dR @ dRb)
    dV = a.dV + a.dR @ dVb
    dP = a.dP + a.dV * b.dT + a.dR @ dPb
    # Jacobian composition
    JRg = dRb.T @ a.JRg + b.JRg
    JVg = a.JVg + a.dR @ b.JVg - a.dR @ so3.hat(dVb) @ a.JRg
    JVa = a.JVa + a.dR @ b.JVa
    JPg = (a.JPg + a.JVg * b.dT + a.dR @ b.JPg
           - a.dR @ so3.hat(dPb) @ a.JRg)
    JPa = a.JPa + a.JVa * b.dT + a.dR @ b.JPa
    C = a.C + b.C  # conservative first-order combination
    return Preintegrated(a.dT + b.dT, dR, dV, dP, C,
                         JRg, JVg, JVa, JPg, JPa, a.bg0, a.ba0)


def predict_state(R_wb: jnp.ndarray, v_w: jnp.ndarray, p_w: jnp.ndarray,
                  pre: Preintegrated, bg, ba, gravity=GRAVITY):
    """Dead-reckon the next body state from a preintegrated window
    (reference: Tracking::PredictStateIMU, Tracking.cc:1892)."""
    dt = pre.dT
    dR = delta_rotation(pre, bg)
    dV = delta_velocity(pre, bg, ba)
    dP = delta_position(pre, bg, ba)
    R2 = so3.normalize(R_wb @ dR)
    v2 = v_w + gravity * dt + R_wb @ dV
    p2 = p_w + v_w * dt + 0.5 * gravity * dt * dt + R_wb @ dP
    return R2, v2, p2
