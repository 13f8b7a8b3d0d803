"""Inertial residuals between consecutive keyframes.

Replaces the g2o inertial edges (reference: src/G2oTypes.cc EdgeInertial:576,
EdgeInertialGS:639, EdgeGyroRW/EdgeAccRW:736/778). States are world-frame
body poses (R_wb, p_w), velocities v_w, and biases; the 9-dof residual
couples a preintegrated window to the two endpoint states.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import so3
from . import preintegration as pre_mod
from .preintegration import Preintegrated, GRAVITY


def inertial_residual(R_i, p_i, v_i, R_j, p_j, v_j, bg, ba,
                      pre: Preintegrated, gravity=GRAVITY) -> jnp.ndarray:
    """9-vector [er, ev, ep] (reference: EdgeInertial::computeError)."""
    dt = pre.dT
    dR = pre_mod.delta_rotation(pre, bg)
    dV = pre_mod.delta_velocity(pre, bg, ba)
    dP = pre_mod.delta_position(pre, bg, ba)
    er = so3.log(dR.T @ R_i.T @ R_j)
    ev = R_i.T @ (v_j - v_i - gravity * dt) - dV
    ep = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


def information_9(pre: Preintegrated) -> jnp.ndarray:
    """Information matrix of the 9-dof residual = inv of the nav-state
    covariance block, symmetrized (reference: EdgeInertial ctor)."""
    C = pre.C[0:9, 0:9]
    C = 0.5 * (C + C.T) + 1e-10 * jnp.eye(9)
    info = jnp.linalg.inv(C)
    return 0.5 * (info + info.T)


def bias_walk_residual(bg_i, ba_i, bg_j, ba_j) -> jnp.ndarray:
    """Random-walk residual between consecutive bias states
    (reference: EdgeGyroRW / EdgeAccRW)."""
    return jnp.concatenate([bg_j - bg_i, ba_j - ba_i])


def bias_walk_information(pre: Preintegrated) -> jnp.ndarray:
    Cw = pre.C[9:15, 9:15] + 1e-12 * jnp.eye(6)
    info = jnp.linalg.inv(Cw)
    return 0.5 * (info + info.T)
