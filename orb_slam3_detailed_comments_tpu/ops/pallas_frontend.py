"""Pallas TPU kernel: fused dense frontend maps for one pyramid level.

The XLA path computes four dense per-pixel maps in separate passes, each
reading/writing full images in HBM: FAST-9/16 score + 3x3 NMS (ops/fast.py),
7x7 sigma=2 Gaussian blur (ops/pyramid.py), and the IC-angle circular-patch
moment maps m10/m01 (ops/brief.py). This kernel computes all four in ONE
pass with the level image resident in VMEM: one HBM read of the image, four
HBM writes of the outputs, every intermediate VMEM-only (reference hot path:
ORBextractor::ComputeKeyPointsOctTree + GaussianBlur + IC_Angle,
src/ORBextractor.cc:91,1061,1630).

Semantics match the XLA forms everywhere a real keypoint can live (>= margin
16 px inside the content): borders use edge-replication instead of
fast_score's wrap-around rolls, and the moment row-segment sums use binary
window doubling instead of prefix-sum differences (same values, different
f32 summation order).

Whole-image single-program kernel: the largest level (752x480 f32) is
1.4 MB, far under the ~16 MB VMEM budget, and the compiler handles liveness
of the per-width temporaries.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import _CIRCLE
from .pyramid import _gauss_kernel1d
from .brief import HALF_PATCH, _U_MAX

_PAD = 16  # horizontal halo for the moment windows (max half-width 15)


def _pad_h_edge(a: jnp.ndarray, p: int) -> jnp.ndarray:
    """[H, W] -> [H, W+2p] edge replication along the lane axis."""
    left = jnp.broadcast_to(a[:, :1], (a.shape[0], p))
    right = jnp.broadcast_to(a[:, -1:], (a.shape[0], p))
    return jnp.concatenate([left, a, right], axis=1)


def _pad_v_edge(a: jnp.ndarray, p: int) -> jnp.ndarray:
    """[H, W] -> [H+2p, W] edge replication along the sublane axis."""
    top = jnp.broadcast_to(a[:1, :], (p, a.shape[1]))
    bot = jnp.broadcast_to(a[-1:, :], (p, a.shape[1]))
    return jnp.concatenate([top, a, bot], axis=0)


def _window_sums(ap: jnp.ndarray, widths, W: int, pad: int):
    """Horizontal window sums over [x-w, x+w] for each half-width w.

    ap: [H, W+2*pad] edge-padded rows. Returns {w: [H, W]}. Binary window
    doubling: partial sums of lengths 1,2,4,8,16, composed per width —
    O(log) shifted adds instead of a lane-axis prefix scan.
    """
    partials = {1: ap}
    for k in (2, 4, 8, 16):
        p = partials[k // 2]
        partials[k] = p[:, : p.shape[1] - k // 2] + p[:, k // 2:]
    out = {}
    for w in widths:
        L = 2 * w + 1
        start = pad - w
        acc = None
        off = 0
        for k in (16, 8, 4, 2, 1):
            if L & k:
                piece = partials[k][:, start + off: start + off + W]
                acc = piece if acc is None else acc + piece
                off += k
        out[w] = acc
    return out


def _frontend_kernel(img_ref, score_ref, blur_ref, m10_ref, m01_ref):
    img = img_ref[:]
    H, W = img.shape
    f = img.astype(jnp.float32)

    # ---- FAST-9/16 score + 3x3 NMS (ops/fast.py semantics, edge borders)
    fp = _pad_v_edge(_pad_h_edge(f, 3), 3)          # [H+6, W+6]

    def shift(dy, dx):
        return fp[3 + dy: 3 + dy + H, 3 + dx: 3 + dx + W]

    D = [shift(int(dy), int(dx)) - f for dy, dx in _CIRCLE]

    def arc_min9(x):
        m1 = [jnp.minimum(x[i], x[(i + 1) % 16]) for i in range(16)]
        m2 = [jnp.minimum(m1[i], m1[(i + 2) % 16]) for i in range(16)]
        m4 = [jnp.minimum(m2[i], m2[(i + 4) % 16]) for i in range(16)]
        m9 = [jnp.minimum(m4[i], x[(i + 8) % 16]) for i in range(16)]
        acc = m9[0]
        for i in range(1, 16):
            acc = jnp.maximum(acc, m9[i])
        return acc

    bright = arc_min9(D)
    dark = arc_min9([-d for d in D])
    score = jnp.maximum(bright, dark)

    sp = _pad_v_edge(_pad_h_edge(score, 1), 1)
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(mx, sp[1 + dy: 1 + dy + H, 1 + dx: 1 + dx + W])
    score_ref[:] = jnp.where(score >= mx, score, 0.0)

    # ---- 7x7 sigma=2 separable Gaussian, rounded (ops/pyramid.py +
    # the extractor's integer rounding)
    k = [float(x) for x in _gauss_kernel1d(7, 2.0)]
    gp = _pad_h_edge(f, 3)                           # [H, W+6]
    acc = k[0] * gp[:, 0:W]
    for i in range(1, 7):
        acc = acc + k[i] * gp[:, i: i + W]
    gv = _pad_v_edge(acc, 3)                         # [H+6, W]
    out = k[0] * gv[0:H, :]
    for i in range(1, 7):
        out = out + k[i] * gv[i: i + H, :]
    blur_ref[:] = jnp.round(out)

    # ---- IC-angle circular moment maps (ops/brief.py _moment_maps)
    imgc = f - jnp.mean(f)
    xcol = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    ic = _pad_h_edge(imgc, _PAD)
    # ts uses the UNPADDED x coordinate extended by edge replication, like
    # the prefix-sum form (edge columns replicate value*x at the edge)
    txp = _pad_h_edge(imgc * xcol, _PAD)

    widths = sorted({int(_U_MAX[abs(dv)])
                     for dv in range(-HALF_PATCH, HALF_PATCH + 1)})
    rs_all = _window_sums(ic, widths, W, _PAD)
    ts_all = _window_sums(txp, widths, W, _PAD)

    m10 = jnp.zeros((H, W), jnp.float32)
    m01 = jnp.zeros((H, W), jnp.float32)
    R = HALF_PATCH
    for w in widths:
        rsv = _pad_v_edge(rs_all[w], R)              # [H+2R, W]
        tsv = _pad_v_edge(ts_all[w], R)
        for dv in range(-R, R + 1):
            if int(_U_MAX[abs(dv)]) != w:
                continue
            rs = rsv[R + dv: R + dv + H, :]
            ts = tsv[R + dv: R + dv + H, :]
            m10 = m10 + (ts - xcol * rs)
            if dv != 0:
                m01 = m01 + float(dv) * rs
    m10_ref[:] = m10
    m01_ref[:] = m01


@partial(jax.jit, static_argnames=("interpret",))
def dense_frontend(img: jnp.ndarray, interpret: bool = False):
    """One fused pass: level image [H, W] -> (nms'd FAST score, rounded
    7x7 blur, m10, m01), all [H, W] float32."""
    H, W = img.shape
    shp = jax.ShapeDtypeStruct((H, W), jnp.float32)
    return pl.pallas_call(
        _frontend_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[shp, shp, shp, shp],
        interpret=interpret,
    )(img.astype(jnp.float32))
