"""Pallas TPU kernel: fused dense frontend maps for one pyramid level.

The XLA path computes four dense per-pixel maps in separate passes, each
reading/writing full images in HBM: FAST-9/16 score + 3x3 NMS (ops/fast.py),
7x7 sigma=2 Gaussian blur (ops/pyramid.py), and the IC-angle circular-patch
moment maps m10/m01 (ops/brief.py). This kernel computes all four in ONE
pass with the image strip resident in VMEM: one HBM read of the image, four
HBM writes of the outputs, every intermediate VMEM-only (reference hot path:
ORBextractor::ComputeKeyPointsOctTree + GaussianBlur + IC_Angle,
src/ORBextractor.cc:91,1061,1630).

Semantics match the XLA forms everywhere a real keypoint can live (>= margin
16 px inside the content): borders use edge-replication instead of
fast_score's wrap-around rolls, and the moment row-segment sums use binary
window doubling instead of prefix-sum differences (same values, different
f32 summation order).

The kernel is gridded over ROW STRIPS (STRIP rows + a 16-row halo on each
side, built by the caller with edge replication) rather than one whole-image
program: a whole-image instance keeps dozens of full-image f32 temporaries
live at once, which blows past VMEM and sends the Mosaic scheduler into
multi-minute compiles. Strips bound the live set and compile in seconds.

MEASURED RESULT (v5e, 752x480, interleaved A/B over distinct frames): the
fused kernel LOSES to the XLA path — 4.97 vs 4.40 ms extractor e2e at
STRIP=128 (and 4.70 vs 4.14 at STRIP=32), i.e. XLA's own fusion of these
elementwise passes beats the hand-written strip kernel + halo recompute +
strip-layout copy. Kept opt-in (ORB_TPU_PALLAS=1) as the scaffold for
future fusions; the default extractor path stays XLA.
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

_PAD = 16    # horizontal halo for the moment windows (max half-width 15)
HALO = 16    # vertical halo rows: moments need 15, FAST score+NMS 4, blur 6
STRIP = 128  # interior rows computed per grid instance
# Mosaic's default 16 MB VMEM budget is conservative; v5e cores have far
# more.  Raising it lets the strip be wide enough that the halo recompute
# (2*HALO rows) is a small fraction of the work.
_VMEM_LIMIT = 100 * 1024 * 1024


def _pad_h_edge(a: jnp.ndarray, p: int) -> jnp.ndarray:
    """[H, W] -> [H, W+2p] edge replication along the lane axis."""
    left = jnp.broadcast_to(a[:, :1], (a.shape[0], p))
    right = jnp.broadcast_to(a[:, -1:], (a.shape[0], p))
    return jnp.concatenate([left, a, right], axis=1)


def _window_sums(ap: jnp.ndarray, widths, W: int, pad: int):
    """Horizontal window sums over [x-w, x+w] for each half-width w.

    ap: [T, W+2*pad] edge-padded rows. Returns {w: [T, W]}. Binary window
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


def _fast_section(f):
    """NMS'd FAST score for the interior rows of strip f [T, W]."""
    T, W = f.shape
    S = T - 2 * HALO
    # score computed for the band rows [4, T-4) (all real-neighbor rows);
    # the interior + its NMS ring lie inside since HALO >= 5.
    fph = _pad_h_edge(f, 3)                           # [T, W+6]
    B = T - 8
    center = fph[4: 4 + B, 3: 3 + W]

    D = [fph[4 + int(dy): 4 + int(dy) + B, 3 + int(dx): 3 + int(dx) + W]
         - center for dy, dx in _CIRCLE]

    def arc_min9(sign):
        """max_i min_{j<9} sign*D[(i+j)%16] with minimal liveness."""
        acc = None
        for i in range(16):
            m = sign * D[i]
            for j in range(1, 9):
                m = jnp.minimum(m, sign * D[(i + j) % 16])
            acc = m if acc is None else jnp.maximum(acc, m)
        return acc

    score = jnp.maximum(arc_min9(1.0), arc_min9(-1.0))   # [B, W]
    sp = _pad_h_edge(score, 1)                           # [B, W+2]
    o = HALO - 4                                          # interior in band
    mx = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            v = sp[o + dy: o + dy + S, 1 + dx: 1 + dx + W]
            mx = v if mx is None else jnp.maximum(mx, v)
    si = score[o: o + S]
    return jnp.where(si >= mx, si, 0.0)


def _blur_section(f):
    """Rounded 7x7 sigma=2 Gaussian for the interior rows (ops/pyramid.py +
    the extractor's integer rounding)."""
    T, W = f.shape
    S = T - 2 * HALO
    fph = _pad_h_edge(f, 3)
    k = [float(x) for x in _gauss_kernel1d(7, 2.0)]
    acc = k[0] * fph[:, 0:W]
    for i in range(1, 7):
        acc = acc + k[i] * fph[:, i: i + W]               # [T, W]
    out = k[0] * acc[HALO - 3: HALO - 3 + S]
    for i in range(1, 7):
        out = out + k[i] * acc[HALO - 3 + i: HALO - 3 + i + S]
    return jnp.round(out)


def _moments_section(f):
    """IC-angle circular moment maps m10/m01 for the interior rows
    (ops/brief.py _moment_maps)."""
    T, W = f.shape
    S = T - 2 * HALO
    # mean subtraction is pure f32-conditioning (the symmetric windows cancel
    # any constant), so the per-strip mean is equivalent
    imgc = f - jnp.mean(f)
    xcol = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1).astype(jnp.float32)
    ic = _pad_h_edge(imgc, _PAD)
    txp = _pad_h_edge(imgc * xcol, _PAD)

    widths = sorted({int(_U_MAX[abs(dv)])
                     for dv in range(-HALF_PATCH, HALF_PATCH + 1)})
    rs_all = _window_sums(ic, widths, W, _PAD)            # {w: [T, W]}
    ts_all = _window_sums(txp, widths, W, _PAD)

    m10 = jnp.zeros((S, W), jnp.float32)
    m01 = jnp.zeros((S, W), jnp.float32)
    R = HALF_PATCH
    for w in widths:
        rsw, tsw = rs_all[w], ts_all[w]
        # subtract x*rowsum at FULL strip height, then slice: slicing an
        # iota product then multiplying trips a Mosaic internal check
        # (limits[i] <= dim(i)); xcol rows are identical so this is
        # bit-exact with the sliced form
        dsw = tsw - xcol * rsw
        for dv in range(-R, R + 1):
            if int(_U_MAX[abs(dv)]) != w:
                continue
            rs = rsw[HALO + dv: HALO + dv + S]
            m10 = m10 + dsw[HALO + dv: HALO + dv + S]
            if dv != 0:
                m01 = m01 + float(dv) * rs
    return m10, m01


def _frontend_kernel(img_ref, score_ref, blur_ref, m10_ref, m01_ref):
    f = img_ref[:].astype(jnp.float32)               # [T, W] strip + halos
    score_ref[:] = _fast_section(f)
    blur_ref[:] = _blur_section(f)
    m10, m01 = _moments_section(f)
    m10_ref[:] = m10
    m01_ref[:] = m01


@partial(jax.jit, static_argnames=("interpret",))
def dense_frontend(img: jnp.ndarray, interpret: bool = False):
    """One fused pass: level image [H, W] -> (nms'd FAST score, rounded
    7x7 blur, m10, m01), all [H, W] float32."""
    H, W = img.shape
    f = img.astype(jnp.float32)
    n = -(-H // STRIP)
    Hp = n * STRIP
    # vertical edge replication + pad to a whole number of strips
    top = jnp.broadcast_to(f[:1], (HALO, W))
    bot = jnp.broadcast_to(f[-1:], (Hp - H + HALO, W))
    fp = jnp.concatenate([top, f, bot], axis=0)           # [Hp + 2*HALO, W]
    T = STRIP + 2 * HALO
    # strips laid out contiguously in rows: 2D blocks only (Mosaic rejects
    # singleton-leading 3D blocks with an internal check failure)
    strips = jnp.concatenate([fp[s * STRIP: s * STRIP + T]
                              for s in range(n)], axis=0)  # [n*T, W]
    shp = jax.ShapeDtypeStruct((n * STRIP, W), jnp.float32)
    outs = pl.pallas_call(
        _frontend_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((T, W), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((STRIP, W), lambda s: (s, 0))] * 4,
        out_shape=[shp, shp, shp, shp],
        interpret=interpret,
        **({} if interpret else {"compiler_params":
                                 pltpu.CompilerParams(
                                     vmem_limit_bytes=_VMEM_LIMIT)}),
    )(strips)
    return tuple(o[:H] for o in outs)
