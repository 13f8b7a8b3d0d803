"""Image pyramid + Gaussian blur for the ORB frontend.

Replaces ORBextractor::ComputePyramid (reference: src/ORBextractor.cc:1687)
and the pre-descriptor GaussianBlur (reference: src/ORBextractor.cc:1630-1645).

Levels have static shapes derived from the base resolution at trace time, so
the whole frontend compiles once per camera config. All levels are float32 in
[0, 255] domain.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_N_LEVELS = 8
DEFAULT_SCALE = 1.2
RESIZE_IMPL = "mm"   # "mm" = MXU interpolation-matrix matmuls (cv2-exact)


def level_shapes(h: int, w: int, n_levels: int = DEFAULT_N_LEVELS,
                 scale: float = DEFAULT_SCALE, multiple: int = 8):
    """Static per-level (h, w), rounded up to `multiple` for TPU tiling."""
    shapes = []
    for lv in range(n_levels):
        s = scale ** lv
        lh = int(round(h / s))
        lw = int(round(w / s))
        lh = ((lh + multiple - 1) // multiple) * multiple
        lw = ((lw + multiple - 1) // multiple) * multiple
        shapes.append((lh, lw))
    return shapes


def scale_factors(n_levels: int = DEFAULT_N_LEVELS, scale: float = DEFAULT_SCALE):
    return np.array([scale ** lv for lv in range(n_levels)], dtype=np.float32)


def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (half-pixel convention,
    matching jax.image.resize 'bilinear')."""
    m = np.zeros((n_out, n_in), np.float32)
    p = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    p = np.clip(p, 0.0, n_in - 1)
    lo = np.floor(p).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    f = (p - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1.0 - f
    m[np.arange(n_out), hi] += f
    return m


def resize_bilinear_mm(img: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """Bilinear resize as two interpolation-matrix matmuls: rides the MXU
    instead of jax.image.resize's gather-based path (one-channel gathers
    are VPU/latency-bound on TPU)."""
    ch, cw = img.shape
    rh = jnp.asarray(_resize_matrix(nh, ch))
    rw = jnp.asarray(_resize_matrix(nw, cw))
    hp = jax.lax.Precision.HIGHEST
    return jax.lax.dot(jax.lax.dot(rh, img, precision=hp), rw.T, precision=hp)


def build_pyramid(img: jnp.ndarray, n_levels: int = DEFAULT_N_LEVELS,
                  scale: float = DEFAULT_SCALE) -> list:
    """img [H, W] float32 -> list of [h_l, w_l] float32 levels.

    Each level is resized from the previous (cascaded, like the reference)
    with bilinear interpolation expressed as interpolation-matrix matmuls
    (MXU); the padded margin (from rounding shapes up) replicates edge
    pixels so FAST does not fire on a synthetic border.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    # effective content size at each level (before pad-to-multiple)
    levels = []
    cur = img
    ch, cw = h, w
    for lv in range(n_levels):
        lh, lw = shapes[lv]
        if lv > 0:
            nh = int(round(h / scale ** lv))
            nw = int(round(w / scale ** lv))
            if RESIZE_IMPL == "mm":
                cur = resize_bilinear_mm(cur, nh, nw)
            else:   # A/B only: the old anti-aliased gather path
                cur = jax.image.resize(cur, (nh, nw), method="bilinear")
            ch, cw = nh, nw
        pad_h, pad_w = shapes[lv][0] - ch, shapes[lv][1] - cw
        lvl = jnp.pad(cur, ((0, pad_h), (0, pad_w)), mode="edge")
        levels.append(lvl)
    return levels


def _gauss_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with edge replication, [H, W] -> [H, W].

    Implemented as shift-and-add (2*ksize weighted rolls) instead of
    lax.conv: a single-channel NCHW conv cannot tile onto the MXU and runs
    ~30x slower on TPU than these fused VPU element-wise passes.
    """
    k = _gauss_kernel1d(ksize, sigma)
    r = ksize // 2
    H, W = img.shape
    x = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    # static slices instead of rolls: XLA fuses the shifted adds without
    # materializing each rotated copy
    out = jnp.zeros((H, W + 2 * r), img.dtype)
    for i, w in enumerate(k):
        out = out + float(w) * x[i:i + H, :]
    out2 = jnp.zeros((H, W), img.dtype)
    for i, w in enumerate(k):
        out2 = out2 + float(w) * out[:, i:i + W]
    return out2
