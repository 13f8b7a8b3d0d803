"""FAST-16 corner detection + spatially-uniform keypoint selection.

Replaces ORBextractor::ComputeKeyPointsOctTree and DistributeOctTree
(reference: src/ORBextractor.cc:711-1061). The reference runs per-cell
OpenCV FAST with a 20->7 threshold fallback, then balances keypoints
spatially with a recursive quad-tree. Both are pointer-chasing, data-
dependent algorithms; here they are reformulated as dense tensor ops:

  * the corner score for EVERY pixel is computed at once on the VPU
    (score = the exact FAST "max threshold" score: max over the 32
    polarity x arc-start options of the min absolute contrast over 9
    contiguous circle pixels);
  * 3x3 non-max suppression is a max-pool comparison;
  * spatial balancing is per-cell top-k followed by a global rank-major
    selection (cell-rank 0 keypoints of all cells first, then rank 1, ...)
    which achieves the quad-tree's uniformity goal with static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, circularly ordered (dy, dx).
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LEN = 9  # contiguous pixels required (FAST-9/16, as cv::FAST TYPE_9_16)


def fast_score(img: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel FAST-9/16 corner score, [H, W] -> [H, W] float32.

    score(p) = max threshold t at which p is still a FAST corner:
        max over polarity/arc-start of min over the 9-arc of the contrast.
    Non-corners get score <= 0.
    """
    # 16 shifted differences D[k] = I(p + c_k) - I(p), kept as SEPARATE
    # [H, W] arrays: stacking them into [16, H, W] and rolling along axis 0
    # (the obvious doubling form) materializes ~8 full 16-plane temporaries
    # in HBM; unrolled, XLA fuses the whole min/max tree into one
    # elementwise pass over the image (measured 5.6x faster, bit-identical
    # — min/max trees are exact in any association order).
    D = [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) - img
         for dy, dx in _CIRCLE]

    def arc_max_min9(Ds):
        # max over arc starts of (min over 9 circularly-consecutive Ds),
        # windows built by doubling: 2 -> 4 -> 8 -> 9
        w2 = [jnp.minimum(Ds[k], Ds[(k + 1) % 16]) for k in range(16)]
        w4 = [jnp.minimum(w2[k], w2[(k + 2) % 16]) for k in range(16)]
        w8 = [jnp.minimum(w4[k], w4[(k + 4) % 16]) for k in range(16)]
        w9 = [jnp.minimum(w8[k], Ds[(k + 8) % 16]) for k in range(16)]
        out = w9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, w9[k])
        return out

    bright = arc_max_min9(D)                      # neighbors brighter
    dark = arc_max_min9([-d for d in D])          # neighbors darker
    return jnp.maximum(bright, dark)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep local maxima of a 3x3 neighborhood (score of suppressed px = 0)."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= mx, score, 0.0)


def border_mask(shape, content_hw, margin: int) -> jnp.ndarray:
    """Mask True inside [margin, content-margin) on both axes.

    `shape` is the padded level shape; `content_hw` the valid image extent.
    """
    h, w = shape
    ch, cw = content_hw
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (ys >= margin) & (ys < ch - margin) & (xs >= margin) & (xs < cw - margin)


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one pyramid level."""

    yx: jnp.ndarray      # [N, 2] int32 (row, col) in level coords
    score: jnp.ndarray   # [N] float32
    valid: jnp.ndarray   # [N] bool


@partial(jax.jit, static_argnames=("n_target", "cell", "k_per_cell", "min_th"))
def select_grid_topk(score: jnp.ndarray, n_target: int, cell: int = 32,
                     k_per_cell: int = 4, min_th: float = 7.0) -> Keypoints:
    """Spatially-uniform top-N keypoint selection with static shapes.

    1. per-cell top-k on the NMS'd score map;
    2. global selection in cell-rank-major order (all cells' best first),
       ties within a rank broken by score.
    """
    h, w = score.shape
    ph = (-h) % cell
    pw = (-w) % cell
    s = jnp.pad(score, ((0, ph), (0, pw)), constant_values=0.0)
    H, W = h + ph, w + pw
    ncy, ncx = H // cell, W // cell
    cells = s.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(
        ncy * ncx, cell * cell
    )
    if jax.default_backend() == "tpu" and (cell * cell) % 128 == 0:
        # k sequential (max, argmax, mask) passes over VMEM-resident cells:
        # one HBM read instead of lax.top_k's general sort (measured 87x
        # faster, output bit-identical including tie order)
        from . import pallas_topk
        top_s, top_i = pallas_topk.cell_topk(cells, k_per_cell)
    else:
        top_s, top_i = jax.lax.top_k(cells, k_per_cell)    # [C, k] desc-sorted
    # flat level coords of each candidate
    cy = jnp.arange(ncy * ncx) // ncx
    cx = jnp.arange(ncy * ncx) % ncx
    iy = cy[:, None] * cell + top_i // cell
    ix = cx[:, None] * cell + top_i % cell

    cand_score = top_s.reshape(-1)
    cand_y = iy.reshape(-1)
    cand_x = ix.reshape(-1)
    rank = jnp.broadcast_to(jnp.arange(k_per_cell)[None, :], top_s.shape).reshape(-1)

    ok = cand_score >= min_th
    # rank-major key: lower rank first, then higher score. Score is bounded
    # by 255 so 1024 separates rank bands safely.
    key = jnp.where(ok, rank.astype(jnp.float32) * 1024.0 - cand_score, jnp.inf)
    if key.shape[0] < n_target:  # tiny top level: fewer candidates than budget
        pad = n_target - key.shape[0]
        key = jnp.pad(key, (0, pad), constant_values=jnp.inf)
        ok = jnp.pad(ok, (0, pad))
        cand_score = jnp.pad(cand_score, (0, pad))
        cand_y = jnp.pad(cand_y, (0, pad))
        cand_x = jnp.pad(cand_x, (0, pad))
    _, order = jax.lax.top_k(-key, n_target)
    sel_valid = ok[order]
    return Keypoints(
        yx=jnp.stack([cand_y[order], cand_x[order]], axis=-1).astype(jnp.int32),
        score=cand_score[order],
        valid=sel_valid,
    )


def detect_level(level_img: jnp.ndarray, content_hw, n_target: int,
                 cell: int = 32, k_per_cell: int = 4,
                 min_th: float = 7.0, margin: int = 16) -> Keypoints:
    """FAST + NMS + uniform selection for one pyramid level."""
    sc = fast_score(level_img)
    sc = nms3x3(sc)
    return select_from_nms_score(sc, content_hw, n_target, cell=cell,
                                 k_per_cell=k_per_cell, min_th=min_th,
                                 margin=margin)


def select_from_nms_score(score_nms: jnp.ndarray, content_hw, n_target: int,
                          cell: int = 32, k_per_cell: int = 4,
                          min_th: float = 7.0, margin: int = 16) -> Keypoints:
    """Border-mask + uniform selection on a precomputed NMS'd score map
    (the fused Pallas frontend produces the map; this is the shared tail)."""
    sc = jnp.where(border_mask(score_nms.shape, content_hw, margin),
                   score_nms, 0.0)
    return select_grid_topk(sc, n_target, cell=cell, k_per_cell=k_per_cell,
                            min_th=min_th)
