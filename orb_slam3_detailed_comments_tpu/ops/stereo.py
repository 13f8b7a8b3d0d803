"""Rectified stereo matching: row-banded Hamming search + SAD subpixel.

Replaces Frame::ComputeStereoMatches (reference: src/Frame.cc:1102): the
reference builds per-row candidate tables, then per-keypoint Hamming search,
then an 11x11 SAD sliding window with parabola sub-pixel fit. Here the
row-band + disparity-range + level gates are one dense [L, R] mask over all
feature pairs, the Hamming argmin is batched, and ALL SAD windows for all
matches are gathered and evaluated in a single fused program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import matching

SAD_W = 5          # half window (11x11), reference Frame.cc:1230
SLIDE_L = 5        # sliding range +-5, reference Frame.cc:1233


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray    # [L] refined right u coordinate (level-0 px)
    disparity: jnp.ndarray  # [L]
    depth: jnp.ndarray      # [L]
    valid: jnp.ndarray      # [L]


@partial(jax.jit, static_argnames=("n_levels", "scale"))
def stereo_match(xy_l, level_l, desc_l, valid_l,
                 xy_r, level_r, desc_r, valid_r,
                 left_img0: jnp.ndarray, right_img0: jnp.ndarray,
                 bf: float, min_z: float,
                 n_levels: int = 8, scale: float = 1.2) -> StereoMatches:
    """All coordinates in level-0 pixels. bf = baseline * fx.
    left_img0/right_img0: level-0 images for the SAD refinement (the
    reference slides on each keypoint's own pyramid level; level-0 with
    scaled windows is equivalent up to resampling).
    """
    sf = jnp.asarray(scale ** np.arange(n_levels), jnp.float32)
    max_d = bf / min_z
    min_d = 0.0

    # gates: row band, disparity range, level compatibility
    row_band = 2.0 * sf[level_l]
    dv = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    band_ok = dv <= row_band[:, None]
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    disp_ok = (disp >= min_d) & (disp <= max_d)
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    mask = band_ok & disp_ok & lvl_ok & valid_l[:, None] & valid_r[None, :]

    dist = matching.hamming_matrix(desc_l, desc_r)
    dist = jnp.where(mask, dist, matching.BIG)
    best_r = jnp.argmin(dist, axis=1)
    best_d = jnp.take_along_axis(dist, best_r[:, None], axis=1)[:, 0]
    th = (matching.TH_HIGH + matching.TH_LOW) // 2
    coarse_ok = best_d < th

    # --- SAD sub-pixel refinement around the coarse match ---------------
    u_l = xy_l[:, 0]
    v_l = xy_l[:, 1]
    u_r0 = xy_r[best_r, 0]

    def gather_patch(img, uc, vc):
        """[L, 2W+1, 2W+1] bilinear patches centered at (uc, vc)."""
        dy = jnp.arange(-SAD_W, SAD_W + 1, dtype=jnp.float32)
        dx = jnp.arange(-SAD_W, SAD_W + 1, dtype=jnp.float32)
        ys = vc[:, None, None] + dy[None, :, None]
        xs = uc[:, None, None] + dx[None, None, :]
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, img.shape[0] - 2)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, img.shape[1] - 2)
        fy = jnp.clip(ys - y0, 0.0, 1.0)
        fx = jnp.clip(xs - x0, 0.0, 1.0)
        v00 = img[y0, x0]
        v01 = img[y0, x0 + 1]
        v10 = img[y0 + 1, x0]
        v11 = img[y0 + 1, x0 + 1]
        return ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01
                + fy * (1 - fx) * v10 + fy * fx * v11)

    pl = gather_patch(left_img0, u_l, v_l)                     # [L, P, P]
    pl = pl - pl[:, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]          # center-normalized
    offsets = jnp.arange(-SLIDE_L, SLIDE_L + 1, dtype=jnp.float32)

    def sad_at(off):
        pr = gather_patch(right_img0, u_r0 + off, v_l)
        pr = pr - pr[:, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]
        return jnp.sum(jnp.abs(pl - pr), axis=(1, 2))          # [L]

    sads = jax.vmap(sad_at)(offsets)                           # [2L+1, L]
    k = jnp.argmin(sads, axis=0)
    s_m = jnp.take_along_axis(sads, k[None, :], axis=0)[0]
    km = jnp.clip(k, 1, 2 * SLIDE_L - 1)
    s_l = jnp.take_along_axis(sads, (km - 1)[None, :], axis=0)[0]
    s_r = jnp.take_along_axis(sads, (km + 1)[None, :], axis=0)[0]
    denom = jnp.maximum(s_l + s_r - 2.0 * s_m, 1e-6)
    delta = 0.5 * (s_l - s_r) / denom                          # parabola vertex
    delta = jnp.clip(delta, -1.0, 1.0)
    interior = (k >= 1) & (k <= 2 * SLIDE_L - 1)
    u_r = u_r0 + offsets[k] + jnp.where(interior, delta, 0.0)

    disparity = u_l - u_r
    ok = coarse_ok & (disparity > 1e-3) & (disparity <= max_d)
    # outlier cut at ~2x median SAD (reference uses 1.5*1.4*median)
    med = jnp.median(jnp.where(ok, s_m, jnp.nan))
    sad_ok = jnp.where(jnp.isnan(med), ok, s_m <= 2.1 * med)
    ok = ok & sad_ok
    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), 0.0)
    return StereoMatches(u_right=u_r, disparity=disparity, depth=depth, valid=ok)
