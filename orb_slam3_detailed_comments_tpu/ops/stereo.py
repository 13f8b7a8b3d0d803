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
    # One windowed gather per keypoint per image (Pallas atlas gather; the
    # old per-sample fancy-indexed bilinear did ~6M random gathers/frame,
    # ~60 ms on TPU): the integer window is gathered once, the shared
    # fractional offset is applied by static +-1 shifts, and the 11 SAD
    # slide positions are static column slices of one wide right window.
    u_l = xy_l[:, 0]
    v_l = xy_l[:, 1]
    u_r0 = xy_r[best_r, 0]
    P = 2 * SAD_W + 1

    from . import pallas_patches

    def bilinear_windows(img, uc, vc, half_w: int):
        """[L, P, 2*half_w+1] bilinear patches at rows vc+-SAD_W, cols
        uc+-half_w, from ONE [P+1, w+1] integer-corner gather each."""
        w = 2 * half_w + 1
        atlas, _ = pallas_patches.build_atlas([img], img.shape[1])
        y0 = jnp.clip(jnp.floor(vc).astype(jnp.int32) - SAD_W,
                      0, img.shape[0] - (P + 1))
        x0 = jnp.clip(jnp.floor(uc).astype(jnp.int32) - half_w,
                      0, img.shape[1] - (w + 1))
        fy = jnp.clip(vc - SAD_W - y0, 0.0, 1.0)[:, None, None]
        fx = jnp.clip(uc - half_w - x0, 0.0, 1.0)[:, None, None]
        rc = jnp.stack([y0, x0], axis=-1)
        W = pallas_patches.gather_patches(atlas, rc, P + 1, w + 1)
        return ((1 - fy) * (1 - fx) * W[:, :P, :w]
                + (1 - fy) * fx * W[:, :P, 1:]
                + fy * (1 - fx) * W[:, 1:, :w]
                + fy * fx * W[:, 1:, 1:])

    pl = bilinear_windows(left_img0, u_l, v_l, SAD_W)          # [L, P, P]
    pl = pl - pl[:, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]          # center-normalized
    wide = bilinear_windows(right_img0, u_r0, v_l, SAD_W + SLIDE_L)
    offsets = jnp.arange(-SLIDE_L, SLIDE_L + 1, dtype=jnp.float32)

    def sad_at(k):
        pr = jax.lax.dynamic_slice_in_dim(wide, k, P, axis=2)
        pr = pr - pr[:, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]
        return jnp.sum(jnp.abs(pl - pr), axis=(1, 2))          # [L]

    sads = jnp.stack([sad_at(k) for k in range(2 * SLIDE_L + 1)])  # [2L+1, L]
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


def _bilinear_windows_atlas(atlas, W_img: int, H_img: int, uc, vc,
                            half_w: int):
    """[N, 2h+1, 2h+1] bilinear patches centered at (uc, vc) from a
    prebuilt single-image atlas (one integer-corner Pallas gather each —
    same scheme as stereo_match's SAD windows)."""
    from . import pallas_patches
    w = 2 * half_w + 1
    y0 = jnp.clip(jnp.floor(vc).astype(jnp.int32) - half_w,
                  0, H_img - (w + 1))
    x0 = jnp.clip(jnp.floor(uc).astype(jnp.int32) - half_w,
                  0, W_img - (w + 1))
    fy = jnp.clip(vc - half_w - y0, 0.0, 1.0)[:, None, None]
    fx = jnp.clip(uc - half_w - x0, 0.0, 1.0)[:, None, None]
    rc = jnp.stack([y0, x0], axis=-1)
    Wp = pallas_patches.gather_patches(atlas, rc, w + 1, w + 1)
    return ((1 - fy) * (1 - fx) * Wp[:, :w, :w]
            + (1 - fy) * fx * Wp[:, :w, 1:]
            + fy * (1 - fx) * Wp[:, 1:, :w]
            + fy * fx * Wp[:, 1:, 1:])


def epipolar_sad_refine(img_l: jnp.ndarray, img_r: jnp.ndarray,
                        xy_l: jnp.ndarray, xy_r: jnp.ndarray,
                        e_dir: jnp.ndarray, valid: jnp.ndarray):
    """Sub-pixel refinement of right-image match positions along their
    EPIPOLAR tangent (the non-rectified analog of stereo_match's SAD
    slide; the reference's KB8 stereo has no refinement stage —
    Frame::ComputeStereoFishEyeMatches keeps integer keypoints, which at
    z^2/(b f) m/px leaves a ~1 px depth-noise floor).

    xy_l/xy_r [N, 2]: matched keypoint pixels. e_dir [N, 2]: UNIT epipolar
    tangent at the right keypoint (direction the projection moves as the
    point slides along the left ray). Returns (delta [N] signed px along
    e_dir, ok [N]): add delta * e_dir to xy_r where ok.
    """
    from . import pallas_patches
    N = xy_l.shape[0]
    P = 2 * SAD_W + 1
    atlas_l, _ = pallas_patches.build_atlas([img_l], img_l.shape[1])
    atlas_r, _ = pallas_patches.build_atlas([img_r], img_r.shape[1])
    H, W = img_r.shape
    pl = _bilinear_windows_atlas(atlas_l, img_l.shape[1], img_l.shape[0],
                                 xy_l[:, 0], xy_l[:, 1], SAD_W)
    pl = pl - pl[:, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]

    sads = []
    for k in range(-SLIDE_L, SLIDE_L + 1):
        uk = xy_r[:, 0] + k * e_dir[:, 0]
        vk = xy_r[:, 1] + k * e_dir[:, 1]
        pr = _bilinear_windows_atlas(atlas_r, W, H, uk, vk, SAD_W)
        pr = pr - pr[:, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]
        sads.append(jnp.sum(jnp.abs(pl - pr), axis=(1, 2)))
    sads = jnp.stack(sads)                                 # [2L+1, N]
    k = jnp.argmin(sads, axis=0)
    km = jnp.clip(k, 1, 2 * SLIDE_L - 1)
    s_m = jnp.take_along_axis(sads, km[None, :], axis=0)[0]
    s_l = jnp.take_along_axis(sads, (km - 1)[None, :], axis=0)[0]
    s_r = jnp.take_along_axis(sads, (km + 1)[None, :], axis=0)[0]
    denom = jnp.maximum(s_l + s_r - 2.0 * s_m, 1e-6)
    frac = jnp.clip(0.5 * (s_l - s_r) / denom, -1.0, 1.0)
    interior = (k >= 1) & (k <= 2 * SLIDE_L - 1)
    delta = (k.astype(jnp.float32) - SLIDE_L) + jnp.where(interior, frac, 0.0)
    # reject slides that wander: refined position must stay in-image and
    # the SAD surface must have a real interior minimum
    u_new = xy_r[:, 0] + delta * e_dir[:, 0]
    v_new = xy_r[:, 1] + delta * e_dir[:, 1]
    ok = (valid & interior
          & (u_new >= SAD_W) & (u_new < W - SAD_W)
          & (v_new >= SAD_W) & (v_new < H - SAD_W))
    return jnp.where(ok, delta, 0.0), ok
