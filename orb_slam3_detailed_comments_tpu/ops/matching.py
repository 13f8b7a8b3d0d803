"""Descriptor matching: batched Hamming searches.

Replaces ORBmatcher (reference: src/ORBmatcher.cc). The reference accelerates
CPU matching with per-frame 64x48 grids, BoW feature-vector buckets and
rotation histograms, all pointer-chasing. On TPU the idiomatic form is dense:
compute the full [Q, K] Hamming matrix on the VPU (XOR + popcount over 8
uint32 lanes), apply all gates (search window, pyramid level, already-matched)
as masks, and argmin. A 1k x 1k search is ~8M popcounts — microseconds on a
v5 chip; the sparse structures the CPU needs would only add gathers.

Thresholds follow the reference (ORBmatcher.cc:35-37): TH_HIGH=100, TH_LOW=50,
HISTO_LENGTH=30 rotation bins, best/second ratio tests.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30
BIG = jnp.int32(10_000)


def hamming_matrix(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """[Q, 8] x [K, 8] uint32 -> [Q, K] int32 Hamming distances."""
    x = da[:, None, :] ^ db[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix_mxu(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """Same result via an MXU matmul on +-1 unpacked bits (bf16).

    hamming = (256 - <a_pm1, b_pm1>) / 2. Preferred for large K (keyframe
    database sweeps) where the matmul rides the systolic array.
    """
    def unpack_pm1(d):
        # [N, 8] u32 -> [N, 256] bits in +-1
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = (d[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
        return (bits.reshape(d.shape[0], 256).astype(jnp.bfloat16) * 2 - 1)

    a = unpack_pm1(da)
    b = unpack_pm1(db)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # [Q] int32 index into K set (undefined where invalid)
    dist: jnp.ndarray   # [Q] int32 Hamming distance
    valid: jnp.ndarray  # [Q] bool


def _masked_best2(dist: jnp.ndarray, mask: jnp.ndarray):
    """Best and second-best along axis 1 under mask. Returns (d1, i1, d2)."""
    d = jnp.where(mask, dist, BIG)
    i1 = jnp.argmin(d, axis=1)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
    d_no1 = d.at[jnp.arange(d.shape[0]), i1].set(BIG)
    d2 = jnp.min(d_no1, axis=1)
    return d1, i1.astype(jnp.int32), d2


def rotation_consistency_mask(dangle: jnp.ndarray, valid: jnp.ndarray,
                              n_bins: int = HISTO_LENGTH,
                              keep_top: int = 3) -> jnp.ndarray:
    """Keep matches whose angle delta falls in the top-`keep_top` histogram
    bins (reference: ORBmatcher::ComputeThreeMaxima, ORBmatcher.cc:2335)."""
    two_pi = 2.0 * jnp.pi
    frac = jnp.mod(dangle, two_pi) / two_pi
    bins = jnp.clip((frac * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros((n_bins,), jnp.int32).at[bins].add(valid.astype(jnp.int32))
    top_vals, top_idx = jax.lax.top_k(hist, keep_top)
    # reference drops bins below 10% of the max bin
    ok_bin = top_vals >= jnp.maximum((0.1 * top_vals[0]).astype(jnp.int32), 1)
    keep = jnp.zeros((n_bins,), jnp.bool_).at[top_idx].set(ok_bin)
    return valid & keep[bins]


@partial(jax.jit, static_argnames=("max_dist", "ratio", "mutual"))
def match_nn(da: jnp.ndarray, va: jnp.ndarray, db: jnp.ndarray, vb: jnp.ndarray,
             max_dist: int = TH_LOW, ratio: float = 0.9,
             mutual: bool = True,
             extra_mask: jnp.ndarray | None = None) -> MatchResult:
    """Nearest-neighbour descriptor matching with ratio test.

    da [Q,8], db [K,8] uint32; va/vb validity masks. extra_mask [Q,K] bool
    restricts admissible pairs (search windows, level gates...).

    On TPU the unmasked case runs the fused Pallas kernel (one HBM pass);
    the XLA path is the fallback for windowed searches and odd shapes.
    """
    if (extra_mask is None and _use_pallas()
            and da.shape[0] % 128 == 0 and db.shape[0] % 128 == 0):
        from . import pallas_hamming
        interp = jax.default_backend() != "tpu"
        d1, i1, d2 = pallas_hamming.hamming_best2(da, db, vb, interpret=interp)
        ok = (va & (d1 <= max_dist)
              & (d1.astype(jnp.float32) <= ratio * d2.astype(jnp.float32)))
        if mutual:
            _, j1, _ = pallas_hamming.hamming_best2(db, da, va,
                                                    interpret=interp)
            ok = ok & (j1[i1] == jnp.arange(da.shape[0], dtype=jnp.int32))
        return MatchResult(idx=i1, dist=d1, valid=ok)
    dist = hamming_matrix(da, db)
    mask = va[:, None] & vb[None, :]
    if extra_mask is not None:
        mask = mask & extra_mask
    d1, i1, d2 = _masked_best2(dist, mask)
    ok = (d1 <= max_dist) & (d1.astype(jnp.float32) <= ratio * d2.astype(jnp.float32))
    if mutual:
        # query index that each k would pick
        dT = jnp.where(mask, dist, BIG).T
        j1 = jnp.argmin(dT, axis=1).astype(jnp.int32)      # [K]
        ok = ok & (j1[i1] == jnp.arange(da.shape[0], dtype=jnp.int32))
    return MatchResult(idx=i1, dist=d1, valid=ok)


def _use_pallas() -> bool:
    """Pallas path on real TPU by default; opt-in elsewhere
    (ORB_TPU_PALLAS=1 forces interpret-mode on CPU, =0 disables)."""
    import os
    flag = os.environ.get("ORB_TPU_PALLAS")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() == "tpu"


def window_mask(xy_q: jnp.ndarray, xy_k: jnp.ndarray, radius) -> jnp.ndarray:
    """[Q,K] bool: |x| and |y| displacement within radius (scalar or [Q])."""
    d = jnp.abs(xy_q[:, None, :] - xy_k[None, :, :])
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    return (d[..., 0] <= r) & (d[..., 1] <= r)


def level_mask(lv_q: jnp.ndarray, lv_k: jnp.ndarray, lo: int = 0, hi: int = 0) -> jnp.ndarray:
    """[Q,K] bool: level_k within [lv_q+lo, lv_q+hi] (scale gate).

    lo/hi may be arrays [Q] for per-query gates.
    """
    d = lv_k[None, :] - lv_q[:, None]
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    if lo.ndim == 1:
        lo = lo[:, None]
    if hi.ndim == 1:
        hi = hi[:, None]
    return (d >= lo) & (d <= hi)


@partial(jax.jit, static_argnames=("window", "ratio", "max_dist"))
def search_for_initialization(f1, f2, window: float = 100.0,
                              ratio: float = 0.9,
                              max_dist: int = TH_LOW) -> MatchResult:
    """Monocular-init matching between two early frames
    (reference: ORBmatcher::SearchForInitialization, ORBmatcher.cc:734).
    Level-0 keypoints only, windowed around the same position, ratio test +
    rotation-consistency histogram.
    """
    wmask = window_mask(f1.xy, f2.xy, window)
    lmask = (f1.level[:, None] == 0) & (f2.level[None, :] == 0)
    res = match_nn(f1.desc, f1.valid, f2.desc, f2.valid,
                   max_dist=max_dist, ratio=ratio, mutual=True,
                   extra_mask=wmask & lmask)
    dang = f1.angle - f2.angle[res.idx]
    keep = rotation_consistency_mask(dang, res.valid)
    return MatchResult(res.idx, res.dist, keep)


@partial(jax.jit, static_argnames=("max_dist", "ratio"))
def search_by_projection(proj_xy: jnp.ndarray, proj_valid: jnp.ndarray,
                         proj_desc: jnp.ndarray, proj_level: jnp.ndarray,
                         feat, radius, level_lo=-1, level_hi=1,
                         max_dist: int = TH_HIGH,
                         ratio: float = 0.8,
                         taken: jnp.ndarray | None = None) -> MatchResult:
    """Match projected map points against a frame's keypoints
    (reference: ORBmatcher::SearchByProjection overloads, ORBmatcher.cc:45,1950).

    proj_*: per-map-point projected pixel, predicted level, descriptor.
    feat: FrameFeatures of the current frame. radius: scalar or [P] px at
    level 0 (already scaled by the caller). taken: [N] bool keypoints to skip.

    On TPU (and with ORB_TPU_PALLAS=1 elsewhere) this runs the fused Pallas
    windowed kernel — distance + window/level gates + best-2 never leave
    VMEM. The XLA fallback materializes [Q, K] distance and gate matrices;
    on the steady-state frame program the fallback costs ~4 ms of the 5 ms
    frame, the kernel well under 1 ms (measured, TPU v5e).
    """
    kp_ok = feat.valid if taken is None else (feat.valid & ~taken)
    Q = proj_xy.shape[0]
    K = feat.desc.shape[0]
    if _use_pallas():
        from . import pallas_hamming
        if pallas_hamming.available(Q, K):
            r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (Q,))
            lo = jnp.broadcast_to(jnp.asarray(level_lo, jnp.int32), (Q,))
            hi = jnp.broadcast_to(jnp.asarray(level_hi, jnp.int32), (Q,))
            interp = jax.default_backend() != "tpu"
            d1, i1, d2 = pallas_hamming.hamming_best2_windowed(
                proj_desc, proj_xy, proj_level, r, lo, hi, proj_valid,
                feat.desc, feat.xy, feat.level, kp_ok, interpret=interp)
            ok = ((d1 <= max_dist)
                  & (d1.astype(jnp.float32)
                     <= ratio * d2.astype(jnp.float32)))
            return MatchResult(idx=i1, dist=d1, valid=ok)
    wmask = window_mask(proj_xy, feat.xy, radius)
    lmask = level_mask(proj_level, feat.level, level_lo, level_hi)
    return match_nn(proj_desc, proj_valid, feat.desc, kp_ok,
                    max_dist=max_dist, ratio=ratio, mutual=False,
                    extra_mask=wmask & lmask)
