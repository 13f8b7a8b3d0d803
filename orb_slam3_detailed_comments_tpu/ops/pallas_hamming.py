"""Pallas TPU kernel: fused Hamming-distance nearest-neighbour search.

The XLA path in ops/matching.py materializes the full [Q, K] distance matrix
in HBM and reads it three times (argmin, gather, second-min). This kernel
tiles queries into VMEM, streams the whole target set per tile, and emits
only (best distance, best index, second distance) — one HBM pass instead of
four, all popcount/min work on the VPU (reference hot loop:
ORBmatcher::DescriptorDistance + best/second bookkeeping, ORBmatcher.cc:2383).

Layout: descriptors are passed transposed, [8, N] uint32, so each block is a
(sublane=8, lane=128)-aligned tile. On CPU the kernel runs in interpret mode
(tests / the virtual-device mesh); on TPU it compiles to Mosaic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 10_000
_QT = 128   # query tile


def _best2_kernel(qd_ref, td_ref, tv_ref, d1_ref, i1_ref, d2_ref):
    """One query tile vs all targets.

    qd_ref [8, QT] u32, td_ref [8, K] u32, tv_ref [1, K] i32 (validity);
    outputs [1, QT] each.
    """
    K = td_ref.shape[1]
    dist = jnp.zeros((_QT, K), jnp.int32)
    for w in range(8):
        x = qd_ref[w, :][:, None] ^ td_ref[w, :][None, :]
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    # reductions in f32: Mosaic's argmin/min lowering is f32-only, and
    # Hamming distances (<= 256) are exact in f32
    distf = jnp.where(tv_ref[0, :][None, :] > 0,
                      dist.astype(jnp.float32), float(BIG))
    i1 = jnp.argmin(distf, axis=1).astype(jnp.int32)
    d1 = jnp.min(distf, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_QT, K), 1)
    d2 = jnp.min(jnp.where(cols == i1[:, None], float(BIG), distf), axis=1)
    d1_ref[0, :] = d1.astype(jnp.int32)
    i1_ref[0, :] = i1
    d2_ref[0, :] = d2.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_best2(da: jnp.ndarray, db: jnp.ndarray, vb: jnp.ndarray,
                  interpret: bool = False):
    """da [Q,8] u32 queries, db [K,8] u32 targets, vb [K] bool target mask.

    Returns (d1 [Q] int32, i1 [Q] int32, d2 [Q] int32). Q must be a multiple
    of 128 and K a multiple of 128 (the map/frame capacities are).
    """
    Q = da.shape[0]
    K = db.shape[0]
    qdT = da.T                                   # [8, Q]
    tdT = db.T                                   # [8, K]
    tv = vb.astype(jnp.int32)[None, :]           # [1, K]
    grid = (Q // _QT,)
    d1, i1, d2 = pl.pallas_call(
        _best2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, _QT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _QT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _QT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _QT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Q), jnp.int32),
            jax.ShapeDtypeStruct((1, Q), jnp.int32),
            jax.ShapeDtypeStruct((1, Q), jnp.int32),
        ],
        interpret=interpret,
    )(qdT, tdT, tv)
    return d1[0], i1[0], d2[0]


def available(q: int, k: int) -> bool:
    """Shape gate: capacities are padded to 128 multiples by the callers."""
    return q % _QT == 0 and k % 128 == 0


def _windowed_best2_kernel(qd_ref, quv_ref, qlv_ref, qr_ref, qlo_ref,
                           qhi_ref, qv_ref, td_ref, txy_ref, tlv_ref, tv_ref,
                           d1_ref, i1_ref, d2_ref):
    """One query tile vs all targets under the projection-search gates.

    The XLA fallback for windowed matching materializes the [Q, K] distance
    matrix plus two [Q, K] gate masks in HBM and re-reads them for argmin /
    min / second-min — ~6 HBM sweeps of Q*K. Here the XOR+popcount, the
    |du|/|dv| window gate, the pyramid-level gate and the best-2 reduction
    all happen on one VMEM-resident tile: one HBM read of the inputs, three
    [1, QT] writes (reference hot loop: ORBmatcher::SearchByProjection,
    ORBmatcher.cc:1950, the per-point GetFeaturesInArea + DescriptorDistance
    scan).

    qd [8, QT] u32; quv [2, QT] f32; qlv/qlo/qhi [1, QT] i32; qr/qv [1, QT];
    td [8, K] u32; txy [2, K] f32; tlv [1, K] i32; tv [1, K] i32.
    """
    K = td_ref.shape[1]
    dist = jnp.zeros((_QT, K), jnp.int32)
    for w in range(8):
        x = qd_ref[w, :][:, None] ^ td_ref[w, :][None, :]
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    du = jnp.abs(quv_ref[0, :][:, None] - txy_ref[0, :][None, :])
    dv = jnp.abs(quv_ref[1, :][:, None] - txy_ref[1, :][None, :])
    r = qr_ref[0, :][:, None]
    dl = tlv_ref[0, :][None, :] - qlv_ref[0, :][:, None]
    ok = ((du <= r) & (dv <= r)
          & (dl >= qlo_ref[0, :][:, None]) & (dl <= qhi_ref[0, :][:, None])
          & (tv_ref[0, :][None, :] > 0) & (qv_ref[0, :][:, None] > 0))
    distf = jnp.where(ok, dist.astype(jnp.float32), float(BIG))
    i1 = jnp.argmin(distf, axis=1).astype(jnp.int32)
    d1 = jnp.min(distf, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_QT, K), 1)
    d2 = jnp.min(jnp.where(cols == i1[:, None], float(BIG), distf), axis=1)
    d1_ref[0, :] = d1.astype(jnp.int32)
    i1_ref[0, :] = i1
    d2_ref[0, :] = d2.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_best2_windowed(da, q_uv, q_lv, q_r, q_lo, q_hi, qv,
                           db, t_xy, t_lv, tv, interpret: bool = False):
    """Projection-search matching: per-query window + level gates fused with
    the Hamming best-2 scan.

    da [Q,8] u32, q_uv [Q,2] f32, q_lv/q_lo/q_hi [Q] i32, q_r [Q] f32,
    qv [Q] bool; db [K,8] u32, t_xy [K,2] f32, t_lv [K] i32, tv [K] bool.
    Q and K must be 128-multiples. Returns (d1, i1, d2) [Q] int32; fully
    gated-out queries come back with d1 = BIG.
    """
    Q = da.shape[0]
    K = db.shape[0]
    grid = (Q // _QT,)
    qspec = lambda rows: pl.BlockSpec((rows, _QT), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    tspec = lambda rows: pl.BlockSpec((rows, K), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    d1, i1, d2 = pl.pallas_call(
        _windowed_best2_kernel,
        grid=grid,
        in_specs=[qspec(8), qspec(2), qspec(1), qspec(1), qspec(1), qspec(1),
                  qspec(1), tspec(8), tspec(2), tspec(1), tspec(1)],
        out_specs=[qspec(1), qspec(1), qspec(1)],
        out_shape=[jax.ShapeDtypeStruct((1, Q), jnp.int32)] * 3,
        interpret=interpret,
    )(da.T, q_uv.T.astype(jnp.float32),
      q_lv.astype(jnp.int32)[None, :], q_r.astype(jnp.float32)[None, :],
      q_lo.astype(jnp.int32)[None, :], q_hi.astype(jnp.int32)[None, :],
      qv.astype(jnp.int32)[None, :],
      db.T, t_xy.T.astype(jnp.float32), t_lv.astype(jnp.int32)[None, :],
      tv.astype(jnp.int32)[None, :])
    return d1[0], i1[0], d2[0]
