"""Pallas per-keypoint patch gather from a pyramid atlas.

XLA's vmapped dynamic_slice gather for descriptor/orientation patches is
the per-frame frontend's dominant cost (~0.9 ms; TPU gathers run at ~1
element/cycle). The VMEM form here loads an (8,128)-aligned window around
each keypoint and shifts it in-register with dynamic lane/sublane rolls —
measured ~30x faster, bit-identical output.

Layout contract: the pyramid levels are stacked into one "atlas"
[H_atlas, W_atlas] (W_atlas a multiple of 128, with >= 256 columns of slack
past the widest content; >= WR rows of slack at the bottom), and keypoint
patch corners are given in atlas coordinates. One call gathers every
level's keypoints — no per-level dispatch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 16          # keypoints per program instance
_LANES = 256     # window width: covers patch width + worst-case 127 offset


def _rows_for(ph: int) -> int:
    # aligned row window: patch rows + max sublane offset (7), rounded to 8
    return ((ph + 7 + 7) // 8) * 8


def _gather_kernel(rc_ref, img_ref, out_ref, *, ph: int, pw: int, wr: int):
    i = pl.program_id(0)
    for b in range(_B):
        r = rc_ref[i * _B + b, 0]
        c = rc_ref[i * _B + b, 1]
        rb = pl.multiple_of((r // 8) * 8, 8)
        cb = pl.multiple_of((c // 128) * 128, 128)
        win = img_ref[pl.ds(rb, wr), pl.ds(cb, _LANES)]
        # out[j] = win[j + off]: a roll by -off, expressed positively
        # (negative dynamic shifts miscompile on Mosaic as of jax 0.8)
        win = pltpu.roll(win, (wr - (r - rb)) % wr, 0)
        win = pltpu.roll(win, (_LANES - (c - cb)) % _LANES, 1)
        out_ref[b, :, :] = win[:ph, :pw]


@partial(jax.jit, static_argnames=("ph", "pw", "interpret"))
def gather_patches_atlas(atlas: jnp.ndarray, rc: jnp.ndarray, ph: int,
                         pw: int = 0, interpret: bool = False) -> jnp.ndarray:
    """atlas [H, W] (W % 128 == 0, with slack — see module docstring);
    rc [N, 2] int32 top-left patch corners (in-bounds, callers keep content
    margins — see extractor); returns [N, ph, pw] float32 patches
    (pw defaults to ph: square)."""
    pw = pw or ph
    N = rc.shape[0]
    wr = _rows_for(ph)
    pad = (-N) % _B
    rcp = jnp.pad(rc, ((0, pad), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((N + pad) // _B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_B, ph, pw), lambda i, rc: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_gather_kernel, ph=ph, pw=pw, wr=wr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N + pad, ph, pw), atlas.dtype),
        interpret=interpret,
    )(rcp, atlas)
    return out[:N]


def gather_patches_atlas_xla(atlas: jnp.ndarray, rc: jnp.ndarray,
                             ph: int, pw: int = 0) -> jnp.ndarray:
    """Fallback (CPU tests / non-TPU backends): same atlas contract, same
    output, via vmapped dynamic_slice."""
    pw = pw or ph

    def slc(r, c):
        return jax.lax.dynamic_slice(atlas, (r, c), (ph, pw))
    return jax.vmap(slc)(rc[:, 0], rc[:, 1])


def gather_patches(atlas: jnp.ndarray, rc: jnp.ndarray, ph: int,
                   pw: int = 0) -> jnp.ndarray:
    if jax.default_backend() == "tpu":
        return gather_patches_atlas(atlas, rc, ph, pw)
    return gather_patches_atlas_xla(atlas, rc, ph, pw)


def build_atlas(levels, widest: int, lanes_slack: int = _LANES):
    """Stack pyramid levels into one atlas.

    levels: list of [h_i, w_i] arrays. Returns (atlas [H, W], row_offsets):
    W = next multiple of 128 >= widest + lanes_slack's reach (so any
    128-aligned window base + 256 lanes stays in bounds), H = sum of level
    heights + row slack for the tallest gather window.
    """
    W = int(np.ceil((widest + lanes_slack - 128) / 128.0) * 128)
    W = max(W, ((widest + 127) // 128) * 128)
    offs = []
    off = 0
    padded = []
    for l in levels:
        offs.append(off)
        padded.append(jnp.pad(l, ((0, 0), (0, W - l.shape[1]))))
        off += l.shape[0]
    slack = jnp.zeros((64, W), padded[0].dtype)
    atlas = jnp.concatenate(padded + [slack], axis=0)
    return atlas, offs
