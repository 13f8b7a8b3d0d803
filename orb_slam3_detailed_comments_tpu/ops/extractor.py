"""ORB feature extraction pipeline: pyramid -> FAST -> orient -> describe.

Replaces ORBextractor::operator() (reference: src/ORBextractor.cc:1557).
The whole extractor is one jitted function per (image size, config): every
level's detection, orientation and description are dense tensor programs with
static shapes; outputs are fixed-capacity keypoint arrays with validity masks.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import brief, fast, pyramid


class OrbConfig(NamedTuple):
    n_features: int = 1024
    n_levels: int = 8
    scale: float = 1.2
    ini_th: float = 20.0    # reference iniThFAST (kept for config parity)
    min_th: float = 7.0     # reference minThFAST: weakest accepted corner
    cell: int = 32          # grid cell for uniform selection (ref used 35)
    k_per_cell: int = 8
    margin: int = 16        # FAST detection border (ref EDGE_THRESHOLD-3)


class FrameFeatures(NamedTuple):
    """Fixed-capacity per-frame feature set (SoA, level-0 coordinates)."""

    xy: jnp.ndarray      # [N, 2] float32 (u=col, v=row) in level-0 pixels
    level: jnp.ndarray   # [N] int32 pyramid level
    angle: jnp.ndarray   # [N] float32 radians
    score: jnp.ndarray   # [N] float32 FAST score
    desc: jnp.ndarray    # [N, 8] uint32 packed 256-bit descriptors
    valid: jnp.ndarray   # [N] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def level_budgets(cfg: OrbConfig) -> list:
    """Per-level feature budgets, geometric in 1/scale like the reference
    (ORBextractor ctor: nDesiredFeaturesPerScale)."""
    f = 1.0 / cfg.scale
    total = cfg.n_features
    n0 = total * (1 - f) / (1 - f ** cfg.n_levels)
    budgets = []
    acc = 0
    for lv in range(cfg.n_levels - 1):
        b = int(round(n0 * f ** lv))
        budgets.append(b)
        acc += b
    budgets.append(max(total - acc, 8))
    return budgets


def _frontend_mode() -> str:
    """Fused-Pallas dense maps are opt-in for now (ORB_TPU_PALLAS=1:
    compiled on TPU, interpret elsewhere); default is the XLA path until
    the kernel is validated at speed on real hardware."""
    import os
    if os.environ.get("ORB_TPU_PALLAS") == "1":
        return ("pallas" if jax.default_backend() == "tpu"
                else "pallas_interpret")
    return "xla"


@partial(jax.jit, static_argnames=("cfg", "h", "w", "frontend"))
def _extract_impl(img: jnp.ndarray, cfg: OrbConfig, h: int, w: int,
                  frontend: str = "xla") -> FrameFeatures:
    levels = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale)
    budgets = level_budgets(cfg)
    scales = pyramid.scale_factors(cfg.n_levels, cfg.scale)

    xs, lvs, angs, scs, vals = [], [], [], [], []
    yxs = []
    patches = []
    kps_per_level = []
    dims = []
    for lv in range(cfg.n_levels):
        lvl = levels[lv]
        ch = int(round(h / cfg.scale ** lv))
        cw = int(round(w / cfg.scale ** lv))
        # The blur is rounded like the reference's uint8 GaussianBlur
        # (ORBextractor.cc:1630) — integer intensities are exact in bf16,
        # keeping describe_patches' fast-path matmuls bit-exact
        if frontend != "xla":
            # one fused VMEM-resident pass for all four dense maps
            from . import pallas_frontend
            score, blurred, m10, m01 = pallas_frontend.dense_frontend(
                lvl, interpret=(frontend == "pallas_interpret"))
            kps = fast.select_from_nms_score(
                score, (ch, cw), budgets[lv], cell=cfg.cell,
                k_per_cell=cfg.k_per_cell, min_th=cfg.min_th,
                margin=cfg.margin)
            ang = brief.angle_from_maps(m10, m01, kps.yx)
            patches.append(brief.extract_patches(blurred, kps.yx, (ch, cw)))
            angs.append(ang)
        else:
            kps = fast.detect_level(
                lvl, (ch, cw), budgets[lv], cell=cfg.cell,
                k_per_cell=cfg.k_per_cell, min_th=cfg.min_th,
                margin=cfg.margin,
            )
            kps_per_level.append(kps)
            dims.append((ch, cw))
        # to level-0 coords (u=col, v=row)
        s = float(scales[lv])
        xy0 = jnp.stack([kps.yx[:, 1].astype(jnp.float32) * s,
                         kps.yx[:, 0].astype(jnp.float32) * s], axis=-1)
        xs.append(xy0)
        lvs.append(jnp.full((budgets[lv],), lv, jnp.int32))
        scs.append(kps.score)
        vals.append(kps.valid)
        yxs.append(kps.yx)

    if frontend == "xla":
        # Patch gathers for ALL levels ride two atlas gathers (Pallas
        # window+roll on TPU — ~30x faster than vmapped dynamic_slice —
        # same-values XLA fallback elsewhere): raw 31x31 patches for the
        # intensity-centroid angle (the golden patch form, ic_angle_gather),
        # blurred 37x37 patches for the MXU rBRIEF.
        from . import pallas_patches
        raw_atlas, offs = pallas_patches.build_atlas(levels, w)
        blur_atlas, _ = pallas_patches.build_atlas(
            [jnp.round(pyramid.gaussian_blur(l)) for l in levels], w)
        rc_raw, rc_blur = [], []
        for lv in range(cfg.n_levels):
            ch, cw = dims[lv]
            yx = kps_per_level[lv].yx
            off = jnp.array([offs[lv], 0], jnp.int32)[None, :]
            pr = brief.HALF_PATCH   # 15 -> 31x31 raw
            pb = brief.PATCH_R      # 18 -> 37x37 blurred
            rc_raw.append(jnp.stack(
                [jnp.clip(yx[:, 0] - pr, 0, max(ch - (2 * pr + 1), 0)),
                 jnp.clip(yx[:, 1] - pr, 0, max(cw - (2 * pr + 1), 0))],
                axis=-1) + off)
            rc_blur.append(jnp.stack(
                [jnp.clip(yx[:, 0] - pb, 0, max(ch - (2 * pb + 1), 0)),
                 jnp.clip(yx[:, 1] - pb, 0, max(cw - (2 * pb + 1), 0))],
                axis=-1) + off)
        n_all = sum(budgets)
        raw_pat = pallas_patches.gather_patches(
            raw_atlas, jnp.concatenate(rc_raw), 2 * brief.HALF_PATCH + 1)
        blur_pat = pallas_patches.gather_patches(
            blur_atlas, jnp.concatenate(rc_blur), 2 * brief.PATCH_R + 1)
        angle_all = brief.ic_angle_patches(raw_pat.reshape(n_all, -1))
        desc_all = brief.describe_patches(blur_pat.reshape(n_all, -1),
                                          angle_all)
    else:
        # MXU rBRIEF: per-keypoint blurred patches (one slice-gather per
        # level) -> per-angle-bin +-1 pattern matmuls, batched across levels
        angle_all = jnp.concatenate(angs, axis=0)
        desc_all = brief.describe_patches(jnp.concatenate(patches, axis=0),
                                          angle_all)

    return FrameFeatures(
        xy=jnp.concatenate(xs, axis=0),
        level=jnp.concatenate(lvs, axis=0),
        angle=angle_all,
        score=jnp.concatenate(scs, axis=0),
        desc=desc_all,
        valid=jnp.concatenate(vals, axis=0),
    )


def extract(img: jnp.ndarray, cfg: OrbConfig = OrbConfig()) -> FrameFeatures:
    """img: [H, W] float32 grayscale in [0, 255]."""
    h, w = img.shape
    return _extract_impl(img, cfg, h, w, frontend=_frontend_mode())
