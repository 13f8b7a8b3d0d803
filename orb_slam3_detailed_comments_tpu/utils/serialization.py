"""Atlas / map checkpointing: save and resume.

Replaces System::SaveAtlas/LoadAtlas (reference: src/System.cc:1466,1517)
and the boost-serialization machinery (include/SerializationUtils.h,
KeyFrame.h:55-190): the tensor map store serializes as one compressed npz
per map (SoA arrays are already serialization-ready — no pointer⇄id fixup
pass needed, which is the PreSave/PostLoad dance the reference does), plus a
JSON header with config and an integrity checksum (reference guards the
vocabulary with MD5, System.cc:1585).
"""
from __future__ import annotations

import hashlib
import io
import json
import os
import zipfile

import numpy as np

from ..mapping.atlas import Atlas
from ..mapping.mapstore import MapConfig, MapStore

_MAP_ARRAYS = [
    "kf_R", "kf_t", "kf_valid", "kf_ts", "kf_frame_id", "kf_epoch",
    "kf_feat_xy", "kf_feat_xyn", "kf_feat_level", "kf_feat_angle",
    "kf_feat_desc", "kf_feat_valid", "kf_feat_point",
    "pt_xyz", "pt_valid", "pt_desc", "pt_normal", "pt_min_dist",
    "pt_max_dist", "pt_ref_kf", "pt_first_kf", "pt_found", "pt_visible",
    # inertial per-KF state + temporal chain (reference boost-serializes
    # these with KeyFrame: mVw/mImuBias/mpImuPreintegrated, KeyFrame.h:55-190)
    "kf_vel", "kf_bg", "kf_ba", "kf_prev", "kf_pre_dT", "kf_pre_dR",
    "kf_pre_dV", "kf_pre_dP", "kf_pre_C", "kf_pre_JRg", "kf_pre_JVg",
    "kf_pre_JVa", "kf_pre_JPg", "kf_pre_JPa", "kf_pre_bg0", "kf_pre_ba0",
]


def _map_to_npz_bytes(m: MapStore) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, imu_flags=np.asarray(
        [m.imu_initialized, m.imu_ba1, m.imu_ba2], bool),
        **{k: getattr(m, k) for k in _MAP_ARRAYS})
    return buf.getvalue()


def _map_from_npz_bytes(data: bytes, cfg: MapConfig) -> MapStore:
    z = np.load(io.BytesIO(data))
    # capacities come from the blob: maps grown past the atlas-level
    # MapConfig (MapStore.grow) round-trip at their grown size
    from dataclasses import replace
    m = MapStore(replace(cfg, max_kf=len(z["kf_valid"]),
                         max_pt=len(z["pt_valid"])))
    for k in _MAP_ARRAYS:
        if k in z.files:        # older checkpoints lack the inertial block
            dst, a = getattr(m, k), z[k]
            if dst.shape == a.shape:
                dst[...] = a
            else:
                # MapConfig.__post_init__ rounds max_pt up to a 32-word
                # multiple; checkpoints written before that rounding (or at
                # a non-multiple capacity) load into the rounded store with
                # the tail rows left at their defaults (invalid/empty)
                if any(sa > sd for sa, sd in zip(a.shape, dst.shape)):
                    raise ValueError(
                        f"checkpoint array {k} {a.shape} exceeds "
                        f"store capacity {dst.shape}")
                dst[tuple(slice(0, s) for s in a.shape)] = a
    if "imu_flags" in z.files:
        m.imu_initialized, m.imu_ba1, m.imu_ba2 = (bool(x)
                                                   for x in z["imu_flags"])
    m.version = 1
    return m


def save_atlas(atlas: Atlas, path: str):
    header = {
        "format": "tpu-slam-atlas-v1",
        "active_id": atlas.active_id,
        "n_maps": len(atlas.maps),
        "map_cfg": {
            "max_kf": atlas.map_cfg.max_kf, "max_pt": atlas.map_cfg.max_pt,
            "n_feat": atlas.map_cfg.n_feat, "n_levels": atlas.map_cfg.n_levels,
            "scale": atlas.map_cfg.scale,
        },
        "kf_redirect": [
            [list(k), [v[0], v[1], v[2], v[3].tolist(), v[4].tolist()]]
            for k, v in atlas.kf_redirect.items()
        ],
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        blobs = []
        for i, m in enumerate(atlas.maps):
            blob = _map_to_npz_bytes(m)
            blobs.append(blob)
            zf.writestr(f"map_{i}.npz", blob)
        header["checksums"] = [hashlib.md5(b).hexdigest() for b in blobs]
        zf.writestr("header.json", json.dumps(header))


def load_atlas(path: str) -> Atlas:
    with zipfile.ZipFile(path, "r") as zf:
        header = json.loads(zf.read("header.json"))
        if header.get("format") != "tpu-slam-atlas-v1":
            raise ValueError(f"unknown atlas format in {path}")
        c = header["map_cfg"]
        cfg = MapConfig(max_kf=c["max_kf"], max_pt=c["max_pt"],
                        n_feat=c["n_feat"], n_levels=c["n_levels"],
                        scale=c["scale"])
        atlas = Atlas(cfg)
        atlas.maps = []
        for i in range(header["n_maps"]):
            blob = zf.read(f"map_{i}.npz")
            if hashlib.md5(blob).hexdigest() != header["checksums"][i]:
                raise ValueError(f"checksum mismatch for map_{i} in {path}")
            atlas.maps.append(_map_from_npz_bytes(blob, cfg))
        atlas.active_id = header["active_id"]
        for k, v in header.get("kf_redirect", []):
            atlas.kf_redirect[tuple(k)] = (
                v[0], v[1], v[2],
                np.asarray(v[3], np.float32), np.asarray(v[4], np.float32))
    return atlas


def save_map(m: MapStore, path: str):
    with open(path, "wb") as f:
        f.write(_map_to_npz_bytes(m))


def load_map(path: str, cfg: MapConfig) -> MapStore:
    with open(path, "rb") as f:
        return _map_from_npz_bytes(f.read(), cfg)
