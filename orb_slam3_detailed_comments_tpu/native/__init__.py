"""ctypes loader for the native host-runtime library (slam_host.cpp).

Builds the shared library with g++ on first import (cached next to the
source); falls back to `available = False` so pure-numpy paths keep working
where no toolchain exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "slam_host.cpp")
_SO = os.path.join(_HERE, "libslam_host.so")

available = False
_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, available
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
    except Exception:
        available = False
        return
    i32 = ctypes.c_int32
    _lib.update_point_stats.restype = ctypes.c_int
    _lib.replace_point.restype = ctypes.c_int
    _lib.observation_counts.restype = None
    _lib.build_incidence_bits.restype = None
    _lib.covis_counts.restype = None
    _lib.observers_of.restype = None
    available = True


_load()


def _ptr(a, dtype):
    assert a.dtype == dtype and a.flags["C_CONTIGUOUS"], (a.dtype, dtype)
    return a.ctypes.data_as(ctypes.c_void_p)


def update_point_stats(kf_valid, kf_feat_point, kf_feat_desc, kf_feat_level,
                       kf_R, kf_t, pt_xyz, pt_ref_kf, pids, scale_factors,
                       pt_desc, pt_normal, pt_min_dist, pt_max_dist) -> int:
    K, N = kf_feat_point.shape
    P = pt_xyz.shape[0]
    pids = np.ascontiguousarray(pids, np.int64)
    return _lib.update_point_stats(
        K, N, P, len(pids), len(scale_factors),
        _ptr(kf_valid, np.dtype(bool)), _ptr(kf_feat_point, np.dtype(np.int32)),
        _ptr(kf_feat_desc, np.dtype(np.uint32)),
        _ptr(kf_feat_level, np.dtype(np.int32)),
        _ptr(kf_R, np.dtype(np.float32)), _ptr(kf_t, np.dtype(np.float32)),
        _ptr(pt_xyz, np.dtype(np.float32)), _ptr(pt_ref_kf, np.dtype(np.int32)),
        _ptr(pids, np.dtype(np.int64)),
        _ptr(scale_factors, np.dtype(np.float32)),
        _ptr(pt_desc, np.dtype(np.uint32)), _ptr(pt_normal, np.dtype(np.float32)),
        _ptr(pt_min_dist, np.dtype(np.float32)),
        _ptr(pt_max_dist, np.dtype(np.float32)))


def replace_point(kf_valid, kf_feat_point, old_id: int, new_id: int) -> int:
    K, N = kf_feat_point.shape
    return _lib.replace_point(
        K, N, _ptr(kf_valid, np.dtype(bool)),
        _ptr(kf_feat_point, np.dtype(np.int32)), int(old_id), int(new_id))


def build_incidence_bits(kf_valid, kf_feat_point, P: int) -> np.ndarray:
    """[K, ceil(P/64)] uint64 bitset: KF k observes point p."""
    K, N = kf_feat_point.shape
    Pw = (P + 63) // 64
    bits = np.empty((K, Pw), np.uint64)
    _lib.build_incidence_bits(
        K, N, P, _ptr(kf_valid, np.dtype(bool)),
        _ptr(kf_feat_point, np.dtype(np.int32)), _ptr(bits, np.dtype(np.uint64)))
    return bits


def covis_counts(bits, kf_valid, ks) -> np.ndarray:
    """[M, K] shared-point counts of query KFs `ks` against all KFs."""
    K, Pw = bits.shape
    ks = np.ascontiguousarray(ks, np.int64)
    out = np.empty((len(ks), K), np.int32)
    _lib.covis_counts(
        K, Pw, _ptr(bits, np.dtype(np.uint64)), _ptr(kf_valid, np.dtype(bool)),
        len(ks), _ptr(ks, np.dtype(np.int64)), _ptr(out, np.dtype(np.int32)))
    return out


def observers_of(bits, kf_valid, pt_ids, P: int) -> np.ndarray:
    """[K] bool: KFs observing ANY of pt_ids."""
    K, Pw = bits.shape
    pt_bits = np.zeros(Pw, np.uint64)
    ids = np.asarray(pt_ids, np.int64)
    np.bitwise_or.at(pt_bits, ids >> 6,
                     np.uint64(1) << (ids & 63).astype(np.uint64))
    out = np.empty(K, np.uint8)
    _lib.observers_of(
        K, Pw, _ptr(bits, np.dtype(np.uint64)), _ptr(kf_valid, np.dtype(bool)),
        _ptr(pt_bits, np.dtype(np.uint64)), _ptr(out, np.dtype(np.uint8)))
    return out.astype(bool)


def observation_counts(kf_valid, kf_feat_point, P: int) -> np.ndarray:
    K, N = kf_feat_point.shape
    out = np.zeros(P, np.int32)
    _lib.observation_counts(
        K, N, P, _ptr(kf_valid, np.dtype(bool)),
        _ptr(kf_feat_point, np.dtype(np.int32)), _ptr(out, np.dtype(np.int32)))
    return out
