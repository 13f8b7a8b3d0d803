"""Native host-runtime library (native/slam_host.cpp) vs its numpy forms.

The C++ side owns the irregular host-side map bookkeeping (SURVEY §2.2's
pointer-chasing logic); these tests pin exact equivalence with the numpy
fallbacks so either path can serve any query.
"""
import numpy as np
import pytest

from orb_slam3_detailed_comments_tpu import native


pytestmark = pytest.mark.skipif(not native.available,
                                reason="no native toolchain")


@pytest.fixture
def world():
    rng = np.random.default_rng(3)
    K, N, P = 32, 256, 4096
    kf_valid = rng.uniform(size=K) < 0.8
    fp = np.where(rng.uniform(size=(K, N)) < 0.4,
                  rng.integers(0, P, (K, N)), -1).astype(np.int32)
    inc = np.zeros((K, P), bool)
    kk, ff = np.nonzero(fp >= 0)
    inc[kk, fp[kk, ff]] = True
    inc &= kf_valid[:, None]
    return kf_valid, fp, inc, P


def test_covis_counts_matches_incidence_matmul(world):
    kf_valid, fp, inc, P = world
    bits = native.build_incidence_bits(kf_valid, fp, P)
    ks = np.array([0, 5, 11, 31])
    W = native.covis_counts(bits, kf_valid, ks)
    Wref = inc[ks].astype(np.int32) @ inc.astype(np.int32).T
    assert np.array_equal(W, Wref)


def test_observers_of_matches_any(world):
    kf_valid, fp, inc, P = world
    bits = native.build_incidence_bits(kf_valid, fp, P)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, P, 64)
    ob = native.observers_of(bits, kf_valid, ids, P)
    assert np.array_equal(ob, inc[:, ids].any(axis=1))
    # empty / single point edge cases
    one = native.observers_of(bits, kf_valid, ids[:1], P)
    assert np.array_equal(one, inc[:, ids[:1]].any(axis=1))


def test_mapstore_covisibility_native_vs_numpy(monkeypatch):
    """The MapStore covisibility surface returns the same graph through the
    native bitset path and the numpy incidence path."""
    from orb_slam3_detailed_comments_tpu.mapping import mapstore

    rng = np.random.default_rng(9)
    m = mapstore.MapStore(mapstore.MapConfig(n_feat=128, max_kf=16,
                                             max_pt=1024))
    # hand-populate a few keyframes sharing points
    for k in range(6):
        m.kf_valid[k] = True
        m.kf_feat_point[k] = -1
        pts = rng.integers(0, 300, 64)
        m.kf_feat_point[k, :64] = pts
    m.version += 1

    ks = [0, 2, 5]
    native_w = m._covis_weights(ks).copy()
    monkeypatch.setattr(native, "available", False)
    numpy_w = m._covis_weights(ks)
    assert np.array_equal(native_w, numpy_w)
