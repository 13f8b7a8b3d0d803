"""The Pallas selection/gather kernels against their XLA-exact forms.

Both kernels must be BIT-identical to the XLA ops they replace
(lax.top_k / vmapped dynamic_slice): the extractor chooses the path by
backend, and CPU tests must validate what the TPU runs. On CPU the
kernels run in interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_detailed_comments_tpu.ops import pallas_patches, pallas_topk


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_cell_topk_matches_lax_topk(rng):
    # NMS-like sparsity plus exact ties to exercise tie-breaking
    x = np.where(rng.uniform(size=(137, 1024)) < 0.08,
                 rng.integers(7, 100, (137, 1024)).astype(np.float32), 0.0)
    x[0, :] = 0.0                      # all-zero cell
    x[1, 5] = x[1, 900] = 42.0         # tie: lower index must win
    xj = jnp.asarray(x)
    v_ref, i_ref = jax.lax.top_k(xj, 8)
    v, i = pallas_topk.cell_topk(xj, 8, interpret=True)
    assert jnp.all(v == v_ref) and jnp.all(i == i_ref)


def test_gather_patches_atlas_matches_xla(rng):
    levels = [jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
              for h, w in [(480, 752), (400, 627), (137, 256)]]
    atlas, offs = pallas_patches.build_atlas(levels, 752)
    assert atlas.shape[1] % 128 == 0
    n = 64
    pw = 37
    rcs = []
    for lv, l in enumerate(levels):
        r = rng.integers(0, l.shape[0] - pw, n)
        c = rng.integers(0, l.shape[1] - pw, n)
        rcs.append(np.stack([r + offs[lv], c], 1))
    rc = jnp.asarray(np.concatenate(rcs).astype(np.int32))
    ref = pallas_patches.gather_patches_atlas_xla(atlas, rc, pw)
    out = pallas_patches.gather_patches_atlas(atlas, rc, pw, interpret=True)
    assert out.shape == (3 * n, pw, pw)
    assert jnp.all(out == ref)
    # and the atlas regions really are the level contents
    lv2 = np.asarray(levels[2])
    r, c = int(rc[2 * n, 0]) - offs[2], int(rc[2 * n, 1])
    assert np.array_equal(np.asarray(ref[2 * n]), lv2[r:r + pw, c:c + pw])


def test_gather_patches_odd_count(rng):
    """N not a multiple of the kernel block: padding path."""
    lvl = jnp.asarray(rng.uniform(0, 255, (96, 256)).astype(np.float32))
    atlas, offs = pallas_patches.build_atlas([lvl], 256)
    rc = jnp.asarray(np.stack([rng.integers(0, 60, 13),
                               rng.integers(0, 200, 13)], 1).astype(np.int32))
    ref = pallas_patches.gather_patches_atlas_xla(atlas, rc, 31)
    out = pallas_patches.gather_patches_atlas(atlas, rc, 31, interpret=True)
    assert jnp.all(out == ref)


def test_windowed_best2_matches_xla_fallback(rng):
    """The fused windowed projection-search kernel (window + level gates +
    Hamming best-2 in VMEM) must agree with the XLA masked path on
    distances, indices and the accept mask."""
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.ops import matching, pallas_hamming

    Q, K = 256, 128
    da = jnp.asarray(rng.integers(0, 2**32, (Q, 8), dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
    # clustered positions so windows catch a realistic mix of 0..many targets
    q_uv = jnp.asarray(rng.uniform(0, 200, (Q, 2)).astype(np.float32))
    t_xy = jnp.asarray(rng.uniform(0, 200, (K, 2)).astype(np.float32))
    q_lv = jnp.asarray(rng.integers(0, 8, Q).astype(np.int32))
    t_lv = jnp.asarray(rng.integers(0, 8, K).astype(np.int32))
    q_r = jnp.asarray(rng.uniform(5, 40, Q).astype(np.float32))
    qv = jnp.asarray(rng.random(Q) > 0.1)
    tv = jnp.asarray(rng.random(K) > 0.1)
    lo = jnp.full((Q,), -1, jnp.int32)
    hi = jnp.full((Q,), 1, jnp.int32)

    d1, i1, d2 = pallas_hamming.hamming_best2_windowed(
        da, q_uv, q_lv, q_r, lo, hi, qv, db, t_xy, t_lv, tv, interpret=True)

    wmask = matching.window_mask(q_uv, t_xy, q_r)
    lmask = matching.level_mask(q_lv, t_lv, -1, 1)
    ref = matching.match_nn(da, qv, db, tv, max_dist=matching.TH_HIGH,
                            ratio=0.8, mutual=False, extra_mask=wmask & lmask)
    ok = ((d1 <= matching.TH_HIGH)
          & (d1.astype(jnp.float32) <= 0.8 * d2.astype(jnp.float32)))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref.valid))
    sel = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(i1)[sel],
                                  np.asarray(ref.idx)[sel])
    np.testing.assert_array_equal(np.asarray(d1)[sel],
                                  np.asarray(ref.dist)[sel])


def test_search_by_projection_pallas_dispatch_equivalent(rng):
    """search_by_projection must produce identical matches through the fused
    Pallas windowed kernel and the XLA masked fallback (including the
    per-query radius broadcast and the `taken` keypoint mask)."""
    import os
    import jax
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.ops import matching
    from orb_slam3_detailed_comments_tpu.ops.extractor import FrameFeatures

    Q, K = 256, 128
    proj_desc = jnp.asarray(rng.integers(0, 2**32, (Q, 8), dtype=np.uint32))
    proj_xy = jnp.asarray(rng.uniform(0, 300, (Q, 2)).astype(np.float32))
    proj_level = jnp.asarray(rng.integers(0, 8, Q).astype(np.int32))
    proj_valid = jnp.asarray(rng.random(Q) > 0.15)
    # half the frame keypoints copy a projected descriptor (few bits flipped)
    fdesc = rng.integers(0, 2**32, (K, 8), dtype=np.uint32)
    src = rng.permutation(Q)[: K // 2]
    fdesc[: K // 2] = np.asarray(proj_desc)[src] ^ np.uint32(1)
    fxy = rng.uniform(0, 300, (K, 2)).astype(np.float32)
    fxy[: K // 2] = np.asarray(proj_xy)[src] + rng.normal(0, 3, (K // 2, 2))
    flv = np.asarray(proj_level)[
        np.concatenate([src, rng.integers(0, Q, K - K // 2)])].copy()
    feat = FrameFeatures(
        xy=jnp.asarray(fxy), level=jnp.asarray(flv.astype(np.int32)),
        angle=jnp.zeros(K), score=jnp.ones(K),
        desc=jnp.asarray(fdesc), valid=jnp.asarray(rng.random(K) > 0.1))
    radius = jnp.asarray(rng.uniform(8, 30, Q).astype(np.float32))
    taken = jnp.asarray(rng.random(K) > 0.8)

    def run():
        return matching.search_by_projection(
            proj_xy, proj_valid, proj_desc, proj_level, feat, radius,
            level_lo=-1, level_hi=1, max_dist=matching.TH_HIGH, ratio=0.8,
            taken=taken)

    assert os.environ.get("ORB_TPU_PALLAS") is None
    ref = jax.device_get(run())          # XLA fallback (CPU default)
    os.environ["ORB_TPU_PALLAS"] = "1"
    jax.clear_caches()                   # the jit cache key ignores the env
    try:
        pal = jax.device_get(run())
    finally:
        os.environ.pop("ORB_TPU_PALLAS")
        jax.clear_caches()
    np.testing.assert_array_equal(ref.valid, pal.valid)
    assert ref.valid.sum() >= 20         # the scenario produces real matches
    sel = ref.valid
    np.testing.assert_array_equal(ref.idx[sel], pal.idx[sel])
    np.testing.assert_array_equal(ref.dist[sel], pal.dist[sel])
