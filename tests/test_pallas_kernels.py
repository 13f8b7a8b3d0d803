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
