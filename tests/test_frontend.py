"""Frontend tests: FAST vs OpenCV golden corners, descriptor matching sanity,
rotation invariance (SURVEY.md §4: 'FAST/BRIEF vs reference values')."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_detailed_comments_tpu.ops import brief, extractor, fast, pyramid

cv2 = pytest.importorskip("cv2")


def synth_image(rng, h=240, w=320, n_blobs=120):
    """Textured synthetic image with corner-rich structure."""
    img = np.full((h, w), 128.0, np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        bh, bw = rng.integers(4, 16), rng.integers(4, 16)
        img[y:y + bh, x:x + bw] = rng.uniform(0, 255)
    img += rng.normal(0, 2.0, size=(h, w)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


class TestFast:
    def test_matches_opencv_corners(self, rng):
        img = synth_image(rng)
        sc = np.asarray(fast.fast_score(jnp.asarray(img)))
        ours = sc > 20.0
        det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
        kps = det.detect(img.astype(np.uint8))
        cv_mask = np.zeros_like(ours)
        for kp in kps:
            cv_mask[int(kp.pt[1]), int(kp.pt[0])] = True
        # interior only (our roll wraps at borders; cv has its own border rules)
        inner = np.zeros_like(ours); inner[4:-4, 4:-4] = True
        both = ours & cv_mask & inner
        cv_only = cv_mask & inner
        our_only = ours & inner
        # High agreement both directions (uint8 rounding can flip marginal px)
        assert both.sum() > 0.93 * cv_only.sum()
        assert both.sum() > 0.93 * our_only.sum()

    def test_nms_keeps_local_maxima(self, rng):
        img = synth_image(rng)
        sc = np.asarray(fast.nms3x3(fast.fast_score(jnp.asarray(img))))
        ys, xs = np.where(sc > 20)
        for y, x in zip(ys[:50], xs[:50]):
            if 1 <= y < sc.shape[0] - 1 and 1 <= x < sc.shape[1] - 1:
                patch = sc[y - 1:y + 2, x - 1:x + 2]
                assert sc[y, x] == patch.max()

    def test_select_grid_topk_uniformity(self, rng):
        img = synth_image(rng, n_blobs=300)
        sc = fast.nms3x3(fast.fast_score(jnp.asarray(img)))
        sc = jnp.where(fast.border_mask(sc.shape, sc.shape, 16), sc, 0.0)
        kps = fast.select_grid_topk(sc, 200, cell=32, k_per_cell=8)
        yx = np.asarray(kps.yx)[np.asarray(kps.valid)]
        assert len(yx) > 100
        # spatial spread: keypoints should hit most 64x64 super-cells
        occ = set((int(y) // 64, int(x) // 64) for y, x in yx)
        assert len(occ) >= 10


class TestDescriptors:
    def test_same_image_matches(self, rng):
        img = synth_image(rng)
        f = extractor.extract(jnp.asarray(img))
        d = np.asarray(f.desc)
        v = np.asarray(f.valid)
        # descriptor of a keypoint vs itself = 0; vs random others ~128
        dist_rand = hamming_np(d[v][:50], d[v][50:100])
        assert dist_rand.mean() > 80

    def test_translation_invariance(self, rng):
        img = synth_image(rng)
        shift = 7
        img2 = np.roll(img, (shift, shift), axis=(0, 1))
        f1 = extractor.extract(jnp.asarray(img))
        f2 = extractor.extract(jnp.asarray(img2))
        d1, d2 = np.asarray(f1.desc), np.asarray(f2.desc)
        xy1 = np.asarray(f1.xy); xy2 = np.asarray(f2.xy)
        v1 = np.asarray(f1.valid); v2 = np.asarray(f2.valid)
        lv1 = np.asarray(f1.level); lv2 = np.asarray(f2.level)
        # level-0 keypoints displaced by (shift, shift): find correspondences
        m = 0; good = 0
        for i in np.where(v1 & (lv1 == 0))[0][:120]:
            target = xy1[i] + shift
            j = np.argmin(np.abs(xy2 - target).sum(axis=1) + 1e9 * (~(v2 & (lv2 == 0))))
            if np.abs(xy2[j] - target).sum() < 1.5:
                m += 1
                dist = bin(int(d1[i, 0] ^ d2[j, 0])).count("1")
                dist = hamming_np(d1[i:i+1], d2[j:j+1])[0, 0]
                if dist < 40:
                    good += 1
        assert m > 20
        assert good > 0.8 * m

    def test_rotation_invariance(self, rng):
        img = synth_image(rng, h=256, w=256)
        angle_deg = 30.0
        M = cv2.getRotationMatrix2D((128, 128), angle_deg, 1.0)
        img2 = cv2.warpAffine(img, M, (256, 256), flags=cv2.INTER_LINEAR)
        f1 = extractor.extract(jnp.asarray(img))
        f2 = extractor.extract(jnp.asarray(img2))
        d1, d2 = np.asarray(f1.desc), np.asarray(f2.desc)
        xy1, xy2 = np.asarray(f1.xy), np.asarray(f2.xy)
        v1 = np.asarray(f1.valid) & (np.asarray(f1.level) == 0)
        v2 = np.asarray(f2.valid) & (np.asarray(f2.level) == 0)
        R = M[:, :2]; t = M[:, 2]
        matched = 0; good = 0
        for i in np.where(v1)[0]:
            tgt = R @ xy1[i] + t
            if not (20 < tgt[0] < 236 and 20 < tgt[1] < 236):
                continue
            dd = np.abs(xy2 - tgt).sum(axis=1) + 1e9 * (~v2)
            j = np.argmin(dd)
            if dd[j] < 2.0:
                matched += 1
                if hamming_np(d1[i:i+1], d2[j:j+1])[0, 0] < 64:
                    good += 1
        assert matched > 15
        assert good > 0.6 * matched


    def test_mxu_patches_match_golden_gather(self, rng):
        """describe_patches (per-angle-bin +-1 pattern matmuls on patches)
        must be bit-identical to the golden coordinate-rotating gather form
        when the angle sits at a bin center (same nearest-pixel rounding)."""
        img = jnp.asarray(synth_image(rng, h=200, w=300))
        n = 64
        yx = np.stack([rng.integers(30, 170, n),
                       rng.integers(30, 270, n)], 1).astype(np.int32)
        bins = rng.integers(0, brief.N_ANGLE_BINS, n)
        ang = (2 * np.pi * (bins + 0.5) / brief.N_ANGLE_BINS).astype(np.float32)
        img = jnp.round(img)   # production feeds integer-rounded blur
        d_gold = np.asarray(brief.describe(img, jnp.asarray(yx),
                                           jnp.asarray(ang)))
        patches = brief.extract_patches(img, jnp.asarray(yx), (200, 300))
        d_new = np.asarray(brief.describe_patches(patches, jnp.asarray(ang)))
        assert (d_gold == d_new).all()

    def test_mxu_patches_close_at_arbitrary_angles(self, rng):
        """At arbitrary angles only the 12-degree orientation quantization
        (the ORB paper's own discretization) separates the two forms; on a
        smooth (blurred) image the Hamming gap must stay far below the
        TH_LOW=50 match gate."""
        import cv2 as _cv2
        img = _cv2.GaussianBlur(synth_image(rng, h=200, w=300), (7, 7), 2.0)
        img = jnp.round(jnp.asarray(img))
        n = 96
        yx = np.stack([rng.integers(30, 170, n),
                       rng.integers(30, 270, n)], 1).astype(np.int32)
        ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        d_gold = np.asarray(brief.describe(img, jnp.asarray(yx),
                                           jnp.asarray(ang)))
        patches = brief.extract_patches(img, jnp.asarray(yx), (200, 300))
        d_new = np.asarray(brief.describe_patches(patches, jnp.asarray(ang)))
        dist = np.diagonal(hamming_np(d_gold, d_new))
        assert dist.mean() < 25, dist.mean()


    def test_patch_angle_and_blur_match_dense_forms(self, rng):
        """The single raw-patch gather must reproduce the dense golden
        forms for interior keypoints: IC angle from the centered 31x31
        crop == dense moment maps; per-patch valid blur == full-image
        Gaussian blur."""
        img = jnp.asarray(synth_image(rng, h=200, w=300))
        yx = np.stack([rng.integers(30, 170, 60),
                       rng.integers(30, 270, 60)], 1).astype(np.int32)
        raw, ctr = brief.extract_patches_ctr(img, jnp.asarray(yx), (200, 300))
        a_patch = np.asarray(brief.ic_angle_patches(
            brief.crop_centered(raw, ctr, brief.HALF_PATCH)))
        a_dense = np.asarray(brief.ic_angle(img, jnp.asarray(yx)))
        wrap = np.abs(np.angle(np.exp(1j * (a_patch - a_dense))))
        assert wrap.max() < 1e-3
        dense_blur = np.asarray(pyramid.gaussian_blur(img))
        pb = np.asarray(brief.blur_patches(raw))
        for i in range(10):
            y, x = yx[i]
            ref = dense_blur[y - brief.PATCH_R:y + brief.PATCH_R + 1,
                             x - brief.PATCH_R:x + brief.PATCH_R + 1]
            assert np.abs(pb[i] - ref).max() < 1e-3


def hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,8]x[M,8] uint32 -> [N,M] popcount Hamming distances (numpy ref)."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1)


class TestExtractor:
    def test_shapes_and_validity(self, rng):
        img = synth_image(rng)
        f = extractor.extract(jnp.asarray(img))
        n = f.capacity
        assert f.desc.shape == (n, 8)
        assert f.xy.shape == (n, 2)
        v = np.asarray(f.valid)
        assert v.sum() > 200
        xy = np.asarray(f.xy)[v]
        assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
        assert (np.asarray(f.level)[v] >= 0).all()

    def test_levels_populated(self, rng):
        img = synth_image(rng)
        f = extractor.extract(jnp.asarray(img))
        lv = np.asarray(f.level)[np.asarray(f.valid)]
        assert len(np.unique(lv)) >= 4  # multiple pyramid levels fire


class TestPallasHamming:
    def test_matches_xla_path(self, rng):
        """Fused Pallas best-2 kernel (interpret mode on CPU) against the
        dense XLA reference."""
        import jax.numpy as jnp
        from orb_slam3_detailed_comments_tpu.ops import matching, pallas_hamming
        Q, K = 256, 384
        da = jnp.asarray(rng.integers(0, 2**32, (Q, 8), dtype=np.uint32))
        db = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
        vb = jnp.asarray(rng.random(K) > 0.2)
        d1, i1, d2 = pallas_hamming.hamming_best2(da, db, vb, interpret=True)
        dist = matching.hamming_matrix(da, db)
        ref = np.where(np.asarray(vb)[None, :], np.asarray(dist), 10_000)
        ref_i1 = ref.argmin(1)
        ref_d1 = ref.min(1)
        np.testing.assert_array_equal(np.asarray(d1), ref_d1)
        np.testing.assert_array_equal(np.asarray(i1), ref_i1)
        ref2 = ref.copy()
        ref2[np.arange(Q), ref_i1] = 10_000
        np.testing.assert_array_equal(np.asarray(d2), ref2.min(1))

    def test_match_nn_pallas_path_equivalent(self, rng):
        import os
        import jax.numpy as jnp
        from orb_slam3_detailed_comments_tpu.ops import matching
        Q, K = 256, 256
        da = jnp.asarray(rng.integers(0, 2**32, (Q, 8), dtype=np.uint32))
        # make some true correspondences: db is a permuted, lightly flipped da
        perm = rng.permutation(Q)[:K]
        db = np.asarray(da)[perm]
        flip = rng.integers(0, 2**32, db.shape, dtype=np.uint32)
        db = jnp.asarray(db ^ (flip & flip & np.uint32(0x1)))  # flip few bits
        va = jnp.ones(Q, bool)
        vb = jnp.ones(K, bool)
        r_ref = matching.match_nn(da, va, db, vb, max_dist=60, ratio=0.9)
        os.environ["ORB_TPU_PALLAS"] = "1"
        try:
            r_pal = matching.match_nn(da, va, db, vb, max_dist=60, ratio=0.9)
        finally:
            os.environ.pop("ORB_TPU_PALLAS")
        np.testing.assert_array_equal(np.asarray(r_ref.valid),
                                      np.asarray(r_pal.valid))
        sel = np.asarray(r_ref.valid)
        np.testing.assert_array_equal(np.asarray(r_ref.idx)[sel],
                                      np.asarray(r_pal.idx)[sel])


class TestPallasFrontend:
    """Fused dense-frontend Pallas kernel (ops/pallas_frontend.py): one
    VMEM-resident pass producing FAST score + blur + moment maps."""

    def test_dense_maps_match_golden(self, rng):
        from orb_slam3_detailed_comments_tpu.ops import pallas_frontend
        img = jnp.asarray(np.round(synth_image(rng, h=120, w=160)))
        score, blur_m, m10, m01 = pallas_frontend.dense_frontend(
            img, interpret=True)
        g_score = fast.nms3x3(fast.fast_score(img))
        g_blur = jnp.round(pyramid.gaussian_blur(img))
        g_m10, g_m01 = brief._moment_maps(img)
        # interior only: borders use edge replication instead of wrap rolls
        sl = np.s_[20:-20, 20:-20]
        np.testing.assert_array_equal(np.asarray(score)[sl],
                                      np.asarray(g_score)[sl])
        np.testing.assert_array_equal(np.asarray(blur_m)[sl],
                                      np.asarray(g_blur)[sl])
        # moments: same values, different f32 summation order (values are
        # O(1e5), so a few ULP of absolute drift is ~1e-5 relative)
        assert np.abs(np.asarray(m10) - np.asarray(g_m10))[sl].max() < 5.0
        assert np.abs(np.asarray(m01) - np.asarray(g_m01))[sl].max() < 5.0

    def test_extractor_equivalence(self, rng):
        """The fused-frontend extractor must select the same keypoints as
        the XLA path and produce near-identical angles/descriptors."""
        img = jnp.asarray(np.round(synth_image(rng, h=240, w=320)))
        cfg = extractor.OrbConfig(n_features=256, n_levels=4)
        fx = extractor._extract_impl(img, cfg, 240, 320, frontend="xla")
        fp = extractor._extract_impl(img, cfg, 240, 320,
                                     frontend="pallas_interpret")
        np.testing.assert_array_equal(np.asarray(fx.valid), np.asarray(fp.valid))
        v = np.asarray(fx.valid)
        np.testing.assert_array_equal(np.asarray(fx.xy)[v], np.asarray(fp.xy)[v])
        np.testing.assert_array_equal(np.asarray(fx.level)[v],
                                      np.asarray(fp.level)[v])
        wrap = np.abs(np.angle(np.exp(1j * (np.asarray(fx.angle)[v]
                                            - np.asarray(fp.angle)[v]))))
        assert wrap.max() < 1e-3
        same = (np.asarray(fx.desc)[v] == np.asarray(fp.desc)[v]).all(axis=1)
        assert same.mean() > 0.97   # only angle-bin boundary flips may differ


def test_packed_proj8_gather_matches_unpacked(rng):
    """gather_and_project's packed [P, 8] row-gather path must match the
    four-array path exactly (the packed rows carry the same float32
    values; only the gather count changes)."""
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.lie import SE3
    from orb_slam3_detailed_comments_tpu.pipeline import kernels
    from synthetic import CAM
    P, C = 512, 128
    xyz = rng.normal(0, 2, (P, 3)).astype(np.float32) + [0, 0, 5]
    nrm = rng.normal(0, 1, (P, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    mn = rng.uniform(0.1, 1, P).astype(np.float32)
    mx = rng.uniform(2, 50, P).astype(np.float32)
    valid = rng.random(P) < 0.9
    ids = rng.integers(-1, P, C).astype(np.int32)
    proj8 = jnp.asarray(np.concatenate(
        [xyz, nrm, mn[:, None], mx[:, None]], axis=1))
    T = SE3(jnp.eye(3), jnp.zeros(3))
    a = kernels.gather_and_project(
        T, jnp.asarray(ids), jnp.asarray(xyz), jnp.asarray(nrm),
        jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(valid), CAM)
    b = kernels.gather_and_project(
        T, jnp.asarray(ids), jnp.asarray(xyz), jnp.asarray(nrm),
        jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(valid), CAM,
        pt_proj8=proj8)
    np.testing.assert_array_equal(np.asarray(a.uv), np.asarray(b.uv))
    np.testing.assert_array_equal(np.asarray(a.level), np.asarray(b.level))
    np.testing.assert_array_equal(np.asarray(a.visible),
                                  np.asarray(b.visible))


def test_epipolar_sad_refine_recovers_subpixel_shift():
    """ops/stereo.epipolar_sad_refine must recover a known sub-pixel
    correspondence error along the epipolar direction (the KB8 stereo
    refinement stage — opt-in via kernels.KB8_SUBPIXEL; the op itself is
    pinned here). Right image = left shifted by a known fractional amount;
    initial right positions carry a known error; the recovered delta must
    cancel it."""
    import numpy as np
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.ops import stereo as stereo_mod

    rng = np.random.default_rng(5)
    H, W = 128, 256
    base = rng.uniform(0, 255, (H, W + 8)).astype(np.float32)
    import cv2
    base = cv2.GaussianBlur(base, (0, 0), 1.2)
    shift = 3.4          # right content displaced by exactly -3.4 px in x
    xs = np.arange(W, dtype=np.float32)
    img_l = base[:, :W]
    # sample base at x + shift via linear interp (pure x translation)
    x0 = np.floor(xs + shift).astype(int)
    f = (xs + shift) - x0
    img_r = (1 - f)[None, :] * base[:, x0] + f[None, :] * base[:, x0 + 1]
    # features on a grid, away from borders
    gy, gx = np.meshgrid(np.arange(20, 108, 12), np.arange(20, 236, 12),
                         indexing="ij")
    xy_l = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    N = len(xy_l)
    # true right correspondence is x - shift; give it a known error
    err = rng.uniform(-1.5, 1.5, N).astype(np.float32)
    xy_r = xy_l.copy()
    xy_r[:, 0] -= shift
    xy_r[:, 0] += err
    e_dir = np.tile(np.array([[1.0, 0.0]], np.float32), (N, 1))
    delta, ok = stereo_mod.epipolar_sad_refine(
        jnp.asarray(img_l), jnp.asarray(img_r.astype(np.float32)),
        jnp.asarray(xy_l), jnp.asarray(xy_r), jnp.asarray(e_dir),
        jnp.ones(N, bool))
    delta, ok = np.asarray(delta), np.asarray(ok)
    assert ok.mean() > 0.9, f"only {ok.mean():.2f} refinable"
    resid = (err + delta)[ok]        # delta must cancel the injected error
    # parabola-on-L1 has a ~0.1-0.15 px fit floor on random texture; the
    # injected errors are uniform +-1.5 px (|err| mean 0.75), so 0.2 px
    # median residual is a real ~4x recovery, not a loose gate
    assert np.median(np.abs(resid)) < 0.2, np.median(np.abs(resid))
    assert (np.abs(resid) < 0.4).mean() > 0.85
