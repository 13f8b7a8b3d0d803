"""Optimizer tests: GN pose optimization, LM-BA with Schur elimination,
triangulation — all against synthetic ground truth (SURVEY.md §4:
'GN/Schur vs dense solve', 'golden' convergence checks)."""
import numpy as np
import jax.numpy as jnp

from orb_slam3_detailed_comments_tpu.lie import SE3, se3, so3
from orb_slam3_detailed_comments_tpu.ops import triangulate
from orb_slam3_detailed_comments_tpu.optim import ba, pose_opt

from synthetic import CAM, make_scene


class TestTriangulate:
    def test_exact_recovery(self, rng):
        sc = make_scene(rng, n_points=100, n_cams=2, noise_px=0.0)
        T1 = SE3(jnp.asarray(sc["R"][0]), jnp.asarray(sc["t"][0]))
        T2 = SE3(jnp.asarray(sc["R"][1]), jnp.asarray(sc["t"][1]))
        # normalized coords from exact projections
        pc1 = np.einsum("ij,pj->pi", sc["R"][0], sc["points"]) + sc["t"][0]
        pc2 = np.einsum("ij,pj->pi", sc["R"][1], sc["points"]) + sc["t"][1]
        xn1 = jnp.asarray(pc1[:, :2] / pc1[:, 2:3], jnp.float32)
        xn2 = jnp.asarray(pc2[:, :2] / pc2[:, 2:3], jnp.float32)
        X, ok = triangulate.triangulate(T1, xn1, T2, xn2)
        m = np.asarray(ok) & sc["vis"][0] & sc["vis"][1]
        assert m.sum() > 50
        np.testing.assert_allclose(np.asarray(X)[m], sc["points"][m], atol=2e-2)

    def test_parallax(self, rng):
        sc = make_scene(rng, n_points=10, n_cams=2, noise_px=0.0)
        T1 = SE3(jnp.asarray(sc["R"][0]), jnp.asarray(sc["t"][0]))
        T2 = SE3(jnp.asarray(sc["R"][1]), jnp.asarray(sc["t"][1]))
        cosp = np.asarray(triangulate.parallax_cos(T1, T2, jnp.asarray(sc["points"])))
        assert (cosp < 0.9999).all()  # cameras are far apart -> real parallax


class TestPoseOpt:
    def test_converges_from_perturbation(self, rng):
        sc = make_scene(rng, n_cams=1, noise_px=0.3)
        vis = sc["vis"][0]
        dx = np.concatenate([rng.normal(0, 0.05, 3), rng.normal(0, 0.02, 3)])
        T0 = se3.exp(jnp.asarray(dx, jnp.float32)).compose(
            SE3(jnp.asarray(sc["R"][0]), jnp.asarray(sc["t"][0])))
        res = pose_opt.pose_optimization(
            T0, jnp.asarray(sc["points"]), jnp.asarray(sc["uv"][0]),
            jnp.ones(len(vis), jnp.float32), jnp.asarray(vis), CAM)
        err_t = np.linalg.norm(np.asarray(res.T_cw.t) - sc["t"][0])
        err_R = np.asarray(so3.log(
            res.T_cw.R @ jnp.asarray(sc["R"][0]).T))
        assert err_t < 5e-3
        assert np.linalg.norm(err_R) < 1e-3
        assert int(res.n_inliers) > 0.9 * vis.sum()

    def test_rejects_outliers(self, rng):
        sc = make_scene(rng, n_cams=1, noise_px=0.3)
        vis = sc["vis"][0]
        uv = sc["uv"][0].copy()
        n_out = 60
        out_idx = np.where(vis)[0][:n_out]
        uv[out_idx] += rng.uniform(30, 120, size=(n_out, 2))
        dx = np.concatenate([rng.normal(0, 0.03, 3), rng.normal(0, 0.01, 3)])
        T0 = se3.exp(jnp.asarray(dx, jnp.float32)).compose(
            SE3(jnp.asarray(sc["R"][0]), jnp.asarray(sc["t"][0])))
        res = pose_opt.pose_optimization(
            T0, jnp.asarray(sc["points"]), jnp.asarray(uv),
            jnp.ones(len(vis), jnp.float32), jnp.asarray(vis), CAM)
        inl = np.asarray(res.inlier)
        assert inl[out_idx].sum() < 5          # outliers gated
        err_t = np.linalg.norm(np.asarray(res.T_cw.t) - sc["t"][0])
        assert err_t < 1e-2


def scene_to_ba_problem(sc, pose_noise=0.02, point_noise=0.05, rng=None):
    C, P = sc["R"].shape[0], sc["points"].shape[0]
    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(C):
        for p in np.where(sc["vis"][c])[0]:
            obs_cam.append(c)
            obs_pt.append(p)
            obs_uv.append(sc["uv"][c, p])
    O = len(obs_cam)
    # perturb
    dR = np.stack([np.asarray(so3.exp(jnp.asarray(
        rng.normal(0, pose_noise, 3), jnp.float32))) for _ in range(C)])
    R0 = np.einsum("cij,cjk->cik", dR, sc["R"]).astype(np.float32)
    t0 = sc["t"] + rng.normal(0, pose_noise, (C, 3)).astype(np.float32)
    # keep first two cameras fixed at ground truth (gauge)
    fixed = np.zeros(C, bool)
    fixed[:2] = True
    R0[:2] = sc["R"][:2]
    t0[:2] = sc["t"][:2]
    pts0 = sc["points"] + rng.normal(0, point_noise, (P, 3)).astype(np.float32)
    return ba.BAProblem(
        kf_R=jnp.asarray(R0), kf_t=jnp.asarray(t0), points=jnp.asarray(pts0),
        obs_cam=jnp.asarray(obs_cam, jnp.int32), obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_w=jnp.ones(O, jnp.float32), obs_valid=jnp.ones(O, bool),
        fixed_cam=jnp.asarray(fixed), point_valid=jnp.ones(P, bool))


class TestBA:
    def test_converges(self, rng):
        sc = make_scene(rng, n_points=200, n_cams=6, noise_px=0.3)
        prob = scene_to_ba_problem(sc, rng=rng)
        res = ba.ba_solve(prob, CAM, iters=12)
        # pose error after BA
        err_t = np.linalg.norm(np.asarray(res.kf_t) - sc["t"], axis=-1)
        assert err_t[2:].max() < 0.02, err_t
        # fixed cameras untouched
        np.testing.assert_allclose(np.asarray(res.kf_R)[:2], sc["R"][:2], atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.kf_t)[:2], sc["t"][:2], atol=1e-6)
        # points improved
        perr = np.linalg.norm(np.asarray(res.points) - sc["points"], axis=-1)
        assert np.median(perr) < 0.02
        assert np.asarray(res.obs_inlier).mean() > 0.9

    def test_prebuilt_table_matches_internal_build(self, rng):
        """ba.prepare_table + ba_solve(table=...) must be numerically
        identical to the internal build (the GBA chunk loops reuse one
        table across solves; the math may not drift)."""
        sc = make_scene(rng, n_points=200, n_cams=6, noise_px=0.3)
        prob = scene_to_ba_problem(sc, rng=rng)
        res_a = ba.ba_solve(prob, CAM, iters=6, table_depth=8)
        TL = ba.prepare_table(prob, table_depth=8)
        res_b = ba.ba_solve(prob, CAM, iters=6, table_depth=8, table=TL)
        np.testing.assert_array_equal(np.asarray(res_a.kf_t),
                                      np.asarray(res_b.kf_t))
        np.testing.assert_array_equal(np.asarray(res_a.points),
                                      np.asarray(res_b.points))
        np.testing.assert_array_equal(np.asarray(res_a.obs_inlier),
                                      np.asarray(res_b.obs_inlier))

    def test_robust_to_outlier_observations(self, rng):
        sc = make_scene(rng, n_points=150, n_cams=5, noise_px=0.3)
        prob = scene_to_ba_problem(sc, rng=rng)
        uv = np.array(prob.obs_uv)
        n_out = len(uv) // 10
        uv[:n_out] += rng.uniform(40, 100, size=(n_out, 2)).astype(np.float32)
        prob = prob._replace(obs_uv=jnp.asarray(uv))
        res = ba.ba_solve(prob, CAM, iters=12)
        err_t = np.linalg.norm(np.asarray(res.kf_t) - sc["t"], axis=-1)
        assert err_t[2:].max() < 0.05
        inl = np.asarray(res.obs_inlier)
        assert inl[:n_out].mean() < 0.2  # corrupted obs flagged

    def test_cost_decreases(self, rng):
        sc = make_scene(rng, n_points=120, n_cams=4, noise_px=0.5)
        prob = scene_to_ba_problem(sc, pose_noise=0.05, point_noise=0.1, rng=rng)
        res1 = ba.ba_solve(prob, CAM, iters=1)
        res8 = ba.ba_solve(prob, CAM, iters=10)
        assert float(res8.cost) <= float(res1.cost)


class TestSchurPCG:
    """Matrix-free Schur-PCG global BA (optim/schur_pcg.py) — the
    Atlas-scale path of Optimizer::GlobalBundleAdjustemnt."""

    def test_matvec_matches_dense_schur(self, rng):
        from orb_slam3_detailed_comments_tpu.optim import reproj, schur_pcg

        sc = make_scene(rng, n_points=24, n_cams=4, noise_px=0.2)
        prob = scene_to_ba_problem(sc, rng=rng)
        C, P = 4, 24
        r, Jc, Jp, depth_ok = ba._residuals(prob, CAM)
        ok = prob.obs_valid & depth_ok
        chi2 = jnp.sum(r * r, axis=-1) * prob.obs_w
        w = prob.obs_w * reproj.huber_weight(chi2, reproj.CHI2_MONO) * ok
        lam = jnp.float32(1e-3)
        U, b_c, V, b_p = schur_pcg._normal_blocks(
            r, Jc, Jp, w, prob.obs_cam, prob.obs_pt, C, P)
        Ud, Vd = schur_pcg._damped_blocks(U, V, lam)
        Vinv = ba._inv3x3(Vd)

        # dense S assembled explicitly from per-obs blocks
        Un, Wn = np.asarray(Ud), np.zeros((P, C, 6, 3), np.float32)
        JcW = np.asarray(Jc * w[:, None, None])
        for o in range(prob.obs_cam.shape[0]):
            c, p = int(prob.obs_cam[o]), int(prob.obs_pt[o])
            Wn[p, c] += JcW[o].T @ np.asarray(Jp)[o]
        Sd = np.zeros((C, 6, C, 6), np.float32)
        Vn = np.asarray(Vinv)
        for p in range(P):
            for ci in range(C):
                for cj in range(C):
                    Sd[ci, :, cj, :] -= Wn[p, ci] @ Vn[p] @ Wn[p, cj].T
        for c in range(C):
            Sd[c, :, c, :] += Un[c]

        free = (~prob.fixed_cam).astype(jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (C, 6)), jnp.float32)
        got = np.asarray(schur_pcg._schur_matvec(
            x, Ud, Vinv, Jc, Jp, w, prob.obs_cam, prob.obs_pt, free))
        xf = np.asarray(x) * np.asarray(free)[:, None]
        want = np.einsum("icjd,jd->ic", Sd, xf)
        want = want * np.asarray(free)[:, None] \
            + np.asarray(x) * (1 - np.asarray(free)[:, None])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)

    def test_converges_like_dense(self, rng):
        from orb_slam3_detailed_comments_tpu.optim import schur_pcg

        sc = make_scene(rng, n_points=200, n_cams=6, noise_px=0.3)
        prob = scene_to_ba_problem(sc, rng=rng)
        res = schur_pcg.ba_solve_pcg(prob, CAM, iters=12)
        err_t = np.linalg.norm(np.asarray(res.kf_t) - sc["t"], axis=-1)
        assert err_t[2:].max() < 0.02, err_t
        np.testing.assert_allclose(np.asarray(res.kf_t)[:2], sc["t"][:2],
                                   atol=1e-6)  # fixed gauge untouched
        perr = np.linalg.norm(np.asarray(res.points) - sc["points"], axis=-1)
        assert np.median(perr) < 0.02
        assert np.asarray(res.obs_inlier).mean() > 0.9

    def test_ba_solve_routes_large_c(self, rng):
        sc = make_scene(rng, n_points=160, n_cams=140, noise_px=0.3)
        prob = scene_to_ba_problem(sc, rng=rng)
        assert prob.kf_R.shape[0] > ba._PCG_C_MIN
        res = ba.ba_solve(prob, CAM, iters=8)
        err_t = np.linalg.norm(np.asarray(res.kf_t) - sc["t"], axis=-1)
        assert np.median(err_t[2:]) < 0.03, np.median(err_t[2:])
