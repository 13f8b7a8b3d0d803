"""Loop-closing integration test: camera circles inside a textured box and
revisits the start; the system must keep tracking all the way around,
detect the loop via place recognition, and keep/restore global consistency.
Also tests relocalization after a tracking blackout."""
import numpy as np
import pytest

from orb_slam3_detailed_comments_tpu.models import cameras
from orb_slam3_detailed_comments_tpu.pipeline.system import System, MONOCULAR
from orb_slam3_detailed_comments_tpu.utils import evaluate_ate, synth_render

CAM = cameras.pinhole(fx=400.0, fy=400.0, cx=376.0, cy=240.0, width=752, height=480)


@pytest.fixture(scope="module")
def loop_sequence():
    rng = np.random.default_rng(11)
    walls = synth_render.box_world(rng)
    n = 140
    R, t = synth_render.loop_trajectory(n, radius=3.0, closes=1.05)
    frames = [synth_render.render_frame(CAM, walls, R[i], t[i]) for i in range(n)]
    return frames, R, t


def test_loop_detected_and_trajectory_consistent(loop_sequence):
    frames, R_gt, t_gt = loop_sequence
    slam = System(CAM, MONOCULAR, enable_loop_closing=True)
    ts = np.arange(len(frames)) * 0.05
    n_ok = 0
    for i, img in enumerate(frames):
        if slam.track_monocular(img, float(ts[i])) is not None:
            n_ok += 1
    assert n_ok > 0.7 * len(frames), f"tracked {n_ok}/{len(frames)}"

    # place recognition must have fired at least once near the revisit
    assert slam.loop_closer is not None
    assert slam.loop_closer.n_loops_closed >= 1

    rows = slam.trajectory_tum()
    est_ts = np.array([r[0] for r in rows])
    est_xyz = np.array([r[1:4] for r in rows])
    gt_xyz = synth_render.camera_centers(R_gt, t_gt)
    rmse, n, scale = evaluate_ate.ate_rmse(ts, gt_xyz, est_ts, est_xyz)
    # loop radius 3 m, full circle ~19 m path: ATE must stay small after closure
    assert rmse < 0.20, f"ATE {rmse:.3f} m over {n} poses (scale {scale:.3f})"
    # the loop correction + GBA + fuse path must leave the map graph
    # consistent (live points observed, links to live points, refs alive)
    assert slam.check_map_consistency() == []


def test_relocalization_after_blackout():
    rng = np.random.default_rng(5)
    planes = synth_render.default_world(rng)
    n = 46
    R, t = synth_render.orbit_trajectory(n)
    frames = [synth_render.render_frame(CAM, planes, R[i], t[i]) for i in range(n)]
    # periodic KFs every 4 frames so the map is rich enough (>5 KFs) to
    # enter RECENTLY_LOST instead of resetting (reference: a map with few
    # keyframes is reset on loss, Tracking.cc:2248)
    from orb_slam3_detailed_comments_tpu.pipeline.tracking import TrackingConfig
    slam = System(CAM, MONOCULAR, enable_loop_closing=True,
                  tracking_cfg=TrackingConfig(max_frames=4))
    ts = np.arange(n) * 0.05
    # phase 1: track normally
    for i in range(30):
        slam.track_monocular(frames[i], float(ts[i]))
    assert slam.tracker.state == 2  # OK
    assert slam.map.n_kf > 5
    # phase 2: blackout (featureless frames) -> lost
    blank = np.full_like(frames[0], 128.0)
    for i in range(30, 36):
        slam.track_monocular(blank, float(ts[i]))
    assert slam.tracker.state != 2
    # phase 3: return to a previously seen view -> must recover (via
    # reference-KF matching or BoW relocalization, whichever fires first)
    recovered = False
    for i in range(26, 30):
        if slam.track_monocular(frames[i], float(ts[i] + 0.6)) is not None:
            recovered = True
            break
    assert recovered

    # and the BoW->PnP relocalizer must independently produce a valid pose
    # for an old view (reference: Tracking::Relocalization)
    from orb_slam3_detailed_comments_tpu.pipeline import kernels
    import jax.numpy as jnp
    prep = kernels.prepare_frame(jnp.asarray(frames[20], jnp.float32),
                                 CAM, slam.tracker.orb_cfg)
    out = slam._relocalize(prep)
    assert out is not None
    R, t, match_pt, ref = out
    assert (match_pt >= 0).sum() >= 15
    assert np.isfinite(R).all() and np.isfinite(t).all()


class TestAsyncGlobalBA:
    """The racing global-BA thread (reference: RunGlobalBundleAdjustment +
    mbStopGBA): snapshot solve off the map lock, propagation of the result
    to keyframes/points created during the solve, and the abort protocol."""

    def _scene_map(self, rng, n_cams=4):
        from orb_slam3_detailed_comments_tpu.mapping.mapstore import (
            MapConfig, MapStore)
        from tests import synthetic
        sc = synthetic.make_scene(rng, n_points=120, n_cams=n_cams,
                                  noise_px=0.0)
        m = MapStore(MapConfig(max_kf=16, max_pt=512, n_feat=128))
        # points must be live before keyframes link to them: add_keyframe
        # drops links to dead points
        m.pt_xyz[:120] = sc["points"]
        m.pt_valid[:120] = True
        m.pt_ref_kf[:120] = 0
        for c in range(n_cams):
            vis = np.where(sc["vis"][c])[0][:128]
            fp = np.full(128, -1, np.int32)
            fp[: len(vis)] = vis
            xy = np.zeros((128, 2), np.float32)
            xy[: len(vis)] = sc["uv"][c][vis]
            val = np.zeros(128, bool)
            val[: len(vis)] = True
            m.add_keyframe(sc["R"][c], sc["t"][c], 0.1 * c, c, xy,
                           np.zeros((128, 2), np.float32),
                           np.zeros(128, np.int32), np.zeros(128, np.float32),
                           np.zeros((128, 8), np.uint32), val, fp)
        return m, sc

    def test_propagation_is_exact_for_rigid_corrections(self):
        """If GBA moves the snapshot by a rigid transform D, keyframes and
        points born during the solve must come out transformed by exactly
        the same D (relative geometry preserved)."""
        from orb_slam3_detailed_comments_tpu.optim.ba import BAResult
        from orb_slam3_detailed_comments_tpu.pipeline.local_mapping import (
            build_ba_problem)
        from orb_slam3_detailed_comments_tpu.pipeline.loop_closing import (
            apply_gba_with_propagation)
        from tests import synthetic
        rng = np.random.default_rng(3)
        m, sc = self._scene_map(rng)
        prob, meta = build_ba_problem(m, [0, 1, 2, 3], fixed=[0])

        # "during the solve": one more keyframe and one more point appear
        R4 = sc["R"][3].copy()
        t4 = sc["t"][3] + np.array([0.2, 0.0, 0.1], np.float32)
        k4 = m.add_keyframe(R4, t4, 0.4, 4,
                            np.zeros((128, 2), np.float32),
                            np.zeros((128, 2), np.float32),
                            np.zeros(128, np.int32), np.zeros(128, np.float32),
                            np.zeros((128, 8), np.uint32),
                            np.zeros(128, bool), np.full(128, -1, np.int32))
        x_new = np.array([[0.5, -0.3, 1.0]], np.float32)
        pid_new = m.add_points(x_new, np.zeros((1, 8), np.uint32), ref_kf=k4)[0]

        # result = snapshot moved by rigid D (world x -> Rd x + td)
        Rd = synthetic.rotvec_to_R([0.02, -0.05, 0.03]).astype(np.float32)
        td = np.array([0.3, -0.1, 0.2], np.float32)
        C = np.asarray(prob.kf_R).shape[0]
        n_real, pt_ids = meta["n_real"], np.asarray(meta["pt_ids"])
        res_R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
        res_t = np.zeros((C, 3), np.float32)
        for i in range(n_real):
            c = meta["cams"][i]
            res_R[i] = m.kf_R[c] @ Rd.T
            res_t[i] = m.kf_t[c] - res_R[i] @ td
        res_pts = np.zeros_like(np.asarray(prob.points))
        res_pts[: len(pt_ids)] = m.pt_xyz[pt_ids] @ Rd.T + td
        res = BAResult(kf_R=res_R, kf_t=res_t, points=res_pts,
                       obs_inlier=np.ones(np.asarray(prob.obs_cam).shape[0],
                                          bool),
                       cost=np.float32(0.0))
        apply_gba_with_propagation(m, meta, res)

        # the late keyframe must carry the same correction
        np.testing.assert_allclose(m.kf_R[k4], R4 @ Rd.T, atol=1e-5)
        np.testing.assert_allclose(
            m.kf_t[k4], t4 - (R4 @ Rd.T) @ td, atol=1e-5)
        # the late point rides its reference keyframe: x -> Rd x + td
        np.testing.assert_allclose(m.pt_xyz[pid_new],
                                   (x_new @ Rd.T + td)[0], atol=1e-5)
        # snapshot points take the optimized positions verbatim
        np.testing.assert_allclose(m.pt_xyz[pt_ids[0]],
                                   res_pts[0], atol=1e-6)

    @pytest.mark.parametrize("dist", [False, True])
    def test_async_solve_applies_and_abort_discards(self, dist):
        """A launched GBA must improve a noise-perturbed map and bump
        n_gba_runs; an aborted one must leave the map untouched. dist=True
        shards the solve over the 8-device virtual mesh (psum Schur)."""
        import threading
        from orb_slam3_detailed_comments_tpu.pipeline.loop_closing import (
            LoopCloser, LoopClosingConfig)
        from tests import synthetic
        rng = np.random.default_rng(7)
        m, sc = self._scene_map(rng)
        m.kf_t[1:4] += rng.normal(0, 0.05, (3, 3)).astype(np.float32)
        m.pt_xyz[:120] += rng.normal(0, 0.02, (120, 3)).astype(np.float32)
        err0 = float(np.abs(m.kf_t[1:4] - sc["t"][1:4]).max())

        lc = LoopCloser(m, synthetic.CAM, kfdb=None,
                        cfg=LoopClosingConfig(async_gba=True, gba_iters=6,
                                              gba_chunk=3, dist_gba=dist))
        lc.map_lock = threading.RLock()
        lc._launch_global_ba([0, 1, 2, 3], anchor=[0])
        lc.wait_gba()
        assert lc.n_gba_runs == 1 and lc.n_gba_aborted == 0
        err1 = float(np.abs(m.kf_t[1:4] - sc["t"][1:4]).max())
        assert err1 < 0.5 * err0, (err0, err1)

        # abort: result discarded, map untouched
        snap_t = m.kf_t.copy()
        v0 = m.version
        lc.cfg.gba_iters = 400   # long enough that abort lands mid-solve
        lc.cfg.gba_chunk = 1
        lc._launch_global_ba([0, 1, 2, 3], anchor=[0])
        lc.abort_gba()
        assert lc.n_gba_aborted >= 1
        assert m.version == v0
        np.testing.assert_array_equal(m.kf_t, snap_t)


def test_async_loop_closure_with_racing_gba(loop_sequence):
    """Full async mode around the loop: mapping worker + a global-BA thread
    racing tracking (reference: the three-thread layout of System.cc:283).
    The closure must land, the GBA must run (or be superseded), and the
    trajectory must stay consistent after shutdown drains everything."""
    frames, R_gt, t_gt = loop_sequence
    slam = System(CAM, MONOCULAR, enable_loop_closing=True,
                  async_mapping=True)
    ts = np.arange(len(frames)) * 0.05
    n_ok = 0
    for i, img in enumerate(frames):
        if slam.track_monocular(img, float(ts[i])) is not None:
            n_ok += 1
    slam.shutdown()
    assert n_ok > 0.7 * len(frames), f"tracked {n_ok}/{len(frames)}"
    assert slam.loop_closer is not None
    assert slam.loop_closer.n_loops_closed >= 1
    assert (slam.loop_closer.n_gba_runs
            + slam.loop_closer.n_gba_aborted) >= 1

    rows = slam.trajectory_tum()
    est_ts = np.array([r[0] for r in rows])
    est_xyz = np.array([r[1:4] for r in rows])
    gt_xyz = synth_render.camera_centers(R_gt, t_gt)
    rmse, n, scale = evaluate_ate.ate_rmse(ts, gt_xyz, est_ts, est_xyz)
    # bound is looser than the sync test's: where the racing GBA lands
    # relative to tracking is scheduler-dependent (a late-landing or
    # superseded GBA leaves pose-graph-only correction on some frames)
    assert rmse < 0.30, f"ATE {rmse:.3f} m over {n} poses (scale {scale:.3f})"


class TestInertialLoopGate:
    """The gravity-direction sanity gate on inertial loop corrections
    (reference: LoopClosing.cc:270-305): reject roll/pitch > 0.008 rad or
    yaw > 0.349 rad; after VIBA2 force the correction to yaw-only."""

    def _setup(self, rng, rolled: bool):
        import jax.numpy as jnp
        from orb_slam3_detailed_comments_tpu.lie import Sim3, so3
        from orb_slam3_detailed_comments_tpu.pipeline.loop_closing import (
            LoopCloser, LoopClosingConfig)
        from tests import synthetic
        helper = TestAsyncGlobalBA()
        m, sc = helper._scene_map(rng, n_cams=6)
        m.imu_initialized = True
        lc = LoopCloser(m, synthetic.CAM, None,
                        LoopClosingConfig(run_global_ba=False))
        k, c = 5, 0
        # desired world correction: pure yaw (good) or rolled (bad)
        phi = np.array([0.25 if rolled else 0.0, 0.0, 0.1], np.float32)
        R_ww = so3.exp(jnp.asarray(phi))
        S_ww = Sim3(R_ww, jnp.asarray([0.02, 0.0, 0.01]), jnp.asarray(1.0))
        T_wc_old = Sim3(jnp.asarray(m.kf_R[k]), jnp.asarray(m.kf_t[k]),
                        jnp.asarray(1.0)).inverse()
        S_kw_corr = T_wc_old.inverse().compose(S_ww)
        S_cw_inv = Sim3(jnp.asarray(m.kf_R[c]), jnp.asarray(m.kf_t[c]),
                        jnp.asarray(1.0)).inverse()
        S_kc = S_kw_corr.compose(S_cw_inv)
        return m, lc, k, c, S_kc

    def test_rolled_correction_rejected(self, rng):
        m, lc, k, c, S_kc = self._setup(rng, rolled=True)
        assert lc._correct_loop(k, c, S_kc) is False
        assert lc.n_loops_rejected_gravity == 1

    def test_yaw_correction_accepted(self, rng):
        m, lc, k, c, S_kc = self._setup(rng, rolled=False)
        assert lc._correct_loop(k, c, S_kc) is True
        assert lc.n_loops_rejected_gravity == 0

    def test_viba2_forces_yaw_only(self, rng):
        """After the second inertial BA the accepted correction must be
        projected to yaw-only (roll/pitch zero), reference
        LoopClosing.cc:286-296 — and must not crash on the jax-array
        buffer (read-only) path."""
        import jax.numpy as jnp
        from orb_slam3_detailed_comments_tpu.lie import so3
        m, lc, k, c, S_kc = self._setup(rng, rolled=False)
        m.imu_ba2 = True
        R_before = m.kf_R.copy()
        assert lc._correct_loop(k, c, S_kc) is True
        # the implied world correction actually applied to the map (compare
        # a far-from-k keyframe before/after: pure-yaw world corrections
        # keep gravity-aligned z rows intact up to the pose-graph solve)
        assert np.isfinite(m.kf_R[list(m.kf_ids())]).all()
        assert (m.kf_R != R_before).any()   # a correction was applied


class TestPerCandidateConsistency:
    """The consistency counter is per-REGION (reference mnLoopNumCoincidences,
    LoopClosing.cc:383-760): a closure needs `consistency_needed` successive
    geometric verifications of the SAME covisible region. Detections of
    different places must restart the count — on self-similar scenes three
    detections of three different walls must never trip a closure."""

    def _closer(self):
        import jax.numpy as jnp
        from orb_slam3_detailed_comments_tpu.lie import Sim3
        from orb_slam3_detailed_comments_tpu.mapping.mapstore import (
            MapConfig, MapStore)
        from orb_slam3_detailed_comments_tpu.pipeline import (
            loop_closing as lc_mod)
        m = MapStore(MapConfig(max_kf=32, max_pt=256, n_feat=64))
        # 12 keyframes with no shared observations: every candidate's
        # covisible region is just itself, so regions are pairwise disjoint
        for c in range(12):
            m.add_keyframe(np.eye(3, dtype=np.float32),
                           np.array([0.1 * c, 0, 0], np.float32), 0.1 * c, c,
                           np.zeros((64, 2), np.float32),
                           np.zeros((64, 2), np.float32),
                           np.zeros(64, np.int32), np.zeros(64, np.float32),
                           np.zeros((64, 8), np.uint32), np.zeros(64, bool),
                           np.full(64, -1, np.int32))

        class _NullDB:
            def add(self, *a, **k):
                pass

        closer = lc_mod.LoopCloser(m, CAM, _NullDB())
        S_id = Sim3(jnp.eye(3), jnp.zeros(3), jnp.asarray(1.0))
        calls = []
        closer._correct_loop = lambda k, c, S: calls.append((k, c)) or True
        return closer, lc_mod, S_id, calls

    def test_three_different_places_never_close(self, monkeypatch):
        closer, lc_mod, S_id, calls = self._closer()
        monkeypatch.setattr(lc_mod, "count_projection_matches",
                            lambda *a, **k: 1000)
        seq = iter(range(6))  # a different region every keyframe
        closer._detect = lambda k: (next(seq), S_id)
        closer._refine_from_last_kf = lambda k: None  # propagation never holds
        for k in range(6, 12):
            assert closer.process_keyframe(k) is False
        assert calls == []
        assert closer.n_loops_closed == 0

    def test_same_region_verified_thrice_closes(self, monkeypatch):
        closer, lc_mod, S_id, calls = self._closer()
        monkeypatch.setattr(lc_mod, "count_projection_matches",
                            lambda *a, **k: 1000)
        closer._detect = lambda k: (0, S_id)
        closer._refine_from_last_kf = lambda k: (0, S_id)
        out = [closer.process_keyframe(k) for k in (6, 7, 8)]
        # counts 1 (BoW detect), 2, 3 (propagation) -> closes on the third
        assert out == [False, False, True]
        assert len(calls) == 1 and closer.n_loops_closed == 1

    def test_one_propagation_miss_survives(self, monkeypatch):
        """mnLoopNumNotFoundLoop: the chain tolerates max_not_found-1
        consecutive propagation misses without restarting the count."""
        closer, lc_mod, S_id, calls = self._closer()
        monkeypatch.setattr(lc_mod, "count_projection_matches",
                            lambda *a, **k: 1000)
        hits = iter([None, (0, S_id), (0, S_id)])  # miss at the 2nd KF
        closer._detect = lambda k: (0, S_id)
        first = [True]

        def refine(k):
            return next(hits)

        closer._refine_from_last_kf = refine
        # k=6 seeds via _detect (count 1); k=7 propagation misses AND
        # _detect re-finds the same region (count 2); k=8, k=9 propagate
        assert closer.process_keyframe(6) is False
        assert closer.process_keyframe(7) is False
        assert closer.process_keyframe(8) is True
        assert closer.n_loops_closed == 1

    def test_final_projection_gate_rejects(self, monkeypatch):
        """nProjOptMatches (LoopClosing.cc:752): a fully consistent chain
        still must explain >=80 guided matches at the refined Sim3."""
        closer, lc_mod, S_id, calls = self._closer()
        monkeypatch.setattr(lc_mod, "count_projection_matches",
                            lambda *a, **k: 10)   # below the 80 gate
        closer._detect = lambda k: (0, S_id)
        closer._refine_from_last_kf = lambda k: (0, S_id)
        for k in (6, 7, 8):
            assert closer.process_keyframe(k) is False
        assert calls == []
        assert closer.n_loops_rejected_projgate == 1
