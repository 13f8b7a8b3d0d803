"""End-to-end monocular-inertial SLAM on a rendered synthetic sequence with
exactly consistent IMU: initialization, IMU init (gravity + metric scale +
bias), inertial tracking and local inertial BA, final metric ATE.

(reference behavior: Tracking + LocalMapping::InitializeIMU pipeline for the
IMU_MONOCULAR sensor, SURVEY.md §2.1/§3.2)"""
import numpy as np
import pytest

from orb_slam3_detailed_comments_tpu.models import cameras
from orb_slam3_detailed_comments_tpu.pipeline.system import System, IMU_MONOCULAR
from orb_slam3_detailed_comments_tpu.utils import evaluate_ate, synth_render

CAM = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                      width=752, height=480)
TRUE_BG = np.array([0.003, -0.002, 0.004], np.float32)


@pytest.fixture(scope="module")
def sequence():
    rng = np.random.default_rng(11)
    planes = synth_render.default_world(rng)
    n = 60  # 6 s at 10 fps, IMU at 200 Hz
    traj = synth_render.inertial_trajectory(n, true_bg=TRUE_BG)
    frames = [synth_render.render_frame(CAM, planes, traj["R_cw"][i],
                                        traj["t_cw"][i]) for i in range(n)]
    return frames, traj


def test_mono_inertial_end_to_end(sequence):
    frames, traj = sequence
    slam = System(CAM, IMU_MONOCULAR)
    poses = []
    for i, img in enumerate(frames):
        T = slam.track_monocular(img, float(traj["ts"][i]),
                                 imu=traj["windows"][i])
        poses.append(T)

    tracked = [i for i, p in enumerate(poses) if p is not None]
    assert len(tracked) > 0.7 * len(frames), f"tracked {len(tracked)}/{len(frames)}"
    assert slam.map.imu_initialized, "IMU initialization never ran"

    # estimated gyro bias should match the injected one
    chain = slam.map.temporal_chain()
    bg_est = slam.map.kf_bg[chain[-1]]
    assert np.abs(bg_est - TRUE_BG).max() < 3e-3, bg_est

    rows = slam.trajectory_tum()
    est_ts = np.array([r[0] for r in rows])
    est_xyz = np.array([r[1:4] for r in rows])
    rmse, n, scale = evaluate_ate.ate_rmse(
        traj["ts"], traj["centers"], est_ts, est_xyz)
    assert n > 0.6 * len(frames)
    # IMU makes the map metric: Horn scale must be near 1 (mono-visual alone
    # is scale-free; the reference's headline IMU-init claim is <5% scale
    # error in 2 s — Changelog.md:44)
    assert abs(scale - 1.0) < 0.12, f"metric scale off: {scale:.3f}"
    assert rmse < 0.06, f"ATE {rmse:.4f} m over {n} poses (scale {scale:.3f})"


def test_gravity_alignment(sequence):
    """After IMU init the map world must be gravity-aligned: the Horn
    rotation between estimate and ground truth maps map -z to the true
    gravity direction (reference: ApplyScaledRotation gravity alignment)."""
    frames, traj = sequence
    slam = System(CAM, IMU_MONOCULAR)
    for i, img in enumerate(frames):
        slam.track_monocular(img, float(traj["ts"][i]), imu=traj["windows"][i])
    if not slam.map.imu_initialized:
        pytest.skip("imu not initialized")
    rows = slam.trajectory_tum()
    est_ts = np.array([r[0] for r in rows])
    est_xyz = np.array([r[1:4] for r in rows])
    pairs = evaluate_ate.associate(est_ts, traj["ts"])
    s, R, t, _ = evaluate_ate.align_horn(est_xyz[pairs[:, 0]],
                                         traj["centers"][pairs[:, 1]])
    # gravity in map world is (0,0,-9.81); in the true world it is +y
    g_map = np.array([0.0, 0.0, -1.0])
    g_true = traj["gravity"] / np.linalg.norm(traj["gravity"])
    cos = float((R @ g_map) @ g_true)
    assert cos > 0.99, f"gravity misaligned: cos={cos:.4f}"


def test_mono_inertial_with_body_camera_extrinsic():
    """Non-identity Tbc (reference: IMU.T_b_c1 in EuRoC yaml — the camera is
    rotated/offset from the IMU body): the pipeline must recover metric
    scale and track with the extrinsic-aware inertial math."""
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.imu.preintegration import ImuCalib
    from orb_slam3_detailed_comments_tpu.lie import so3
    from orb_slam3_detailed_comments_tpu.pipeline import inertial as inertial_mod

    rng = np.random.default_rng(23)
    planes = synth_render.default_world(rng)
    n = 55
    traj = synth_render.inertial_trajectory(n, true_bg=TRUE_BG)
    # traj poses are the BODY; place the camera at Tbc off the body
    R_bc = np.asarray(so3.exp(jnp.asarray([0.10, -0.20, 0.15], jnp.float32)))
    t_bc = np.array([0.05, -0.02, 0.03], np.float32)
    frames = []
    R_cams, t_cams = [], []
    for i in range(n):
        R_bw = traj["R_cw"][i]           # generator: world->body
        p_wb = traj["centers"][i]
        R_cw, t_cw = inertial_mod.camera_from_body(R_bw.T, p_wb, R_bc, t_bc)
        R_cams.append(R_cw)
        t_cams.append(t_cw)
        frames.append(synth_render.render_frame(CAM, planes, R_cw, t_cw))

    calib = ImuCalib(R_bc=jnp.asarray(R_bc), t_bc=jnp.asarray(t_bc))
    slam = System(CAM, IMU_MONOCULAR, imu_calib=calib,
                  enable_loop_closing=False)
    n_ok = 0
    for i, img in enumerate(frames):
        if slam.track_monocular(img, float(traj["ts"][i]),
                                imu=traj["windows"][i]) is not None:
            n_ok += 1
    assert n_ok > 0.7 * n, f"tracked {n_ok}/{n}"
    assert slam.map.imu_initialized

    rows = slam.trajectory_tum()
    est_ts = np.array([r[0] for r in rows])
    est_xyz = np.array([r[1:4] for r in rows])
    cam_centers = np.array([-np.asarray(R).T @ np.asarray(t)
                            for R, t in zip(R_cams, t_cams)])
    rmse, npair, scale = evaluate_ate.ate_rmse(
        traj["ts"], cam_centers, est_ts, est_xyz)
    assert npair > 0.6 * n
    assert abs(scale - 1.0) < 0.12, f"metric scale off with Tbc: {scale:.3f}"
    assert rmse < 0.08, f"ATE {rmse:.4f} m (scale {scale:.3f})"


class TestInertialKeyFrameCulling:
    """The inertial spacing rule in KeyFrameCulling: culling a keyframe
    merges its preintegration window into its successor's; the merged gap
    must stay under 0.5 s before full inertial optimization (3 s after)
    (reference: LocalMapping::KeyFrameCulling, LocalMapping.cc:1230-1260)."""

    def _redundant_map(self, rng, dt):
        from orb_slam3_detailed_comments_tpu.mapping.mapstore import (
            MapConfig, MapStore)
        n_kf, n_pt = 7, 30
        m = MapStore(MapConfig(max_kf=16, max_pt=256, n_feat=64))
        m.pt_xyz[:n_pt] = rng.normal(0, 1, (n_pt, 3)) + [0, 0, 5]
        m.pt_valid[:n_pt] = True
        m.pt_ref_kf[:n_pt] = 0
        for k in range(n_kf):
            fp = np.full(64, -1, np.int32)
            fp[:n_pt] = np.arange(n_pt)
            val = np.zeros(64, bool)
            val[:n_pt] = True
            m.add_keyframe(
                np.eye(3, dtype=np.float32),
                np.array([0.1 * k, 0, 0], np.float32), dt * k, k,
                rng.normal(300, 50, (64, 2)).astype(np.float32),
                np.zeros((64, 2), np.float32), np.zeros(64, np.int32),
                np.zeros(64, np.float32),
                rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32), val, fp)
            if k > 0:
                m.kf_prev[k] = k - 1
                m.kf_pre_dT[k] = dt
        m.update_point_stats(np.arange(n_pt))
        return m

    def _cull(self, m):
        from orb_slam3_detailed_comments_tpu.pipeline.local_mapping import (
            LocalMapper)
        lm = LocalMapper(m, CAM)
        lm._keyframe_culling(6)
        return m

    def test_visual_map_culls_redundant(self):
        rng = np.random.default_rng(0)
        m = self._cull(self._redundant_map(rng, dt=1.0))
        assert m.n_kf < 7          # redundant middle KFs removed

    def test_inertial_wide_gap_survives(self):
        rng = np.random.default_rng(0)
        m = self._redundant_map(rng, dt=1.0)
        m.imu_initialized = True   # merged gap would be 2 s > 0.5 s
        self._cull(m)
        assert m.n_kf == 7

    def test_inertial_tight_spacing_culls_and_merges_chain(self):
        rng = np.random.default_rng(0)
        m = self._redundant_map(rng, dt=0.2)
        m.imu_initialized = True   # merged gap 0.4 s <= 0.5 s: allowed
        self._cull(m)
        assert m.n_kf < 7
        # the temporal chain stays connected with merged windows: walking
        # kf_prev from the newest KF reaches KF 0, dTs summing to 1.2 s
        k, total = 6, 0.0
        while m.kf_prev[k] >= 0:
            total += float(m.kf_pre_dT[k])
            k = int(m.kf_prev[k])
        assert k == 0
        np.testing.assert_allclose(total, 1.2, atol=1e-5)


def test_imu_dead_reckoning_through_texture_loss(sequence):
    """While RECENTLY_LOST in an initialized inertial map the tracker keeps
    emitting IMU-predicted poses (dead-reckoning) instead of dropping frames,
    and re-acquires visually when texture returns (reference: Tracking's
    RECENTLY_LOST rescue, Tracking.cc:2203-2240)."""
    frames, traj = sequence
    slam = System(CAM, IMU_MONOCULAR, enable_loop_closing=False)
    n_blank = 6
    blank_at = 42
    blank = np.zeros_like(frames[0])
    dead_poses, after = [], []
    kf_before_gap = None
    for i, img in enumerate(frames):
        feed = blank if blank_at <= i < blank_at + n_blank else img
        if i == blank_at:
            kf_before_gap = slam.n_keyframes
        T = slam.track_monocular(feed, float(traj["ts"][i]),
                                 imu=traj["windows"][i])
        if i == blank_at + n_blank - 1:
            kf_after_gap = slam.n_keyframes
        if blank_at <= i < blank_at + n_blank:
            dead_poses.append(T)
        elif i >= blank_at + n_blank:
            after.append(T)
    assert slam.map.imu_initialized, "IMU never initialized"
    # the KF cadence continues through the blackout, keeping the
    # preintegration chain dense (reference: IMU.InsertKFsWhenLost,
    # Tracking.cc:2569)
    assert kf_after_gap > kf_before_gap, \
        f"no keyframes inserted while lost ({kf_before_gap}->{kf_after_gap})"
    # every blank frame still produced a pose, via dead-reckoning
    assert all(p is not None for p in dead_poses), \
        f"dead-reckoning dropped {sum(p is None for p in dead_poses)}/{n_blank}"
    # visual tracking re-acquires after the gap
    assert sum(p is not None for p in after) > 0.7 * len(after)
    # the whole trajectory -- including the dead-reckoned rows -- stays
    # metrically consistent with ground truth (map world differs from the
    # gt world by a rigid transform, so compare via Horn-aligned ATE)
    rows = slam.trajectory_tum()
    est_ts = np.array([r[0] for r in rows])
    est_xyz = np.array([r[1:4] for r in rows])
    blank_ts = [float(traj["ts"][blank_at + j]) for j in range(n_blank)]
    assert all(any(abs(est_ts - bt) < 1e-6) for bt in blank_ts), \
        "dead-reckoned frames missing from the trajectory"
    rmse, n, scale = evaluate_ate.ate_rmse(
        traj["ts"], traj["centers"], est_ts, est_xyz)
    assert n > 0.8 * len(frames)
    assert abs(scale - 1.0) < 0.12, f"metric scale off: {scale:.3f}"
    assert rmse < 0.12, f"ATE {rmse:.4f} m with dead-reckoned gap"
