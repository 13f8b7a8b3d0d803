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
