"""The dataset CLIs end-to-end against tiny on-disk synthetic datasets in
the reference's directory layouts (EuRoC mav0, TUM RGB-D). Locks in the
loader + settings-yaml + System wiring that real-dataset users hit first.

(reference: Examples/Monocular/mono_euroc.cc, Examples/RGB-D/rgbd_tum.cc)"""
import os
import runpy
import sys

import numpy as np
import pytest

from orb_slam3_detailed_comments_tpu.models import cameras
from orb_slam3_detailed_comments_tpu.utils import evaluate_ate, synth_render

# the standard test camera/ORB shapes: other suite modules compile the same
# jit programs, so these CLI tests hit warm caches under one pytest process
CAM = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                      width=752, height=480)
YAML = """%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.0
Camera1.fy: 457.0
Camera1.cx: 376.0
Camera1.cy: 240.0
Camera.width: 752
Camera.height: 480
Camera.fps: 20
{extra}ORBextractor.nFeatures: 1024
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _render_seq(n=16):
    rng = np.random.default_rng(4)
    planes = synth_render.default_world(rng)
    R, t = synth_render.orbit_trajectory(n)
    return planes, R, t


def _run_cli(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, script), run_name="__main__")
    except SystemExit as e:     # the mains sys.exit(main())
        assert not e.code, f"{script} exited with {e.code}"
    finally:
        sys.argv = old


def test_mono_euroc_cli(tmp_path):
    import cv2
    planes, R, t = _render_seq()
    n = len(R)
    d = tmp_path / "mav0" / "cam0" / "data"
    d.mkdir(parents=True)
    for i in range(n):
        img = np.asarray(synth_render.render_frame(CAM, planes, R[i], t[i]))
        cv2.imwrite(str(d / f"{int(1e9 * (1 + i * 0.05))}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(extra=""))
    out = tmp_path / "traj.txt"
    # pass the sequence twice: exercises the reference's multi-sequence mode
    # (ChangeDataset -> fresh map -> place-recognition re-merge)
    _run_cli("examples/mono_euroc.py",
             [str(y), str(tmp_path), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 1.2 * n and rows.shape[1] == 8
    # ATE on the first pass only (rows are in tracking order; the second
    # pass duplicates timestamps and may live in an unmerged second map)
    wraps = np.flatnonzero(np.diff(rows[:, 0]) < 0)
    rows = rows[:wraps[0] + 1] if wraps.size else rows
    assert rows.shape[0] > 0.6 * n
    ts = 1 + np.arange(n) * 0.05
    gt = synth_render.camera_centers(R, t)
    rmse, npair, scale = evaluate_ate.ate_rmse(ts, gt, rows[:, 0],
                                               rows[:, 1:4])
    assert rmse < 0.05, f"mono CLI ATE {rmse:.3f} m (scale {scale:.2f})"


def test_mono_tum_vi_cli(tmp_path):
    """mono_tum_vi wiring (EuRoC/ASL layout + CLAHE pre-equalization); the
    KB8 fisheye camera path itself is covered by test_pipeline_fisheye."""
    import cv2
    planes, R, t = _render_seq()
    n = len(R)
    d = tmp_path / "mav0" / "cam0" / "data"
    d.mkdir(parents=True)
    for i in range(n):
        img = np.asarray(synth_render.render_frame(CAM, planes, R[i], t[i]))
        cv2.imwrite(str(d / f"{int(1e9 * (1 + i * 0.05))}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(extra=""))
    out = tmp_path / "traj.txt"
    _run_cli("examples/mono_tum_vi.py", [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.6 * n and rows.shape[1] == 8


def test_rgbd_tum_cli(tmp_path):
    import cv2
    planes, R, t = _render_seq()
    n = len(R)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_l, d_l = [], []
    for i in range(n):
        img = np.asarray(synth_render.render_frame(CAM, planes, R[i], t[i]))
        depth = np.asarray(synth_render.render_depth(CAM, planes, R[i], t[i]))
        ts = 1.0 + i * 0.05
        cv2.imwrite(str(tmp_path / "rgb" / f"{ts:.6f}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
        cv2.imwrite(str(tmp_path / "depth" / f"{ts:.6f}.png"),
                    np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))
        rgb_l.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        d_l.append(f"{ts:.6f} depth/{ts:.6f}.png")
    (tmp_path / "rgb.txt").write_text("# ts f\n" + "\n".join(rgb_l) + "\n")
    (tmp_path / "depth.txt").write_text("# ts f\n" + "\n".join(d_l) + "\n")
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(
        extra="RGBD.DepthMapFactor: 5000.0\nStereo.ThDepth: 40.0\n"
              "Stereo.b: 0.08\n"))
    out = tmp_path / "traj.txt"
    _run_cli("examples/rgbd_tum.py", [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.8 * n
    ts = 1 + np.arange(n) * 0.05
    gt = synth_render.camera_centers(R, t)
    rmse, npair, scale = evaluate_ate.ate_rmse(ts, gt, rows[:, 0],
                                               rows[:, 1:4])
    # depth makes it metric: Horn scale must be ~1 without correction
    assert abs(scale - 1.0) < 0.05, scale
    assert rmse < 0.05, f"rgbd CLI ATE {rmse:.3f} m"


def test_stereo_kitti_cli(tmp_path):
    """stereo_kitti wiring: KITTI odometry layout (image_0/image_1 +
    times.txt), Camera.bf baseline, KITTI 3x4 trajectory format
    (reference: Examples/Stereo/stereo_kitti.cc)."""
    import cv2
    planes, R, t = _render_seq()
    n = len(R)
    baseline = 0.12
    d0 = tmp_path / "image_0"
    d1 = tmp_path / "image_1"
    d0.mkdir(); d1.mkdir()
    for i in range(n):
        l, r = synth_render.render_stereo_pair(CAM, planes, R[i], t[i],
                                               baseline)
        cv2.imwrite(str(d0 / f"{i:06d}.png"),
                    np.clip(np.asarray(l), 0, 255).astype(np.uint8))
        cv2.imwrite(str(d1 / f"{i:06d}.png"),
                    np.clip(np.asarray(r), 0, 255).astype(np.uint8))
    np.savetxt(tmp_path / "times.txt", np.arange(n) * 0.05)
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(extra=f"Camera.bf: {458.0 * baseline}\n"))
    out = tmp_path / "traj_kitti.txt"
    _run_cli("examples/stereo_kitti.py", [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.6 * n and rows.shape[1] == 12
    # stereo is metric: the recovered inter-frame step must match ground
    # truth without scale correction
    gt = synth_render.camera_centers(R, t)
    est = rows[:, [3, 7, 11]]
    step_gt = np.linalg.norm(np.diff(gt[: len(est)], axis=0), axis=1).mean()
    step_est = np.linalg.norm(np.diff(est, axis=0), axis=1).mean()
    assert abs(step_est - step_gt) < 0.3 * step_gt, (step_est, step_gt)


def test_mono_inertial_euroc_cli(tmp_path):
    """mono_inertial_euroc wiring: EuRoC mav0 layout with imu0/data.csv,
    per-frame IMU windows, IMU.* yaml keys
    (reference: Examples/Monocular-Inertial/mono_inertial_euroc.cc)."""
    import cv2
    rng = np.random.default_rng(11)
    planes = synth_render.default_world(rng)
    n = 20
    tr = synth_render.inertial_trajectory(n)
    d = tmp_path / "mav0" / "cam0" / "data"
    d.mkdir(parents=True)
    for i in range(n):
        img = np.asarray(synth_render.render_frame(
            CAM, planes, tr["R_cw"][i], tr["t_cw"][i]))
        cv2.imwrite(str(d / f"{int(1e9 * (1 + tr['ts'][i]))}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
    imu_dir = tmp_path / "mav0" / "imu0"
    imu_dir.mkdir(parents=True)
    with open(imu_dir / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for w in tr["windows"]:
            if w is None:
                continue
            acc, gyro, tm = np.asarray(w[0]), np.asarray(w[1]), np.asarray(w[2])
            for j in range(len(tm)):
                f.write(f"{int(1e9 * (1 + tm[j]))},"
                        f"{gyro[j, 0]},{gyro[j, 1]},{gyro[j, 2]},"
                        f"{acc[j, 0]},{acc[j, 1]},{acc[j, 2]}\n")
    imu_yaml = ("IMU.NoiseGyro: 1.7e-4\nIMU.NoiseAcc: 2.0e-3\n"
                "IMU.GyroWalk: 1.9e-5\nIMU.AccWalk: 3.0e-3\n"
                "IMU.Frequency: 200\n")
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(extra=imu_yaml))
    out = tmp_path / "traj.txt"
    _run_cli("examples/mono_inertial_euroc.py",
             [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.5 * n and rows.shape[1] == 8


def test_stereo_euroc_cli_with_rectification(tmp_path):
    """stereo_euroc wiring: EuRoC two-camera layout + legacy LEFT./RIGHT.
    rectification blocks (identity rig here, so rendered pinhole pairs map
    through the remap path unchanged) -> metric trajectory
    (reference: Examples/Stereo/stereo_euroc.cc + Settings rectification)."""
    import cv2
    planes, R, t = _render_seq()
    n = len(R)
    baseline = 0.11
    bf = 458.0 * baseline
    for cam_name in ("cam0", "cam1"):
        (tmp_path / "mav0" / cam_name / "data").mkdir(parents=True)
    for i in range(n):
        l, r = synth_render.render_stereo_pair(CAM, planes, R[i], t[i],
                                               baseline)
        ns = int(1e9 * (1 + i * 0.05))
        cv2.imwrite(str(tmp_path / "mav0" / "cam0" / "data" / f"{ns}.png"),
                    np.clip(np.asarray(l), 0, 255).astype(np.uint8))
        cv2.imwrite(str(tmp_path / "mav0" / "cam1" / "data" / f"{ns}.png"),
                    np.clip(np.asarray(r), 0, 255).astype(np.uint8))
    K = "[458.0, 0.0, 376.0, 0.0, 457.0, 240.0, 0.0, 0.0, 1.0]"
    ident = "[1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]"
    zeros5 = "[0.0, 0.0, 0.0, 0.0, 0.0]"
    mat = ("!!opencv-matrix\n  rows: {r}\n  cols: {c}\n  dt: d\n"
           "  data: {d}\n")
    y = tmp_path / "s.yaml"
    y.write_text(f"""%YAML:1.0
Camera.fx: 458.0
Camera.fy: 457.0
Camera.cx: 376.0
Camera.cy: 240.0
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.bf: {bf}
ORBextractor.nFeatures: 1024
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
LEFT.width: 752
LEFT.height: 480
LEFT.K: {mat.format(r=3, c=3, d=K)}
LEFT.D: {mat.format(r=1, c=5, d=zeros5)}
LEFT.R: {mat.format(r=3, c=3, d=ident)}
LEFT.P: {mat.format(r=3, c=4, d='[458.0, 0.0, 376.0, 0.0, 0.0, 457.0, 240.0, 0.0, 0.0, 0.0, 1.0, 0.0]')}
RIGHT.width: 752
RIGHT.height: 480
RIGHT.K: {mat.format(r=3, c=3, d=K)}
RIGHT.D: {mat.format(r=1, c=5, d=zeros5)}
RIGHT.R: {mat.format(r=3, c=3, d=ident)}
RIGHT.P: {mat.format(r=3, c=4, d=f'[458.0, 0.0, 376.0, {-bf}, 0.0, 457.0, 240.0, 0.0, 0.0, 0.0, 1.0, 0.0]')}
""")
    out = tmp_path / "traj.txt"
    _run_cli("examples/stereo_euroc.py", [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.6 * n and rows.shape[1] == 8
    # metric scale (stereo): Horn WITHOUT scale correction must fit
    ts = 1 + np.arange(n) * 0.05
    gt = synth_render.camera_centers(R, t)
    rmse, npair, scale = evaluate_ate.ate_rmse(ts, gt, rows[:, 0],
                                               rows[:, 1:4])
    assert rmse < 0.08, f"stereo-euroc CLI ATE {rmse:.3f} m"
    assert abs(scale - 1.0) < 0.05   # metric (stereo): estimated scale ~1


def test_stereo_inertial_euroc_cli(tmp_path):
    """stereo_inertial_euroc wiring: stereo mav0 pair + imu0/data.csv +
    IMU/baseline yaml keys through one CLI (reference:
    Examples/Stereo-Inertial/stereo_inertial_euroc.cc)."""
    import cv2
    rng = np.random.default_rng(13)
    planes = synth_render.default_world(rng)
    n = 20
    baseline = 0.11
    tr = synth_render.inertial_trajectory(n)
    for cam_name in ("cam0", "cam1"):
        (tmp_path / "mav0" / cam_name / "data").mkdir(parents=True)
    for i in range(n):
        l, r = synth_render.render_stereo_pair(
            CAM, planes, tr["R_cw"][i], tr["t_cw"][i], baseline)
        ns = int(1e9 * (1 + tr["ts"][i]))
        cv2.imwrite(str(tmp_path / "mav0" / "cam0" / "data" / f"{ns}.png"),
                    np.clip(np.asarray(l), 0, 255).astype(np.uint8))
        cv2.imwrite(str(tmp_path / "mav0" / "cam1" / "data" / f"{ns}.png"),
                    np.clip(np.asarray(r), 0, 255).astype(np.uint8))
    imu_dir = tmp_path / "mav0" / "imu0"
    imu_dir.mkdir(parents=True)
    with open(imu_dir / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for w in tr["windows"]:
            if w is None:
                continue
            acc, gyro, tm = np.asarray(w[0]), np.asarray(w[1]), np.asarray(w[2])
            for j in range(len(tm)):
                f.write(f"{int(1e9 * (1 + tm[j]))},"
                        f"{gyro[j, 0]},{gyro[j, 1]},{gyro[j, 2]},"
                        f"{acc[j, 0]},{acc[j, 1]},{acc[j, 2]}\n")
    extra = (f"Camera.bf: {458.0 * baseline}\n"
             "IMU.NoiseGyro: 1.7e-4\nIMU.NoiseAcc: 2.0e-3\n"
             "IMU.GyroWalk: 1.9e-5\nIMU.AccWalk: 3.0e-3\n"
             "IMU.Frequency: 200\n")
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(extra=extra))
    out = tmp_path / "traj.txt"
    _run_cli("examples/stereo_inertial_euroc.py",
             [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.5 * n and rows.shape[1] == 8
    # keyframe trajectory sibling file written too
    kf_rows = np.loadtxt(str(out).replace(".txt", "_kf.txt"))
    assert kf_rows.ndim == 2 and kf_rows.shape[1] == 8


def test_mono_kitti_cli(tmp_path):
    """mono_kitti wiring: KITTI odometry layout driven monocular, TUM-format
    trajectory out (reference: Examples/Monocular/mono_kitti.cc)."""
    import cv2
    planes, R, t = _render_seq()
    n = len(R)
    d0 = tmp_path / "image_0"
    d0.mkdir()
    (tmp_path / "image_1").mkdir()
    for i in range(n):
        img = np.asarray(synth_render.render_frame(CAM, planes, R[i], t[i]))
        cv2.imwrite(str(d0 / f"{i:06d}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
        cv2.imwrite(str(tmp_path / "image_1" / f"{i:06d}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
    np.savetxt(tmp_path / "times.txt", np.arange(n) * 0.05)
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(extra=""))
    out = tmp_path / "traj.txt"
    _run_cli("examples/mono_kitti.py", [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.6 * n and rows.shape[1] == 8
    ts = np.arange(n) * 0.05
    gt = synth_render.camera_centers(R, t)
    rmse, npair, scale = evaluate_ate.ate_rmse(ts, gt, rows[:, 0],
                                               rows[:, 1:4])
    assert rmse < 0.05, f"mono-kitti CLI ATE {rmse:.3f} m (scale {scale:.2f})"


def test_mono_tum_cli(tmp_path):
    """mono_tum wiring: TUM RGB-D layout (rgb.txt association file) driven
    monocular (reference: Examples/Monocular/mono_tum.cc)."""
    import cv2
    planes, R, t = _render_seq()
    n = len(R)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_l, d_l = [], []
    for i in range(n):
        img = np.asarray(synth_render.render_frame(CAM, planes, R[i], t[i]))
        depth = np.asarray(synth_render.render_depth(CAM, planes, R[i], t[i]))
        ts = 1.0 + i * 0.05
        cv2.imwrite(str(tmp_path / "rgb" / f"{ts:.6f}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
        cv2.imwrite(str(tmp_path / "depth" / f"{ts:.6f}.png"),
                    np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))
        rgb_l.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        d_l.append(f"{ts:.6f} depth/{ts:.6f}.png")
    (tmp_path / "rgb.txt").write_text("# ts f\n" + "\n".join(rgb_l) + "\n")
    (tmp_path / "depth.txt").write_text("# ts f\n" + "\n".join(d_l) + "\n")
    y = tmp_path / "s.yaml"
    y.write_text(YAML.format(extra=""))
    out = tmp_path / "traj.txt"
    _run_cli("examples/mono_tum.py", [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.6 * n and rows.shape[1] == 8
    ts = 1 + np.arange(n) * 0.05
    gt = synth_render.camera_centers(R, t)
    rmse, npair, scale = evaluate_ate.ate_rmse(ts, gt, rows[:, 0],
                                               rows[:, 1:4])
    assert rmse < 0.05, f"mono-tum CLI ATE {rmse:.3f} m (scale {scale:.2f})"


@pytest.mark.slow
def test_stereo_inertial_tum_vi_cli(tmp_path):
    """stereo_inertial_tum_vi wiring: the TUM-VI flagship CLI — KB8
    fisheye pair in EuRoC/ASL layout (Camera1/Camera2 + Stereo.T_c1_c2
    yaml, CLAHE pre-equalization) + imu0/data.csv (reference:
    Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc + TUM_512.yaml)."""
    import cv2
    fcam = cameras.fisheye_kb8(
        fx=380.0, fy=380.0, cx=376.0, cy=240.0, width=752, height=480,
        k1=0.0034, k2=0.0008, k3=-0.0007, k4=0.0001)
    rng = np.random.default_rng(23)
    planes = synth_render.default_world(rng)
    n = 18
    BASE = 0.11
    tr = synth_render.inertial_trajectory(n)
    for cam_name in ("cam0", "cam1"):
        (tmp_path / "mav0" / cam_name / "data").mkdir(parents=True)
    for i in range(n):
        R, t = tr["R_cw"][i], tr["t_cw"][i]
        left = synth_render.render_frame_raycast(fcam, planes, R, t)
        c_r = -R.T @ t + R.T @ np.array([BASE, 0.0, 0.0])
        right = synth_render.render_frame_raycast(
            fcam, planes, R, (-R @ c_r).astype(np.float32))
        ns = int(1e9 * (1 + tr["ts"][i]))
        cv2.imwrite(str(tmp_path / "mav0" / "cam0" / "data" / f"{ns}.png"),
                    np.clip(np.asarray(left), 0, 255).astype(np.uint8))
        cv2.imwrite(str(tmp_path / "mav0" / "cam1" / "data" / f"{ns}.png"),
                    np.clip(np.asarray(right), 0, 255).astype(np.uint8))
    imu_dir = tmp_path / "mav0" / "imu0"
    imu_dir.mkdir(parents=True)
    with open(imu_dir / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for w in tr["windows"]:
            if w is None:
                continue
            acc, gyro, tm = (np.asarray(w[0]), np.asarray(w[1]),
                             np.asarray(w[2]))
            for j in range(len(tm)):
                f.write(f"{int(1e9 * (1 + tm[j]))},"
                        f"{gyro[j, 0]},{gyro[j, 1]},{gyro[j, 2]},"
                        f"{acc[j, 0]},{acc[j, 1]},{acc[j, 2]}\n")
    y = tmp_path / "s.yaml"
    y.write_text(f"""%YAML:1.0
File.version: "1.0"
Camera.type: "KannalaBrandt8"
Camera1.fx: 380.0
Camera1.fy: 380.0
Camera1.cx: 376.0
Camera1.cy: 240.0
Camera1.k1: 0.0034
Camera1.k2: 0.0008
Camera1.k3: -0.0007
Camera1.k4: 0.0001
Camera2.fx: 380.0
Camera2.fy: 380.0
Camera2.cx: 376.0
Camera2.cy: 240.0
Camera2.k1: 0.0034
Camera2.k2: 0.0008
Camera2.k3: -0.0007
Camera2.k4: 0.0001
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1.0, 0.0, 0.0, {BASE}, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0,
         0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200
ORBextractor.nFeatures: 1024
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    out = tmp_path / "traj.txt"
    _run_cli("examples/stereo_inertial_tum_vi.py",
             [str(y), str(tmp_path), str(out)])
    rows = np.loadtxt(out)
    assert rows.shape[0] > 0.5 * n and rows.shape[1] == 8
