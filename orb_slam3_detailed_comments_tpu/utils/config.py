"""Settings: typed YAML configuration with the reference's key names.

Replaces Settings (reference: src/Settings.cc readCamera1/readImageInfo/
readIMU/readORB/... and the legacy in-Tracking parser). Accepts the
reference's own YAML files (EuRoC.yaml, TUM-VI.yaml — cv::FileStorage
"%YAML:1.0" headers are handled) so a user can point this framework at
their existing ORB-SLAM3 configs unchanged.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import yaml

from ..models import cameras


@dataclass
class Settings:
    camera: cameras.CameraParams = None
    camera2: Optional[cameras.CameraParams] = None
    fps: float = 30.0
    rgb: bool = True
    # stereo
    baseline: float = 0.0       # meters
    th_depth: float = 35.0
    # depth
    depth_map_factor: float = 1.0
    # ORB
    n_features: int = 1200
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    # IMU
    imu_noise_gyro: float = 1.7e-4
    imu_noise_acc: float = 2.0e-3
    imu_walk_gyro: float = 1.9e-5
    imu_walk_acc: float = 3.0e-3
    imu_frequency: float = 200.0
    T_bc: Optional[np.ndarray] = None   # 4x4 camera-in-body
    T_c1c2: Optional[np.ndarray] = None  # 4x4 cam2-in-cam1 (fisheye stereo)
    insert_kfs_when_lost: bool = True
    # input resize target (W, H) when Camera.newWidth/newHeight request a
    # different working resolution than the sensor's (reference:
    # Settings.cc:436 + the cv::resize in System::Track*, System.cc:285-300)
    resize_to: Optional[tuple] = None
    orig_width: Optional[int] = None     # sensor width before the resize
    # system
    load_atlas: Optional[str] = None
    save_atlas: Optional[str] = None
    loop_closing: bool = True
    raw: dict = field(default_factory=dict)


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # cv::FileStorage headers/directives that PyYAML rejects
    text = re.sub(r"^%YAML:.*$", "", text, flags=re.M)
    text = text.replace("!!opencv-matrix", "")
    return yaml.safe_load(text) or {}


def _get(d: dict, *keys, default=None):
    for k in keys:
        if k in d and d[k] is not None:
            return d[k]
    return default


def _read_camera(d: dict, prefix: str = "Camera") -> Optional[cameras.CameraParams]:
    """Reads both v1.0 ('Camera1.fx') and legacy ('Camera.fx') key styles."""
    def g(name, default=None):
        return _get(d, f"{prefix}1.{name}", f"{prefix}.{name}", default=default)

    fx = g("fx")
    if fx is None:
        return None
    fy, cx, cy = g("fy"), g("cx"), g("cy")
    w = _get(d, "Camera.width", "Camera.newWidth", default=752)
    h = _get(d, "Camera.height", "Camera.newHeight", default=480)
    cam_type = _get(d, "Camera.type", "File.type", default="PinHole")
    k1 = g("k1", 0.0) or 0.0
    k2 = g("k2", 0.0) or 0.0
    if str(cam_type).lower() in ("kannalabrandt8", "fisheye"):
        return cameras.fisheye_kb8(fx, fy, cx, cy, w, h,
                                   k1=k1, k2=k2,
                                   k3=g("k3", 0.0) or 0.0, k4=g("k4", 0.0) or 0.0)
    return cameras.pinhole(fx, fy, cx, cy, w, h, k1=k1, k2=k2,
                           p1=g("p1", 0.0) or 0.0, p2=g("p2", 0.0) or 0.0,
                           k3=g("k3", 0.0) or 0.0)


def _read_camera2(d: dict) -> Optional[cameras.CameraParams]:
    """Second camera of a non-rectified stereo rig (v1.0 'Camera2.*')."""
    def g(name, default=None):
        return _get(d, f"Camera2.{name}", default=default)
    fx = g("fx")
    if fx is None:
        return None
    w = _get(d, "Camera.width", default=752)
    h = _get(d, "Camera.height", default=480)
    cam_type = _get(d, "Camera.type", default="PinHole")
    if str(cam_type).lower() in ("kannalabrandt8", "fisheye"):
        return cameras.fisheye_kb8(fx, g("fy"), g("cx"), g("cy"), w, h,
                                   k1=g("k1", 0.0) or 0.0, k2=g("k2", 0.0) or 0.0,
                                   k3=g("k3", 0.0) or 0.0, k4=g("k4", 0.0) or 0.0)
    return cameras.pinhole(fx, g("fy"), g("cx"), g("cy"), w, h,
                           k1=g("k1", 0.0) or 0.0, k2=g("k2", 0.0) or 0.0,
                           p1=g("p1", 0.0) or 0.0, p2=g("p2", 0.0) or 0.0,
                           k3=g("k3", 0.0) or 0.0)


def _read_se3(v) -> Optional[np.ndarray]:
    """Reads a rigid transform given as a cv-matrix dict or flat list.
    The reference's YAMLs use both 4x4 (EuRoC Tbc) and 3x4
    (TUM_512.yaml Stereo.T_c1_c2) layouts; always returns 4x4."""
    if v is None:
        return None
    data = v["data"] if isinstance(v, dict) else v
    a = np.asarray(data, np.float32).reshape(-1, 4)
    if a.shape[0] == 3:
        a = np.vstack([a, np.array([[0, 0, 0, 1]], np.float32)])
    return a


def load_settings(path: str) -> Settings:
    d = _load_yaml(path)
    s = Settings(raw=d)
    s.camera = _read_camera(d)
    s.camera2 = _read_camera2(d)
    s.T_c1c2 = _read_se3(_get(d, "Stereo.T_c1_c2", "Tlr"))
    s.fps = float(_get(d, "Camera.fps", default=30.0))
    s.rgb = bool(_get(d, "Camera.RGB", default=1))
    bf = _get(d, "Camera.bf")
    if bf is not None and s.camera is not None:
        s.baseline = float(bf) / s.camera.fx
    st_b = _get(d, "Stereo.b")
    if st_b is not None:
        s.baseline = float(st_b)
    if s.baseline == 0.0 and s.T_c1c2 is not None:
        # v1.0 rigs give the extrinsic only; the reference's Settings derives
        # b (and bf) from it (Settings.cc readCamera2 rectification path)
        s.baseline = float(np.linalg.norm(s.T_c1c2[:3, 3]))
    s.th_depth = float(_get(d, "ThDepth", "Stereo.ThDepth", "Camera.ThDepth",
                            default=35.0))
    dmf = _get(d, "DepthMapFactor", "RGBD.DepthMapFactor")
    if dmf:
        s.depth_map_factor = float(dmf)
    s.n_features = int(_get(d, "ORBextractor.nFeatures", default=1200))
    s.scale_factor = float(_get(d, "ORBextractor.scaleFactor", default=1.2))
    s.n_levels = int(_get(d, "ORBextractor.nLevels", default=8))
    s.ini_th_fast = float(_get(d, "ORBextractor.iniThFAST", default=20))
    s.min_th_fast = float(_get(d, "ORBextractor.minThFAST", default=7))
    s.imu_noise_gyro = float(_get(d, "IMU.NoiseGyro", default=1.7e-4))
    s.imu_noise_acc = float(_get(d, "IMU.NoiseAcc", default=2.0e-3))
    s.imu_walk_gyro = float(_get(d, "IMU.GyroWalk", default=1.9e-5))
    s.imu_walk_acc = float(_get(d, "IMU.AccWalk", default=3.0e-3))
    s.imu_frequency = float(_get(d, "IMU.Frequency", default=200.0))
    s.T_bc = _read_se3(_get(d, "IMU.T_b_c1", "Tbc"))
    s.insert_kfs_when_lost = bool(_get(d, "IMU.InsertKFsWhenLost", default=1))
    s.load_atlas = _get(d, "System.LoadAtlasFromFile")
    s.save_atlas = _get(d, "System.SaveAtlasToFile")
    lc = _get(d, "loopClosing", default=1)
    s.loop_closing = bool(lc)
    # Camera.newWidth/newHeight: run at a different resolution than the
    # sensor's — scale the intrinsics and remember to resize inputs
    # (reference: Settings.cc:436-470; skipped when legacy rectification
    # blocks drive the geometry, as the reference does for bNeedToRectify)
    nw, nh = _get(d, "Camera.newWidth"), _get(d, "Camera.newHeight")
    if ((nw is not None or nh is not None) and s.camera is not None
            and "Camera.width" in d and "LEFT.K" not in d):
        nw = int(nw if nw is not None else s.camera.width)
        nh = int(nh if nh is not None else s.camera.height)
        if (nw, nh) != (s.camera.width, s.camera.height):
            s.resize_to = (nw, nh)
            s.orig_width = s.camera.width   # for System::GetImageScale
            s.camera = scale_camera(s.camera, nw, nh)
            if s.camera2 is not None:
                s.camera2 = scale_camera(s.camera2, nw, nh)
    return s


def scale_camera(cam: cameras.CameraParams, new_w: int,
                 new_h: int) -> cameras.CameraParams:
    """Rescale intrinsics to a resized image (distortion coefficients act on
    normalized coordinates and are resolution-invariant)."""
    sx = new_w / cam.width
    sy = new_h / cam.height
    return cam._replace(fx=cam.fx * sx, fy=cam.fy * sy,
                        cx=cam.cx * sx, cy=cam.cy * sy,
                        width=int(new_w), height=int(new_h))


def resize_image(img: np.ndarray, resize_to) -> np.ndarray:
    """Resize one input frame to Settings.resize_to (no-op when None);
    bilinear, like the reference's cv::resize calls in System::Track*."""
    if resize_to is None:
        return img
    import cv2
    return cv2.resize(np.asarray(img), tuple(resize_to),
                      interpolation=cv2.INTER_LINEAR)


def _mat(d: dict, name: str):
    v = d.get(name)
    if v is None:
        return None
    data = v["data"] if isinstance(v, dict) else v
    a = np.asarray(data, np.float64)
    if isinstance(v, dict) and "rows" in v:
        a = a.reshape(int(v["rows"]), int(v["cols"]))
    return a


def stereo_rectify_maps(s: Settings):
    """Precompute stereo rectification from the legacy LEFT.*/RIGHT.* blocks
    (reference: Settings' precomputed rectification maps, Settings.h:157,
    applied in System::TrackStereo, System.cc:285-292; legacy parsing in
    Tracking::ParseCamParamFile).

    Returns (remap_l, remap_r, cam_rect, baseline_m) where remap_* are
    cv2.remap map pairs, cam_rect the rectified pinhole camera, or None if
    the YAML has no rectification blocks.
    """
    import cv2
    d = s.raw
    K_l, K_r = _mat(d, "LEFT.K"), _mat(d, "RIGHT.K")
    if K_l is None or K_r is None:
        return None
    D_l = _mat(d, "LEFT.D").reshape(-1)
    D_r = _mat(d, "RIGHT.D").reshape(-1)
    R_l = _mat(d, "LEFT.R").reshape(3, 3)
    R_r = _mat(d, "RIGHT.R").reshape(3, 3)
    P_l = _mat(d, "LEFT.P").reshape(3, 4)
    P_r = _mat(d, "RIGHT.P").reshape(3, 4)
    w = int(_get(d, "LEFT.width", "Camera.width"))
    h = int(_get(d, "LEFT.height", "Camera.height"))
    m_l = cv2.initUndistortRectifyMap(K_l, D_l, R_l, P_l[:3, :3], (w, h),
                                      cv2.CV_32FC1)
    m_r = cv2.initUndistortRectifyMap(K_r, D_r, R_r, P_r[:3, :3], (w, h),
                                      cv2.CV_32FC1)
    cam_rect = cameras.pinhole(P_l[0, 0], P_l[1, 1], P_l[0, 2], P_l[1, 2],
                               w, h)
    baseline = float(-P_r[0, 3] / P_r[0, 0])
    return m_l, m_r, cam_rect, baseline


def rectify(img: np.ndarray, maps) -> np.ndarray:
    import cv2
    return cv2.remap(img, maps[0], maps[1], cv2.INTER_LINEAR)
