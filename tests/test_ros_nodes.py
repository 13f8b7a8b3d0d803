"""ROS node layer (reference: Examples/ROS/ORB_SLAM3/src/*.cc).

The synchronization/pairing/IMU-gating policies are unit-tested against a
recording stub, then the mono + AR path runs end-to-end with a real System
on rendered frames through the same transport surface.
"""
import numpy as np
import pytest

from orb_slam3_detailed_comments_tpu.ros import nodes
from orb_slam3_detailed_comments_tpu.ros.transport import (
    ImageMsg, ImuMsg, LocalTransport, _decode_ros_image)


class FakeSlam:
    """Records track_* calls; returns identity pose."""

    def __init__(self):
        self.calls = []
        self.cam = None

    def _pose(self):
        return np.eye(4)

    def track_monocular(self, img, ts, imu=None):
        self.calls.append(("mono", img, ts, imu))
        return self._pose()

    def track_stereo(self, l, r, ts, imu=None):
        self.calls.append(("stereo", l, r, ts, imu))
        return self._pose()

    def track_rgbd(self, img, depth, ts, imu=None):
        self.calls.append(("rgbd", img, depth, ts, imu))
        return self._pose()


def _img(stamp, w=8, h=6, val=None):
    data = np.full((h, w), val if val is not None else int(stamp * 10) % 255,
                   np.uint8)
    return ImageMsg(stamp=stamp, image=data)


def test_mono_node_tracks_every_frame():
    slam, tr = FakeSlam(), LocalTransport()
    node = nodes.MonoNode(slam).attach(tr)
    for i in range(5):
        tr.deliver("/camera/image_raw", _img(i * 0.1))
    assert len(slam.calls) == 5
    assert len(tr.published(node.POSE_TOPIC)) == 5
    assert slam.calls[0][1].ndim == 2  # grayscale passthrough


def test_mono_node_converts_bgr():
    slam, tr = FakeSlam(), LocalTransport()
    nodes.MonoNode(slam).attach(tr)
    bgr = np.zeros((6, 8, 3), np.uint8)
    bgr[..., 2] = 200  # red channel
    tr.deliver("/camera/image_raw", ImageMsg(0.0, bgr))
    g = slam.calls[0][1]
    assert g.ndim == 2 and abs(int(g[0, 0]) - int(0.299 * 200)) <= 1


def test_mono_inertial_gates_on_imu_coverage():
    """An image must wait until IMU samples beyond its stamp exist
    (reference: SyncWithImu's `imuBuf.back()->header.stamp <= tImage` gate),
    and consecutive windows must partition the stream without loss."""
    slam, tr = FakeSlam(), LocalTransport()
    node = nodes.MonoInertialNode(slam).attach(tr)
    tr.deliver("/camera/image_raw", _img(0.10))
    assert node.sync_once() is False and not slam.calls  # no IMU yet
    for k in range(30):  # IMU at 200 Hz from t=0
        tr.deliver("/imu", ImuMsg(k * 0.005, np.ones(3) * k, np.ones(3)))
    assert node.sync_once() is True
    tr.deliver("/camera/image_raw", _img(0.145))
    assert node.sync_once() is True
    _, _, ts0, w0 = slam.calls[0]
    _, _, ts1, w1 = slam.calls[1]
    # first window: everything <= 0.10; second: (0.10, 0.145]
    assert w0[2][0] == 0.0 and w0[2][-1] == pytest.approx(0.10)
    assert w1[2][0] == pytest.approx(0.105) and w1[2][-1] == pytest.approx(0.145)
    assert len(w0[2]) + len(w1[2]) == 21 + 9  # t=0..0.10 then 0.105..0.145
    # gyro payload preserved in order
    assert w1[0].shape == (9, 3) and w1[1][0][0] == 21


def test_stereo_node_pairs_and_drops():
    """Left/right frames pair within 10 ms; older unmatched frames drop
    (reference: ros_stereo_inertial.cc:176-199)."""
    slam, tr = FakeSlam(), LocalTransport()
    node = nodes.StereoNode(slam).attach(tr)
    tr.deliver("/camera/left/image_raw", _img(0.00))   # orphan: no right
    tr.deliver("/camera/left/image_raw", _img(0.100))
    tr.deliver("/camera/right/image_raw", _img(0.103))  # within 10 ms
    assert node.sync_once() is True
    assert node.sync_once() is False
    assert len(slam.calls) == 1
    assert slam.calls[0][3] == pytest.approx(0.100)  # stamped by the left


def test_stereo_inertial_waits_for_imu():
    slam, tr = FakeSlam(), LocalTransport()
    node = nodes.StereoInertialNode(slam).attach(tr)
    tr.deliver("/camera/left/image_raw", _img(0.05))
    tr.deliver("/camera/right/image_raw", _img(0.05))
    assert node.sync_once() is False
    for k in range(15):
        tr.deliver("/imu", ImuMsg(k * 0.005, np.zeros(3), np.zeros(3)))
    assert node.sync_once() is True
    kind, _, _, ts, w = slam.calls[0]
    assert kind == "stereo" and w is not None and w[2][-1] <= 0.05 + 1e-9


def test_rgbd_node_scales_uint16_depth():
    slam, tr = FakeSlam(), LocalTransport()
    node = nodes.RGBDNode(slam, depth_factor=5000.0).attach(tr)
    tr.deliver("/camera/rgb/image_raw", _img(1.0))
    d = np.full((6, 8), 10000, np.uint16)
    tr.deliver("/camera/depth_registered/image_raw", ImageMsg(1.004, d))
    assert node.sync_once() is True
    depth = slam.calls[0][2]
    assert depth.dtype == np.float32 and depth[0, 0] == pytest.approx(2.0)


def test_decode_ros_image_encodings():
    class Msg:
        pass

    for enc, arr in [("mono8", np.arange(48, dtype=np.uint8).reshape(6, 8)),
                     ("16uc1", (np.arange(48, dtype=np.uint16) * 100).reshape(6, 8)),
                     ("32fc1", np.linspace(0, 1, 48, dtype=np.float32).reshape(6, 8))]:
        m = Msg()
        m.encoding, m.height, m.width = enc, 6, 8
        m.step = arr.strides[0]
        m.data = arr.tobytes()
        out = _decode_ros_image(m)
        assert out.shape == (6, 8) and np.array_equal(out, arr)
    m = Msg()
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 7  # red in rgb order
    m.encoding, m.height, m.width, m.step = "rgb8", 2, 2, 6
    m.data = rgb.tobytes()
    out = _decode_ros_image(m)
    assert out.shape == (2, 2, 3) and out[0, 0, 2] == 7  # now bgr


# --------------------------------------------------------------------------
# integration: real System + AR overlay through the transport surface
# --------------------------------------------------------------------------

def test_mono_ar_end_to_end():
    from orb_slam3_detailed_comments_tpu.models import cameras
    from orb_slam3_detailed_comments_tpu.pipeline.system import System, MONOCULAR
    from orb_slam3_detailed_comments_tpu.utils import synth_render

    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    rng = np.random.default_rng(5)
    planes = synth_render.default_world(rng)
    n = 24
    R, t = synth_render.orbit_trajectory(n)
    slam = System(cam, MONOCULAR)
    tr = LocalTransport()
    node = nodes.MonoARNode(slam, cube_size=0.4).attach(tr)
    for i in range(n):
        img = synth_render.render_frame(cam, planes, R[i], t[i])
        tr.deliver("/camera/image_raw",
                   ImageMsg(i * 0.05, img.astype(np.uint8)))
    poses = tr.published(node.POSE_TOPIC)
    assert sum(p.T_cw is not None for p in poses) > 0.5 * n
    assert node.plane is not None, "no dominant plane found"
    ar = tr.published(node.AR_TOPIC)
    assert node.n_overlaid > 0 and len(ar) == node.n_overlaid
    out = ar[-1].image
    assert out.ndim == 3  # BGR overlay
    # the cube wireframe is drawn in pure green — present in the overlay
    green = (out[..., 1].astype(int) - out[..., 0].astype(int) > 80).sum()
    assert green > 50, f"cube not visible ({green} green px)"


def test_detect_plane_geometry():
    """Plane RANSAC recovers a known plane despite 30% outliers."""
    from orb_slam3_detailed_comments_tpu.viz import viewer_ar
    rng = np.random.default_rng(2)
    n_in, n_out = 140, 60
    xy = rng.uniform(-1, 1, (n_in, 2))
    pts_in = np.stack([xy[:, 0], np.full(n_in, 0.5), xy[:, 1]], 1)
    pts_out = rng.uniform(-2, 2, (n_out, 3))
    pts = np.concatenate([pts_in, pts_out])
    T_cw = np.eye(4)
    T_cw[:3, 3] = [0, -2.0, 0]  # camera center = -R^T t = (0, +2, 0)
    pl = viewer_ar.detect_plane(pts, T_cw, n_hyp=100)
    assert pl is not None and pl.n_inliers >= 0.9 * n_in
    assert abs(abs(pl.R_wp[:, 2] @ np.array([0, 1, 0])) - 1) < 1e-3
    # normal oriented toward the camera (+y side)
    assert pl.R_wp[1, 2] > 0
