"""Camera model tests: golden comparison against OpenCV's implementations
(cv2.projectPoints for radtan pinhole, cv2.fisheye for Kannala-Brandt)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_detailed_comments_tpu.models import cameras

cv2 = pytest.importorskip("cv2")

# EuRoC cam0 intrinsics (Examples/Monocular/EuRoC.yaml in the reference)
EUROC = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
             k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05)
# TUM-VI fisheye-ish KB params
TUMVI = dict(fx=190.97847715128717, fy=190.9733070521226,
             cx=254.93170605935475, cy=256.8974428996504,
             k1=0.0034823894022493434, k2=0.0007150348452162257,
             k3=-0.0020532361418706202, k4=0.00020293673591811182)


def make_points(rng, n=200, fov_limit=0.8):
    d = rng.uniform(0.5, 10.0, size=(n, 1))
    xy = rng.uniform(-fov_limit, fov_limit, size=(n, 2)) * d
    return np.concatenate([xy, d], axis=-1).astype(np.float32)


class TestPinhole:
    def setup_method(self):
        self.cam = cameras.pinhole(width=752, height=480, **EUROC)

    def test_project_matches_cv2(self, rng):
        pts = make_points(rng)
        uv = np.asarray(cameras.project(self.cam, jnp.asarray(pts)))
        K = np.array([[EUROC["fx"], 0, EUROC["cx"]], [0, EUROC["fy"], EUROC["cy"]], [0, 0, 1]])
        D = np.array([EUROC["k1"], EUROC["k2"], EUROC["p1"], EUROC["p2"]])
        uv_cv, _ = cv2.projectPoints(pts.reshape(-1, 1, 3).astype(np.float64),
                                     np.zeros(3), np.zeros(3), K, D)
        np.testing.assert_allclose(uv, uv_cv.reshape(-1, 2), atol=5e-2)

    def test_unproject_roundtrip(self, rng):
        pts = make_points(rng, fov_limit=0.6)
        uv = cameras.project(self.cam, jnp.asarray(pts))
        rays = np.asarray(cameras.unproject(self.cam, uv))
        pn = pts / pts[:, 2:3]
        np.testing.assert_allclose(rays, pn, atol=1e-3)

    def test_project_jac_finite_diff(self, rng):
        pts = jnp.asarray(make_points(rng, n=16, fov_limit=0.5))
        J = np.asarray(cameras.project_jac(self.cam, pts))
        eps = 1e-3
        for k in range(3):
            dp = np.zeros(3, np.float32); dp[k] = eps
            up = np.asarray(cameras.project(self.cam, pts + dp))
            um = np.asarray(cameras.project(self.cam, pts - dp))
            fd = (up - um) / (2 * eps)
            np.testing.assert_allclose(J[:, :, k], fd, atol=0.3, rtol=5e-2)

    def test_in_image(self):
        uv = jnp.array([[0.0, 0.0], [751.9, 479.9], [-1.0, 5.0], [752.0, 100.0]])
        m = np.asarray(cameras.in_image(self.cam, uv))
        assert m.tolist() == [True, True, False, False]

    def test_jit(self, rng):
        pts = jnp.asarray(make_points(rng, n=8))
        f = jax.jit(lambda p: cameras.project(self.cam, p))
        np.testing.assert_allclose(np.asarray(f(pts)),
                                   np.asarray(cameras.project(self.cam, pts)), atol=1e-5)


class TestKB8:
    def setup_method(self):
        self.cam = cameras.fisheye_kb8(width=512, height=512, **TUMVI)

    def test_project_matches_cv2_fisheye(self, rng):
        pts = make_points(rng, fov_limit=1.5)
        uv = np.asarray(cameras.project(self.cam, jnp.asarray(pts)))
        K = np.array([[TUMVI["fx"], 0, TUMVI["cx"]], [0, TUMVI["fy"], TUMVI["cy"]], [0, 0, 1]])
        D = np.array([TUMVI["k1"], TUMVI["k2"], TUMVI["k3"], TUMVI["k4"]])
        uv_cv, _ = cv2.fisheye.projectPoints(
            pts.reshape(-1, 1, 3).astype(np.float64), np.zeros(3), np.zeros(3), K, D)
        np.testing.assert_allclose(uv, uv_cv.reshape(-1, 2), atol=5e-2)

    def test_unproject_bearing_roundtrip(self, rng):
        pts = make_points(rng, fov_limit=1.5)
        b0 = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        uv = cameras.project(self.cam, jnp.asarray(pts))
        b = np.asarray(cameras.unproject_bearing(self.cam, uv))
        np.testing.assert_allclose(b, b0, atol=1e-4)

    def test_wide_angle_projection(self):
        # ray at ~80 deg off-axis must still round-trip (fisheye FOV)
        theta = np.radians(80.0)
        p = jnp.array([[np.sin(theta), 0.0, np.cos(theta)]], dtype=jnp.float32)
        uv = cameras.project(self.cam, p)
        b = np.asarray(cameras.unproject_bearing(self.cam, uv))
        np.testing.assert_allclose(b[0], np.asarray(p)[0], atol=1e-4)

    def test_project_jac_finite_diff(self, rng):
        pts = jnp.asarray(make_points(rng, n=16, fov_limit=1.0))
        J = np.asarray(cameras.project_jac(self.cam, pts))
        eps = 1e-3
        for k in range(3):
            dp = np.zeros(3, np.float32); dp[k] = eps
            up = np.asarray(cameras.project(self.cam, pts + dp))
            um = np.asarray(cameras.project(self.cam, pts - dp))
            fd = (up - um) / (2 * eps)
            np.testing.assert_allclose(J[:, :, k], fd, atol=0.3, rtol=5e-2)
