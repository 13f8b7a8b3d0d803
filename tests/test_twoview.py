"""Two-view reconstruction tests: E-path (general scene), H-path (planar
scene), degenerate rejection (pure rotation)."""
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_tpu.lie import so3
from orb_slam3_detailed_comments_tpu.models import twoview

FOCAL = 460.0


def project_pair(points, R21, t21, noise, rng):
    """points in frame1; returns normalized coords in both frames + vis."""
    z1 = points[:, 2]
    x1 = points[:, :2] / z1[:, None]
    p2 = points @ R21.T + t21
    z2 = p2[:, 2]
    x2 = p2[:, :2] / z2[:, None]
    vis = (z1 > 0.1) & (z2 > 0.1) & (np.abs(x1) < 0.7).all(1) & (np.abs(x2) < 0.7).all(1)
    x1 += rng.normal(0, noise / FOCAL, x1.shape)
    x2 += rng.normal(0, noise / FOCAL, x2.shape)
    return x1.astype(np.float32), x2.astype(np.float32), vis


def run(x1, x2, vis, seed=0):
    return twoview.reconstruct(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(vis),
        jax.random.PRNGKey(seed), focal=FOCAL)


class TestTwoView:
    def test_general_scene_essential(self, rng):
        pts = np.stack([rng.uniform(-2, 2, 300), rng.uniform(-1.5, 1.5, 300),
                        rng.uniform(3, 9, 300)], axis=1)
        R21 = np.asarray(so3.exp(jnp.asarray([0.02, -0.1, 0.01], jnp.float32)))
        t21 = np.array([0.6, 0.05, 0.1], np.float32)
        x1, x2, vis = project_pair(pts, R21, t21, 0.5, rng)
        res = run(x1, x2, vis)
        assert bool(res.success)
        assert not bool(res.used_homography)
        # rotation error
        dR = np.asarray(res.R21) @ R21.T
        ang = np.linalg.norm(np.asarray(so3.log(jnp.asarray(dR))))
        assert ang < 0.01
        # translation direction (scale-free)
        tdir = np.asarray(res.t21)
        cos = abs(tdir @ t21) / np.linalg.norm(t21)
        assert cos > 0.995
        # triangulated structure matches up to scale
        good = np.asarray(res.is_good)
        assert good.sum() > 0.6 * vis.sum()
        X = np.asarray(res.points3d)[good]
        scale = np.median(X[:, 2]) / np.median(pts[good][:, 2])
        rel_err = np.linalg.norm(X / scale - pts[good], axis=-1) / pts[good][:, 2]
        assert np.median(rel_err) < 0.02
        assert np.quantile(rel_err, 0.9) < 0.06

    def test_planar_scene_homography(self, rng):
        # all points on a plane z = 5 + 0.3x + 0.2y
        xy = rng.uniform(-2.5, 2.5, (300, 2))
        z = 5.0 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]
        pts = np.concatenate([xy, z[:, None]], axis=1)
        R21 = np.asarray(so3.exp(jnp.asarray([0.03, 0.08, -0.02], jnp.float32)))
        t21 = np.array([0.5, -0.1, 0.15], np.float32)
        x1, x2, vis = project_pair(pts, R21, t21, 0.4, rng)
        res = run(x1, x2, vis)
        assert bool(res.used_homography)
        assert bool(res.success)
        dR = np.asarray(res.R21) @ R21.T
        ang = np.linalg.norm(np.asarray(so3.log(jnp.asarray(dR))))
        assert ang < 0.02
        cos = abs(np.asarray(res.t21) @ t21) / np.linalg.norm(t21)
        assert cos > 0.99

    def test_pure_rotation_rejected(self, rng):
        pts = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-1.5, 1.5, 200),
                        rng.uniform(3, 9, 200)], axis=1)
        R21 = np.asarray(so3.exp(jnp.asarray([0.0, 0.15, 0.0], jnp.float32)))
        t21 = np.zeros(3, np.float32)  # no baseline -> no parallax
        x1, x2, vis = project_pair(pts, R21, t21, 0.3, rng)
        res = run(x1, x2, vis)
        assert not bool(res.success)

    def test_outlier_contamination(self, rng):
        pts = np.stack([rng.uniform(-2, 2, 300), rng.uniform(-1.5, 1.5, 300),
                        rng.uniform(3, 9, 300)], axis=1)
        R21 = np.asarray(so3.exp(jnp.asarray([0.0, -0.08, 0.02], jnp.float32)))
        t21 = np.array([0.7, 0.0, 0.05], np.float32)
        x1, x2, vis = project_pair(pts, R21, t21, 0.4, rng)
        # corrupt 25% of matches
        n_bad = 75
        x2[:n_bad] = rng.uniform(-0.5, 0.5, (n_bad, 2)).astype(np.float32)
        res = run(x1, x2, vis)
        assert bool(res.success)
        dR = np.asarray(res.R21) @ R21.T
        ang = np.linalg.norm(np.asarray(so3.log(jnp.asarray(dR))))
        assert ang < 0.01
        assert np.asarray(res.is_good)[:n_bad].sum() < 8
