"""Stereo and RGB-D pipelines end-to-end on rendered sequences: instant
depth-based initialization, metric-scale tracking (no scale alignment in the
ATE), and the stereo row-matching kernel against exact depth."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_detailed_comments_tpu.models import cameras
from orb_slam3_detailed_comments_tpu.pipeline.system import System, STEREO, RGBD
from orb_slam3_detailed_comments_tpu.utils import evaluate_ate, synth_render

CAM = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0, width=752, height=480)
BASELINE = 0.11  # EuRoC-like


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(9)
    planes = synth_render.default_world(rng)
    n = 40
    R, t = synth_render.orbit_trajectory(n)
    return planes, R, t, n


def test_stereo_match_kernel_depth(world):
    from orb_slam3_detailed_comments_tpu.pipeline import kernels
    from orb_slam3_detailed_comments_tpu.ops import extractor
    planes, R, t, n = world
    left, right = synth_render.render_stereo_pair(CAM, planes, R[0], t[0], BASELINE)
    depth_gt = synth_render.render_depth(CAM, planes, R[0], t[0])
    prep, depth, u_r = kernels.prepare_frame_stereo(
        jnp.asarray(left), jnp.asarray(right), CAM, BASELINE * CAM.fx,
        extractor.OrbConfig())
    depth = np.asarray(depth)
    xy = np.asarray(prep.feat.xy)
    ok = (depth > 0) & np.asarray(prep.feat.valid)
    assert ok.sum() > 200, f"only {ok.sum()} stereo matches"
    gt = depth_gt[np.clip(xy[ok][:, 1].astype(int), 0, 479),
                  np.clip(xy[ok][:, 0].astype(int), 0, 751)]
    valid_gt = gt > 0
    rel = np.abs(depth[ok][valid_gt] - gt[valid_gt]) / gt[valid_gt]
    assert np.median(rel) < 0.03, np.median(rel)
    assert (rel < 0.1).mean() > 0.85


def test_stereo_end_to_end(world):
    planes, R, t, n = world
    slam = System(CAM, STEREO, baseline=BASELINE, enable_loop_closing=False)
    ts = np.arange(n) * 0.05
    n_ok = 0
    for i in range(n):
        l, r = synth_render.render_stereo_pair(CAM, planes, R[i], t[i], BASELINE)
        if slam.track_stereo(l, r, float(ts[i])) is not None:
            n_ok += 1
    assert n_ok > 0.8 * n
    rows = slam.trajectory_tum()
    est_ts = np.array([r_[0] for r_ in rows])
    est_xyz = np.array([r_[1:4] for r_ in rows])
    gt_xyz = synth_render.camera_centers(R, t)
    # METRIC scale: align without scale correction
    rmse, nn, scale = evaluate_ate.ate_rmse(ts, gt_xyz, est_ts, est_xyz,
                                            with_scale=False)
    assert nn > 0.7 * n
    assert rmse < 0.05, f"stereo ATE {rmse:.4f} m"
    # scale really is metric: with-scale alignment should find ~1
    _, _, s = evaluate_ate.ate_rmse(ts, gt_xyz, est_ts, est_xyz, with_scale=True)
    assert abs(s - 1.0) < 0.03, s


def test_rgbd_end_to_end(world):
    planes, R, t, n = world
    slam = System(CAM, RGBD, baseline=BASELINE, enable_loop_closing=False)
    ts = np.arange(n) * 0.05
    n_ok = 0
    for i in range(n):
        img = synth_render.render_frame(CAM, planes, R[i], t[i])
        depth = synth_render.render_depth(CAM, planes, R[i], t[i])
        if slam.track_rgbd(img, depth, float(ts[i])) is not None:
            n_ok += 1
    assert n_ok > 0.8 * n
    rows = slam.trajectory_tum()
    est_ts = np.array([r_[0] for r_ in rows])
    est_xyz = np.array([r_[1:4] for r_ in rows])
    gt_xyz = synth_render.camera_centers(R, t)
    rmse, nn, scale = evaluate_ate.ate_rmse(ts, gt_xyz, est_ts, est_xyz,
                                            with_scale=False)
    assert nn > 0.7 * n
    assert rmse < 0.04, f"rgbd ATE {rmse:.4f} m"
