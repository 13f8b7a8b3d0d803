"""Live multi-map (Atlas) pipeline tests: spawning a fresh map on dataset
change or tracking loss, and welding maps back together when place
recognition finds the overlap (reference: Tracking::CreateMapInAtlas
Tracking.cc:3093, LoopClosing merge branch + MergeLocal LoopClosing.cc:1590,
System::ChangeDataset)."""
import numpy as np
import pytest

from orb_slam3_detailed_comments_tpu.models import cameras
from orb_slam3_detailed_comments_tpu.pipeline.system import System, MONOCULAR
from orb_slam3_detailed_comments_tpu.pipeline.tracking import (
    NOT_INITIALIZED, OK, TrackingConfig)
from orb_slam3_detailed_comments_tpu.utils import evaluate_ate, synth_render

CAM = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                      width=752, height=480)


@pytest.fixture(scope="module")
def sequence():
    rng = np.random.default_rng(7)
    planes = synth_render.default_world(rng)
    n = 50
    R, t = synth_render.orbit_trajectory(n)
    frames = [synth_render.render_frame(CAM, planes, R[i], t[i])
              for i in range(n)]
    return frames, R, t


def test_multimap_spawn_and_merge(sequence):
    """Two 'sequences' over the same world: the second starts in a fresh map
    (multi-sequence mode) and must be welded back into the first via
    cross-map place recognition."""
    frames, R_gt, t_gt = sequence
    n = len(frames)
    slam = System(CAM, MONOCULAR)
    ts = np.arange(n) * 0.05
    ok1 = sum(slam.track_monocular(frames[i], float(ts[i])) is not None
              for i in range(n))
    assert ok1 > 0.7 * n
    assert len(slam.atlas.maps) == 1

    slam.change_dataset()
    n2 = 30
    ts2 = ts[-n2:] + 10.0
    ok2 = 0
    for j, i in enumerate(range(n - n2, n)):
        if slam.track_monocular(frames[i], float(ts2[j])) is not None:
            ok2 += 1
    assert ok2 > 0.5 * n2
    assert len(slam.atlas.maps) == 2
    assert slam.atlas.active_id == 1
    assert slam.atlas.n_merges >= 1, "maps never merged"

    rows = slam.trajectory_tum()
    assert len(rows) > 0.7 * (n + n2)
    # joint ATE: phase-2 ground truth is the same trajectory tail, offset ts
    ts_all = np.concatenate([ts, ts2])
    gt = synth_render.camera_centers(R_gt, t_gt)
    gt_all = np.concatenate([gt, gt[-n2:]])
    est_ts = np.array([r[0] for r in rows])
    est_xyz = np.array([r[1:4] for r in rows])
    rmse, npairs, scale = evaluate_ate.ate_rmse(ts_all, gt_all, est_ts, est_xyz)
    assert npairs > 0.6 * (n + n2)
    assert rmse < 0.18, f"cross-merge ATE {rmse:.3f} m over {npairs}"


def test_reset_active_map_on_early_loss(sequence):
    """Loss in a young map (<=10 KFs) resets it in place instead of
    spawning a new one (reference: Tracking.cc:2248-2254)."""
    frames, _, _ = sequence
    cfg = TrackingConfig(recently_lost_frames=3)
    slam = System(CAM, MONOCULAR, tracking_cfg=cfg)
    ts = np.arange(len(frames)) * 0.05
    for i in range(16):
        slam.track_monocular(frames[i], float(ts[i]))
    assert slam.tracker.state == OK
    blank = np.full_like(frames[0], 128.0)
    for i in range(16, 24):
        slam.track_monocular(blank, float(ts[i]))
    # young map was reset in place, no second map
    assert len(slam.atlas.maps) == 1
    assert slam.tracker.state == NOT_INITIALIZED
    assert slam.map.n_kf == 0
    # and the system can re-initialize afterwards
    ok = 0
    for i in range(24, len(frames)):
        if slam.track_monocular(frames[i], float(ts[i])) is not None:
            ok += 1
    assert slam.map.n_kf >= 2
    assert ok > 5


def test_timestamp_jump_spawns_new_map(sequence):
    """A >1 s timestamp jump mid-run abandons tracking and starts a fresh
    map, like the reference's timestamp-jump reset (Tracking.cc:2010-2043)."""
    frames, R_gt, t_gt = sequence
    slam = System(CAM, MONOCULAR, enable_loop_closing=False)
    ts = np.arange(len(frames)) * 0.05
    for i in range(30):
        slam.track_monocular(frames[i], float(ts[i]))
    assert slam.tracker.state == OK
    maps_before = len(slam.atlas.maps)
    # jump 5 s ahead
    ok2 = 0
    for j, i in enumerate(range(30, 46)):
        if slam.track_monocular(frames[i], float(ts[i] + 5.0)) is not None:
            ok2 += 1
    # map was spawned or reset, and tracking re-established
    spawned = len(slam.atlas.maps) > maps_before
    reset = slam.map.n_kf > 0 and not spawned
    assert spawned or reset
    assert ok2 > 5


def test_async_mapping_mode(sequence):
    """Async stage overlap (reference: the LocalMapping/LoopClosing threads
    + per-map update lock): keyframe processing on a worker thread while
    tracking continues; results stay sane and shutdown drains the queue."""
    frames, R_gt, t_gt = sequence
    slam = System(CAM, MONOCULAR, async_mapping=True)
    ts = np.arange(len(frames)) * 0.05
    ok = 0
    for i in range(40):
        if slam.track_monocular(frames[i], float(ts[i])) is not None:
            ok += 1
    slam.shutdown()
    assert ok > 0.6 * 40, f"tracked {ok}/40"
    assert slam.map.n_kf >= 3
    assert slam.map.n_points > 150
    rows = slam.trajectory_tum()
    assert len(rows) > 0.6 * 40


def test_async_backpressure_bounds_queue(sequence, monkeypatch, tmp_path):
    """max_kf_lag: with a deliberately slow mapping worker, tracking must
    block rather than run unboundedly ahead — the producer-side analog of
    the reference's AcceptKeyFrames/queue gate (LocalMapping.cc:361-379).
    The queue depth observed by the worker never exceeds max_kf_lag + 1
    (the put that triggered the wait) and the wait counter engages."""
    import time
    from orb_slam3_detailed_comments_tpu.pipeline.system import System
    frames, _, _ = sequence
    slam = System(CAM, MONOCULAR, enable_loop_closing=False,
                  async_mapping=True, max_kf_lag=1)
    seen_depths = []
    orig = slam._process_keyframe

    def slow(k, ts):
        seen_depths.append(slam._kf_queue.unfinished_tasks)
        time.sleep(0.25)          # force the worker to lag tracking
        orig(k, ts)

    slam._process_keyframe = slow
    ts = np.arange(len(frames)) * 0.05
    for i in range(28):
        slam.track_monocular(frames[i], float(ts[i]))
    slam.shutdown()
    assert len(seen_depths) >= 3, "too few keyframes to exercise the bound"
    assert slam.n_backpressure_waits >= 1, "bound never engaged"
    # depth sampled at dequeue: bounded by lag + the in-flight put
    assert max(seen_depths) <= slam.max_kf_lag + 1, seen_depths
