"""Serialization (atlas save/load + checksum guard), YAML settings parsing
against a reference-format EuRoC yaml, Atlas multi-map merging, and the
native host library vs the numpy fallback."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_detailed_comments_tpu.lie import Sim3, so3
from orb_slam3_detailed_comments_tpu.mapping.atlas import Atlas
from orb_slam3_detailed_comments_tpu.mapping.mapstore import MapConfig, MapStore
from orb_slam3_detailed_comments_tpu.utils import config, serialization

CFG = MapConfig(max_kf=16, max_pt=256, n_feat=64)


def tiny_map(rng, n_kf=3, origin=0.0):
    m = MapStore(CFG)
    # points live before keyframes link to them (add_keyframe drops dead links)
    m.pt_xyz[:20] = (rng.normal(0, 1, (20, 3)) + [origin, 0, 5]).astype(np.float32)
    m.pt_valid[:20] = True
    m.pt_ref_kf[:20] = 0
    for k in range(n_kf):
        fp = np.full(64, -1, np.int32)
        fp[:20] = np.arange(20)
        m.add_keyframe(
            np.eye(3, dtype=np.float32),
            np.array([origin + 0.1 * k, 0, 0], np.float32), k * 0.1, k,
            rng.normal(300, 50, (64, 2)).astype(np.float32),
            rng.normal(0, 0.3, (64, 2)).astype(np.float32),
            rng.integers(0, 8, 64).astype(np.int32),
            np.zeros(64, np.float32),
            rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32),
            np.ones(64, bool), fp)
    m.update_point_stats(np.arange(20))
    return m


class TestSerialization:
    def test_atlas_roundtrip(self, rng, tmp_path):
        a = Atlas(CFG)
        a.maps = [tiny_map(rng), tiny_map(rng, origin=5.0)]
        a.active_id = 1
        p = str(tmp_path / "atlas.zip")
        serialization.save_atlas(a, p)
        b = serialization.load_atlas(p)
        assert b.active_id == 1
        assert len(b.maps) == 2
        np.testing.assert_array_equal(b.maps[0].pt_xyz, a.maps[0].pt_xyz)
        np.testing.assert_array_equal(b.maps[1].kf_feat_desc,
                                      a.maps[1].kf_feat_desc)
        assert b.maps[0].n_kf == 3

    def test_grown_map_and_imu_state_roundtrip(self, rng, tmp_path):
        a = Atlas(CFG)
        m = tiny_map(rng)
        m.kf_vel[:3] = rng.normal(0, 1, (3, 3)).astype(np.float32)
        m.kf_bg[:3] = 0.01
        m.kf_prev[1:3] = [0, 1]
        m.kf_pre_dT[1:3] = 0.25
        m.imu_initialized = m.imu_ba1 = True
        old_K, old_P = m.cfg.max_kf, m.cfg.max_pt
        m.grow(grow_kf=True, grow_pt=True)
        assert m.cfg.max_kf == 2 * old_K and m.cfg.max_pt == 2 * old_P
        assert m.n_kf == 3 and m.n_points == 20   # contents preserved
        assert (m.kf_frame_id[old_K:] == -1).all()
        a.maps = [m]
        p = str(tmp_path / "atlas.zip")
        serialization.save_atlas(a, p)
        b = serialization.load_atlas(p)
        m2 = b.maps[0]
        assert m2.cfg.max_kf == 2 * old_K       # grown capacity round-trips
        np.testing.assert_array_equal(m2.kf_vel, m.kf_vel)
        np.testing.assert_array_equal(m2.kf_prev, m.kf_prev)
        np.testing.assert_array_equal(m2.kf_pre_dT, m.kf_pre_dT)
        assert m2.imu_initialized and m2.imu_ba1 and not m2.imu_ba2

    def test_alloc_grows_past_capacity(self, rng):
        m = tiny_map(rng)
        K = m.cfg.max_kf
        for _ in range(K + 2):       # run past the keyframe capacity
            i = m.alloc_kf()         # (may grow; fetch kf_valid after)
            m.kf_valid[i] = True
        assert m.cfg.max_kf > K
        ids = m.alloc_points(m.cfg.max_pt)   # forces a point grow too
        assert len(ids) == m.cfg.max_pt // 2

    def test_device_kf_obs_survives_point_growth(self, rng):
        """Regression: the device_kf_obs cache held a [K, max_pt_old/32]
        point_bits array across a point-capacity grow (grow_pt leaves
        kf_feat_point's shape unchanged, so the full-rebuild guard never
        fired) and the next delta upload crashed with a shape mismatch."""
        m = tiny_map(rng)
        d0 = m.device_kf_obs()
        assert d0["point_bits"].shape[1] == m.cfg.max_pt // 32
        old_P = m.cfg.max_pt
        m.alloc_points(m.cfg.max_pt)          # forces grow(grow_pt=True)
        assert m.cfg.max_pt == 2 * old_P
        # dirty one KF row so the delta path (not the trivial no-change
        # path) runs against the grown width
        m.kf_feat_point[0, 21] = 21
        m.version += 1
        d1 = m.device_kf_obs()
        assert d1["point_bits"].shape[1] == m.cfg.max_pt // 32
        bits = np.asarray(d1["point_bits"][0])
        assert bits[21 >> 5] & np.uint32(1 << (21 & 31))

    def test_max_pt_rounds_to_word_multiple(self):
        """max_pt not divisible by 32 is rounded up (the point-membership
        bitsets need a whole number of 32-bit words)."""
        cfg = MapConfig(max_kf=8, max_pt=100, n_feat=32)
        assert cfg.max_pt == 128
        m = MapStore(cfg)
        fp = np.full((1, 32), -1, np.int32)
        fp[0, 0] = 99                          # would IndexError pre-fix
        bits = m._pack_point_bits(fp)
        assert bits.shape == (1, 4)
        assert bits[0, 99 >> 5] & np.uint32(1 << (99 & 31))

    def test_checksum_guard(self, rng, tmp_path):
        a = Atlas(CFG)
        a.maps = [tiny_map(rng)]
        p = str(tmp_path / "atlas.zip")
        serialization.save_atlas(a, p)
        # corrupt a byte in the stored npz
        import zipfile
        data = open(p, "rb").read()
        idx = data.find(b"map_0.npz") + 2000
        corrupted = data[:idx] + bytes([data[idx] ^ 0xFF]) + data[idx + 1:]
        p2 = str(tmp_path / "bad.zip")
        open(p2, "wb").write(corrupted)
        with pytest.raises(Exception):
            serialization.load_atlas(p2)


class TestConfig:
    def test_parses_reference_style_yaml(self, tmp_path):
        y = tmp_path / "euroc.yaml"
        y.write_text("""%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200.0
""")
        s = config.load_settings(str(y))
        assert abs(s.camera.fx - 458.654) < 1e-6
        assert s.camera.width == 752
        assert s.n_features == 1000
        assert s.fps == 20
        assert abs(s.camera.dist[0] + 0.28340811) < 1e-8
        assert s.imu_frequency == 200.0

    def test_fisheye_camera_type(self, tmp_path):
        y = tmp_path / "tumvi.yaml"
        y.write_text("""%YAML:1.0
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.97
Camera1.fy: 190.97
Camera1.cx: 254.93
Camera1.cy: 256.89
Camera1.k1: 0.0034
Camera1.k2: 0.0007
Camera1.k3: -0.002
Camera1.k4: 0.0002
Camera.width: 512
Camera.height: 512
""")
        s = config.load_settings(str(y))
        from orb_slam3_detailed_comments_tpu.models import cameras
        assert s.camera.kind == cameras.FISHEYE_KB8

    def test_3x4_extrinsic_and_derived_baseline(self, tmp_path):
        """TUM_512.yaml-style rigs give Stereo.T_c1_c2 as a 3x4 cv-matrix and
        no explicit baseline; the parser must pad to 4x4 and derive b=||t||
        (reference: Settings.cc readCamera2)."""
        y = tmp_path / "rig.yaml"
        y.write_text("""%YAML:1.0
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.0
Camera1.fy: 190.0
Camera1.cx: 256.0
Camera1.cy: 256.0
Camera2.fx: 190.5
Camera2.fy: 190.5
Camera2.cx: 252.0
Camera2.cy: 255.0
Camera.width: 512
Camera.height: 512
Stereo.T_c1_c2: !!opencv-matrix
   rows: 3
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, 0.101,
          0.0, 1.0, 0.0, 0.002,
          0.0, 0.0, 1.0, 0.001,]
""")
        s = config.load_settings(str(y))
        assert s.T_c1c2.shape == (4, 4)
        assert np.allclose(s.T_c1c2[3], [0, 0, 0, 1])
        assert s.camera2 is not None
        assert abs(s.baseline - np.linalg.norm([0.101, 0.002, 0.001])) < 1e-6


class TestShippedConfigs:
    """The per-dataset configs in examples/config/ (generated by
    scripts/make_dataset_configs.py) must parse into complete rigs."""

    CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "config")

    def test_all_shipped_configs_parse(self):
        names = sorted(os.listdir(self.CFG_DIR))
        assert len(names) >= 8
        for n in names:
            s = config.load_settings(os.path.join(self.CFG_DIR, n))
            assert s.camera is not None and s.camera.fx > 0, n
            assert s.n_features >= 1000 and s.n_levels == 8, n

    def test_euroc_rig(self):
        from orb_slam3_detailed_comments_tpu.models import cameras
        s = config.load_settings(os.path.join(self.CFG_DIR, "EuRoC.yaml"))
        assert s.camera.kind == cameras.PINHOLE
        assert abs(s.camera.fx - 458.654) < 1e-3
        assert s.camera2 is not None
        assert s.T_bc is not None and s.T_c1c2 is not None
        assert abs(s.baseline - 0.1101) < 1e-3   # ||t_c1c2||
        assert abs(s.imu_frequency - 200.0) < 1e-6

    def test_tumvi_rig(self):
        from orb_slam3_detailed_comments_tpu.models import cameras
        s = config.load_settings(os.path.join(self.CFG_DIR,
                                              "TUM-VI_512.yaml"))
        assert s.camera.kind == cameras.FISHEYE_KB8
        assert s.camera2 is not None and s.camera2.kind == cameras.FISHEYE_KB8
        assert s.camera.width == 512 and s.T_bc is not None

    def test_tum_rgbd_rig(self):
        s = config.load_settings(os.path.join(self.CFG_DIR, "TUM1.yaml"))
        assert abs(s.depth_map_factor - 5000.0) < 1e-6
        assert s.camera.width == 640


class TestAtlasMerge:
    def test_merge_transforms_and_copies(self, rng):
        a = Atlas(CFG)
        m0 = tiny_map(rng)                      # active
        m1 = tiny_map(rng, origin=0.0)          # same world, to be welded
        a.maps = [m0, m1]
        a.active_id = 0
        # weld with a known similarity: x_active = S x_other
        S = Sim3(jnp.asarray(np.asarray(so3.exp(jnp.asarray([0, 0.3, 0.0])))),
                 jnp.asarray([1.0, 0.0, 0.5]), jnp.asarray(2.0))
        pts_before = m1.pt_xyz[m1.pt_valid].copy()
        n_kf_before = m0.n_kf
        slot_map = a.merge_map_into_active(1, S)
        assert a.maps[0].n_kf == n_kf_before + 3
        # copied point positions transformed by S
        new_pts = a.maps[0].pt_xyz[a.maps[0].pt_valid][-20:]
        expect = 2.0 * pts_before @ np.asarray(S.R).T + np.asarray(S.t)
        np.testing.assert_allclose(new_pts, expect, atol=1e-4)
        # observations relinked
        for old, new in slot_map.items():
            assert (a.maps[0].kf_feat_point[new] >= 0).sum() == 20
        # redirect resolution works
        out = a.resolve_kf_pose(1, list(slot_map.keys())[0], 1)
        assert out is not None

    def test_merge_carries_inertial_state(self, rng):
        """Welded keyframes keep their IMU state: world velocities are
        transformed by the weld's rotation+scale (v_a = s R v_o), biases and
        body-frame preintegration copy verbatim, the mPrevKF temporal chain
        remaps into the new slots (reference: LoopClosing::MergeLocal2,
        LoopClosing.cc:2310+)."""
        a = Atlas(CFG)
        m0 = tiny_map(rng)
        m1 = tiny_map(rng, origin=0.0)
        m1.kf_vel[:3] = rng.normal(0, 1, (3, 3)).astype(np.float32)
        m1.kf_bg[:3] = rng.normal(0, 0.01, (3, 3)).astype(np.float32)
        m1.kf_ba[:3] = rng.normal(0, 0.05, (3, 3)).astype(np.float32)
        m1.kf_prev[1] = 0
        m1.kf_prev[2] = 1
        m1.kf_pre_dT[1:3] = 0.25
        m1.kf_pre_dV[1:3] = rng.normal(0, 1, (2, 3)).astype(np.float32)
        m1.kf_pre_C[1:3] = np.eye(15, dtype=np.float32) * 1e-4
        a.maps = [m0, m1]
        a.active_id = 0
        S = Sim3(jnp.asarray(np.asarray(so3.exp(jnp.asarray([0, 0.3, 0.0])))),
                 jnp.asarray([1.0, 0.0, 0.5]), jnp.asarray(2.0))
        vel_before = m1.kf_vel[:3].copy()
        slot_map = a.merge_map_into_active(1, S)
        act = a.maps[0]
        Rw, sw = np.asarray(S.R), float(S.s)
        for j in range(3):
            k = slot_map[j]
            np.testing.assert_allclose(act.kf_vel[k],
                                       sw * vel_before[j] @ Rw.T, atol=1e-5)
            np.testing.assert_array_equal(act.kf_bg[k], m1.kf_bg[j])
            np.testing.assert_array_equal(act.kf_ba[k], m1.kf_ba[j])
            np.testing.assert_array_equal(act.kf_pre_dV[k], m1.kf_pre_dV[j])
            np.testing.assert_array_equal(act.kf_pre_C[k], m1.kf_pre_C[j])
            assert act.kf_pre_dT[k] == m1.kf_pre_dT[j]
        assert act.kf_prev[slot_map[0]] == -1       # gap: no cross-map chain
        assert act.kf_prev[slot_map[1]] == slot_map[0]
        assert act.kf_prev[slot_map[2]] == slot_map[1]


class TestNativeLib:
    def test_native_matches_numpy_fallback(self, rng):
        from orb_slam3_detailed_comments_tpu import native
        if not native.available:
            pytest.skip("no native toolchain")
        m1 = tiny_map(rng)
        # numpy fallback result
        m2 = MapStore(CFG)
        for name in ("kf_R", "kf_t", "kf_valid", "kf_ts", "kf_frame_id",
                     "kf_feat_xy", "kf_feat_xyn", "kf_feat_level",
                     "kf_feat_angle", "kf_feat_desc", "kf_feat_valid",
                     "kf_feat_point", "pt_xyz", "pt_valid", "pt_ref_kf"):
            getattr(m2, name)[...] = getattr(m1, name)
        was = native.available
        native.available = False
        try:
            m2.update_point_stats(np.arange(20))
        finally:
            native.available = was
        np.testing.assert_array_equal(m1.pt_desc[:20], m2.pt_desc[:20])
        np.testing.assert_allclose(m1.pt_normal[:20], m2.pt_normal[:20], atol=1e-5)
        np.testing.assert_allclose(m1.pt_max_dist[:20], m2.pt_max_dist[:20],
                                   rtol=1e-5)


class TestStereoRectification:
    def test_legacy_left_right_blocks(self, tmp_path):
        """Legacy EuRoC-style LEFT.*/RIGHT.* rectification blocks produce
        remap grids + a rectified pinhole camera + the baseline
        (reference: Settings' precomputed maps, Settings.h:157)."""
        from orb_slam3_detailed_comments_tpu.utils import config
        y = tmp_path / "stereo.yaml"
        y.write_text("""%YAML:1.0
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.width: 752
Camera.height: 480
Camera.bf: 47.90639384423901
LEFT.width: 752
LEFT.height: 480
LEFT.K: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.D: !!opencv-matrix
  rows: 1
  cols: 5
  dt: d
  data: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
LEFT.R: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
  rows: 3
  cols: 4
  dt: d
  data: [435.2046959714599, 0.0, 367.4517211914062, 0.0,
         0.0, 435.2046959714599, 252.2008514404297, 0.0, 0.0, 0.0, 1.0, 0.0]
RIGHT.width: 752
RIGHT.height: 480
RIGHT.K: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
RIGHT.D: !!opencv-matrix
  rows: 1
  cols: 5
  dt: d
  data: [-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05, 0.0]
RIGHT.R: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
  rows: 3
  cols: 4
  dt: d
  data: [435.2046959714599, 0.0, 367.4517211914062, -47.90639384423901,
         0.0, 435.2046959714599, 252.2008514404297, 0.0, 0.0, 0.0, 1.0, 0.0]
""")
        s = config.load_settings(str(y))
        rect = config.stereo_rectify_maps(s)
        assert rect is not None
        maps_l, maps_r, cam_rect, baseline = rect
        assert maps_l[0].shape == (480, 752)
        assert abs(cam_rect.fx - 435.2046959714599) < 1e-6
        assert abs(baseline - 47.90639384423901 / 435.2046959714599) < 1e-9
        img = np.zeros((480, 752), np.float32)
        img[240, 376] = 255.0
        out = config.rectify(img, maps_l)
        assert out.shape == (480, 752)
        assert np.isfinite(out).all()


class TestResumeLocalization:
    def test_localize_against_loaded_atlas(self, rng, tmp_path):
        """Checkpoint/resume: save the atlas after a mapping session, load it
        in a fresh System, and relocalize + track in localization-only mode
        (reference: SaveAtlas/LoadAtlas + ActivateLocalizationMode,
        'session resume = localization-from-saved-map', SURVEY.md §5.4)."""
        import jax.numpy as jnp
        from orb_slam3_detailed_comments_tpu.models import cameras
        from orb_slam3_detailed_comments_tpu.pipeline.system import (
            System, MONOCULAR)
        from orb_slam3_detailed_comments_tpu.utils import synth_render
        cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                              width=752, height=480)
        world_rng = np.random.default_rng(7)
        planes = synth_render.default_world(world_rng)
        n = 30
        R, t = synth_render.orbit_trajectory(n)
        frames = [synth_render.render_frame(cam, planes, R[i], t[i])
                  for i in range(n)]
        ts = np.arange(n) * 0.05
        slam = System(cam, MONOCULAR)
        for i in range(n):
            slam.track_monocular(frames[i], float(ts[i]))
        assert slam.map.n_kf >= 3
        p = str(tmp_path / "session.zip")
        slam.save_atlas(p)

        slam2 = System(cam, MONOCULAR)
        slam2.load_atlas(p)
        assert slam2.map.n_kf == slam.map.n_kf
        slam2.activate_localization_mode()
        slam2._build_recognition()   # vocabulary from the loaded map
        for kk in slam2.map.kf_ids():
            slam2.kfdb.add(kk, slam2.map.kf_feat_desc[kk],
                           slam2.map.kf_feat_valid[kk])
        n_kf_before = slam2.map.n_kf
        ok = 0
        for i in range(10, 20):
            if slam2.track_monocular(frames[i], float(100.0 + i * 0.05)) is not None:
                ok += 1
        assert ok >= 5, f"only {ok}/10 frames localized against the loaded map"
        assert slam2.map.n_kf == n_kf_before   # map frozen


class TestDevicePointCache:
    def test_delta_uploads_match_host(self, rng):
        """device_points() must always mirror the host arrays exactly,
        through row edits (delta .at[rows].set path), bulk edits (full
        re-upload path), and capacity growth."""
        m = tiny_map(rng)
        d0 = m.device_points()
        for k, a in [("xyz", "pt_xyz"), ("desc", "pt_desc"),
                     ("valid", "pt_valid")]:
            np.testing.assert_array_equal(np.asarray(d0[k]), getattr(m, a))
        # small edit -> delta path
        m.pt_xyz[3] = [9.0, 9.0, 9.0]
        m.pt_valid[17] = True
        m.pt_desc[17] = 7
        m.version += 1
        d1 = m.device_points()
        np.testing.assert_array_equal(np.asarray(d1["xyz"]), m.pt_xyz)
        np.testing.assert_array_equal(np.asarray(d1["valid"]), m.pt_valid)
        np.testing.assert_array_equal(np.asarray(d1["desc"]), m.pt_desc)
        # no change + version bump -> cache kept, still equal
        m.version += 1
        d2 = m.device_points()
        np.testing.assert_array_equal(np.asarray(d2["xyz"]), m.pt_xyz)
        # bulk edit (>30% rows) -> full re-upload path
        m.pt_xyz[:] = rng.normal(0, 1, m.pt_xyz.shape).astype(np.float32)
        m.version += 1
        d3 = m.device_points()
        np.testing.assert_array_equal(np.asarray(d3["xyz"]), m.pt_xyz)
        # capacity growth -> fresh upload at the new shape
        m.grow(grow_pt=True)
        d4 = m.device_points()
        assert len(np.asarray(d4["valid"])) == m.cfg.max_pt
        np.testing.assert_array_equal(np.asarray(d4["xyz"]), m.pt_xyz)


class TestImageResize:
    """Camera.newWidth/newHeight: run at a working resolution different from
    the sensor's (reference: Settings.cc:436 + System.cc:285-300 resizes)."""

    YAML = """%YAML:1.0
Camera.type: "PinHole"
Camera1.fx: 400.0
Camera1.fy: 400.0
Camera1.cx: 376.0
Camera1.cy: 240.0
Camera.width: 752
Camera.height: 480
Camera.newWidth: 376
Camera.newHeight: 240
"""

    def test_intrinsics_scaled(self, tmp_path):
        p = tmp_path / "s.yaml"
        p.write_text(self.YAML)
        s = config.load_settings(str(p))
        assert s.resize_to == (376, 240)
        assert s.camera.width == 376 and s.camera.height == 240
        assert abs(s.camera.fx - 200.0) < 1e-6
        assert abs(s.camera.cx - 188.0) < 1e-6

    def test_resize_image(self):
        img = np.arange(480 * 752, dtype=np.float32).reshape(480, 752)
        out = config.resize_image(img, (376, 240))
        assert out.shape == (240, 376)
        assert config.resize_image(img, None) is img

    def test_no_resize_when_sizes_match(self, tmp_path):
        p = tmp_path / "s.yaml"
        p.write_text(self.YAML.replace("newWidth: 376", "newWidth: 752")
                     .replace("newHeight: 240", "newHeight: 480"))
        s = config.load_settings(str(p))
        assert s.resize_to is None and abs(s.camera.fx - 400.0) < 1e-6


class TestFromSettings:
    def test_from_settings_wires_configs(self):
        """System.from_settings must honor the yaml's ORB budget (padded to
        a lane-aligned capacity), pyramid, fps->KF cadence, rig and IMU
        calibration (reference: the System ctor yaml wiring, System.cc:80-265)."""
        from orb_slam3_detailed_comments_tpu.pipeline.system import (
            System, IMU_STEREO)
        p = os.path.join(TestShippedConfigs.CFG_DIR, "EuRoC.yaml")
        s = config.load_settings(p)
        slam = System.from_settings(s, IMU_STEREO)
        n_pad = int(np.ceil(s.n_features / 128.0)) * 128
        assert slam.tracker.orb_cfg.n_features == n_pad
        assert slam.tracker.orb_cfg.n_levels == s.n_levels
        assert abs(slam.tracker.orb_cfg.scale - s.scale_factor) < 1e-9
        assert slam.tracker.cfg.max_frames == int(round(s.fps))
        assert slam.map.cfg.n_feat == n_pad
        assert slam.tracker.imu is not None
        assert abs(float(np.asarray(
            slam.tracker.imu.calib.noise_gyro)) - s.imu_noise_gyro) < 1e-12
        assert slam.tracker.cfg.ref_ratio == 0.75        # stereo thRefRatio

    def test_from_settings_all_shipped(self):
        from orb_slam3_detailed_comments_tpu.pipeline.system import (
            System, MONOCULAR)
        for n in sorted(os.listdir(TestShippedConfigs.CFG_DIR)):
            s = config.load_settings(os.path.join(TestShippedConfigs.CFG_DIR, n))
            slam = System.from_settings(s, MONOCULAR)
            assert slam.tracker.orb_cfg.n_features % 128 == 0, n
            assert slam.tracker.orb_cfg.n_features >= s.n_features, n


def test_load_tum_accepts_euroc_csv(tmp_path):
    """evaluate_ate.load_tum must read the EuRoC/TUM-VI csv ground-truth
    exports the reference passes straight to evaluate_ate_scale.py
    (comma-separated, '#' header, nanosecond stamps) as well as plain TUM
    whitespace rows."""
    from orb_slam3_detailed_comments_tpu.utils import evaluate_ate
    csv = tmp_path / "data.csv"
    csv.write_text(
        "#timestamp,p_RS_R_x [m],p_RS_R_y [m],p_RS_R_z [m],q_w,q_x,q_y,q_z\n"
        "1403636580838555648,4.68,-1.78,0.68,0.53,-0.15,-0.83,-0.08\n"
        "1403636580843555328,4.69,-1.77,0.69,0.53,-0.15,-0.83,-0.08\n")
    ts, xyz = evaluate_ate.load_tum(str(csv))
    assert ts.shape == (2,) and xyz.shape == (2, 3)
    # ns stamps converted to seconds
    assert abs(ts[0] - 1403636580.838555648) < 1e-3
    assert abs(ts[1] - ts[0] - 0.005) < 1e-4
    np.testing.assert_allclose(xyz[0], [4.68, -1.78, 0.68])
    tum = tmp_path / "t.txt"
    tum.write_text("# tum\n1.0 0.1 0.2 0.3 0 0 0 1\n2.0 0.2 0.3 0.4 0 0 0 1\n")
    ts2, xyz2 = evaluate_ate.load_tum(str(tum))
    assert ts2.tolist() == [1.0, 2.0]
