"""System facade: the public API.

Replaces the reference's System class (src/System.cc:60): builds the map
(Atlas), tracker and local mapper, exposes TrackMonocular, Shutdown, and
trajectory savers. Round-1 scope: monocular pipeline, local mapping runs
synchronously after each new keyframe (the reference's thread handoff at
LocalMapping.cc:361 becomes a queue drained inline; async stage overlap is a
host-scheduling concern, not a kernel one).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..lie import SE3, so3
from ..models import cameras
from ..mapping.mapstore import MapStore, MapConfig
from .local_mapping import LocalMapper, LocalMappingConfig, full_obs_cap
from .tracking import Tracker, TrackingConfig

MONOCULAR = 0
STEREO = 1
RGBD = 2
IMU_MONOCULAR = 3
IMU_STEREO = 4
IMU_RGBD = 5


class System:
    def __init__(self, cam: cameras.CameraParams, sensor: int = MONOCULAR,
                 map_cfg: Optional[MapConfig] = None,
                 tracking_cfg: Optional[TrackingConfig] = None,
                 mapping_cfg: Optional[LocalMappingConfig] = None,
                 enable_loop_closing: bool = True,
                 vocab_path: Optional[str] = None,
                 baseline: float = 0.0, th_depth: float = 35.0,
                 imu_calib=None, camera2=None, T_c1c2=None,
                 async_mapping: bool = False, orb_cfg=None,
                 max_kf_lag: int = 1):
        if sensor not in (MONOCULAR, STEREO, RGBD,
                          IMU_MONOCULAR, IMU_STEREO, IMU_RGBD):
            raise ValueError(f"unknown sensor {sensor}")
        from ..utils import compile_cache
        compile_cache.enable()   # amortize XLA compiles across processes
        self.cam = cam
        self.sensor = sensor
        self.inertial = sensor in (IMU_MONOCULAR, IMU_STEREO, IMU_RGBD)
        if self.inertial and imu_calib is None:
            from ..imu.preintegration import ImuCalib
            imu_calib = ImuCalib.default()
        from ..mapping.atlas import Atlas
        self.atlas = Atlas(map_cfg or MapConfig())
        self.map = self.atlas.active
        from .tracking import SENSOR_MONO, SENSOR_RGBD, SENSOR_STEREO
        tsensor = {MONOCULAR: SENSOR_MONO, STEREO: SENSOR_STEREO,
                   RGBD: SENSOR_RGBD, IMU_MONOCULAR: SENSOR_MONO,
                   IMU_STEREO: SENSOR_STEREO, IMU_RGBD: SENSOR_RGBD}[sensor]
        T_rl = None
        if T_c1c2 is not None:
            # yaml gives T_c1_c2 (right-in-left); the matcher wants left->right
            T_rl = np.linalg.inv(np.asarray(T_c1c2, np.float64)).astype(
                np.float32)
        if tracking_cfg is None:
            tracking_cfg = TrackingConfig()
            if tsensor != SENSOR_MONO:
                # thRefRatio: 0.9 mono / 0.75 stereo-RGBD (Tracking.cc:3737)
                tracking_cfg.ref_ratio = 0.75
        self.tracker = Tracker(cam, self.map, tracking_cfg,
                               orb_cfg=orb_cfg,
                               sensor=tsensor, bf=baseline * cam.fx,
                               th_depth=th_depth,
                               imu_calib=imu_calib if self.inertial else None,
                               cam2=camera2, T_rl=T_rl)
        if mapping_cfg is None:
            # sensor-dependent reference defaults: cnThObs 2 mono / 3
            # stereo-RGBD (LocalMapping.cc:461), 10 triangulation neighbors
            # for stereo vs mono's wider window (LocalMapping.cc:510)
            mapping_cfg = LocalMappingConfig()
            if tsensor != SENSOR_MONO:
                mapping_cfg.cull_min_obs = 3
                mapping_cfg.n_covis_triangulate = 10
        self.local_mapper = LocalMapper(self.map, cam, mapping_cfg)
        if self.inertial:
            from .inertial import run_local_inertial_ba
            self.local_mapper.inertial_ba = (
                lambda: run_local_inertial_ba(
                    self.map, self.cam, calib=self.tracker.imu.calib))
            self._viba_stage = 0   # 0: not init, 1: init done, 2: VIBA1, 3: VIBA2
            self._last_scale_refine = 0.0
        self.enable_loop_closing = enable_loop_closing
        self.loop_closer = None
        self.kfdb = None
        self.vocab = None
        self.kfdbs: dict = {}          # map_id -> KeyFrameDatabase
        self._vocab_path = vocab_path
        self._kfdb_pending: list = []
        self._change_dataset_pending = False
        self._is_shutdown = False
        self._last_big_change = 0
        self.image_scale = 1.0   # Camera.newWidth/width (System::GetImageScale)
        if vocab_path is not None:
            self._build_recognition(vocab_path=vocab_path)
        if enable_loop_closing or True:
            self.tracker.relocalizer = self._relocalize
        # async stage overlap (reference: the LocalMapping/LoopClosing
        # threads + the per-map update lock, Map.h:141): keyframe work runs
        # on a worker thread; tracking overlaps its (map-free) feature
        # extraction with it and takes the lock for the map-dependent part
        import threading
        self.map_lock = threading.RLock()
        self.tracker.map_lock = self.map_lock
        self._async = async_mapping
        self._kf_queue = None
        self._worker = None
        # async backpressure: tracking may run at most this many unprocessed
        # keyframes ahead of the mapping worker. Unbounded, frames track
        # against an arbitrarily stale map when the host scheduler starves
        # the worker (VERDICT r4: measured up to ~4-6x the sync KF ATE on
        # the 520-frame gauntlet). The reference's tracker reads the mapping
        # queue before inserting (LocalMapping.cc:361-379 + the
        # AcceptKeyFrames/InterruptBA gate, Tracking.cc:3740); here the
        # producer blocks briefly at the bound instead — same staleness
        # budget, no dropped keyframes. Measured on the 520-frame gauntlet
        # (r5, XLA:CPU where one KF event costs 10-30 frame-times — far
        # harsher than the deployed TPU ratio of ~4 frame-times): lag=3
        # never binds and async KF ATE draws 0.008-0.056; lag=1 binds (107
        # waits) and lands at 0.0125 vs sync 0.0134 — racing at sync-grade
        # accuracy. Default 1.
        self.max_kf_lag = max(int(max_kf_lag), 1)
        self.n_backpressure_waits = 0
        if async_mapping:
            import queue
            self._kf_queue = queue.Queue()
            self._worker = threading.Thread(target=self._mapping_worker,
                                            daemon=True)
            self._worker.start()

    # ------------------------------------------------------------------
    def _has_bundled_vocab(self) -> bool:
        if self.vocab is not None or self._vocab_path is not None:
            return True
        import os
        from ..placerec import vocab as vocab_mod
        return os.path.exists(os.path.join(
            os.path.dirname(vocab_mod.__file__), "default_vocab.npz"))

    def _build_recognition(self, vocab_path=None):
        """Create the vocabulary + keyframe database. Without a pretrained
        vocabulary file (the reference ships ORBvoc.txt; we can't), train one
        from the descriptors collected so far. The vocabulary is shared by
        all maps; each map has its own inverted-index database."""
        from ..placerec import vocab as vocab_mod
        from ..placerec.keyframe_db import KeyFrameDatabase
        from .loop_closing import LoopCloser
        if self.vocab is None:
            if vocab_path is not None:
                self.vocab = vocab_mod.load(vocab_path)
            else:
                # bundled pretrained vocabulary (trained offline on diverse
                # synthetic imagery; the analog of shipping ORBvoc.txt);
                # fall back to training from this run's descriptors
                import os
                default = os.path.join(os.path.dirname(vocab_mod.__file__),
                                       "default_vocab.npz")
                if os.path.exists(default):
                    self.vocab = vocab_mod.load(default)
                else:
                    kfs = self.map.kf_ids()
                    descs = self.map.kf_feat_desc[kfs][
                        self.map.kf_feat_valid[kfs]]
                    self.vocab = vocab_mod.train(np.asarray(descs),
                                                 k=10, levels=3)
        self.kfdb = KeyFrameDatabase(self.vocab, self.map.cfg.max_kf)
        self.kfdbs[self.map.map_id] = self.kfdb
        from .loop_closing import LoopClosingConfig
        self.loop_closer = LoopCloser(
            self.map, self.cam, self.kfdb,
            LoopClosingConfig(
                async_gba=self._async,
                # metric-depth sensors: loop/merge Sim3 solved at s=1
                # (reference: mbFixScale for STEREO/RGBD/IMU_STEREO/IMU_RGBD)
                fix_scale=self.sensor in (STEREO, RGBD, IMU_STEREO,
                                          IMU_RGBD)))
        # in async mode the post-closure global BA races tracking on its
        # own thread (reference: mpThreadGBA) and applies under the map lock
        self.loop_closer.map_lock = self.map_lock
        if self.inertial:
            # post-loop GBA becomes the full-map visual-inertial problem
            # (reference: FullInertialBA in RunGlobalBundleAdjustment)
            self.loop_closer.imu_calib = self.tracker.imu.calib

    @classmethod
    def from_settings(cls, s, sensor: int = MONOCULAR, **overrides):
        """Build a System from parsed Settings — the reference System ctor's
        yaml wiring (System.cc:80-265): ORB budget/pyramid/thresholds, fps →
        keyframe cadence, stereo rig (baseline / Camera2 + T_c1_c2), IMU
        noise + Tbc, loop-closing switch. Keyword overrides win (e.g.
        camera=rectified_cam for the legacy rectification path)."""
        from ..mapping.mapstore import MapConfig
        from ..ops.extractor import OrbConfig
        from .tracking import TrackingConfig
        # pad the feature budget to a multiple of 128: the fused Pallas
        # Hamming kernel and MXU tiling want lane-aligned capacities
        n_feat = int(int(np.ceil(s.n_features / 128.0)) * 128)
        tcfg = TrackingConfig(n_features=n_feat,
                              max_frames=max(1, int(round(s.fps))),
                              insert_kfs_when_lost=s.insert_kfs_when_lost)
        if sensor not in (MONOCULAR, IMU_MONOCULAR):
            tcfg.ref_ratio = 0.75   # thRefRatio (Tracking.cc:3737)
        orb = OrbConfig(n_features=n_feat, n_levels=s.n_levels,
                        scale=s.scale_factor, ini_th=s.ini_th_fast,
                        min_th=s.min_th_fast)
        mcfg = MapConfig(n_feat=n_feat, n_levels=s.n_levels,
                         scale=s.scale_factor)
        imu_calib = None
        if sensor in (IMU_MONOCULAR, IMU_STEREO, IMU_RGBD):
            import jax.numpy as jnp
            from ..imu.preintegration import ImuCalib
            if s.T_bc is not None:
                R_bc = jnp.asarray(s.T_bc[:3, :3])
                t_bc = jnp.asarray(s.T_bc[:3, 3])
            else:
                R_bc, t_bc = jnp.eye(3), jnp.zeros(3)
            imu_calib = ImuCalib(
                noise_gyro=s.imu_noise_gyro, noise_acc=s.imu_noise_acc,
                walk_gyro=s.imu_walk_gyro, walk_acc=s.imu_walk_acc,
                R_bc=R_bc, t_bc=t_bc)
        kw = dict(map_cfg=mcfg, tracking_cfg=tcfg, orb_cfg=orb,
                  enable_loop_closing=s.loop_closing,
                  baseline=s.baseline, th_depth=s.th_depth,
                  imu_calib=imu_calib, camera2=s.camera2, T_c1c2=s.T_c1c2)
        cam = overrides.pop("camera", s.camera)
        kw.update(overrides)
        sys_ = cls(cam, sensor, **kw)
        if getattr(s, "resize_to", None) is not None:
            # the factor callers divide pixel I/O by (System::GetImageScale,
            # System.cc:285-300: cv::resize by mImageScale)
            sys_.image_scale = float(s.resize_to[0]) / float(
                getattr(s, "orig_width", s.resize_to[0]))
        return sys_

    def track_monocular(self, img: np.ndarray, ts: float,
                        imu=None) -> Optional[np.ndarray]:
        """Feed one grayscale frame; returns 4x4 T_cw or None. imu: optional
        (acc [M,3], gyro [M,3], t [M]) samples since the previous frame
        (reference: System::TrackMonocular, System.cc:441)."""
        pose = self.tracker.track_monocular(img, ts, imu_meas=imu)
        return self._post_track(pose, ts)

    def track_monocular_iter(self, items):
        """Online pipelined ingestion: dispatch the NEXT frame's ORB
        extraction before walking the current frame's tracking stages, so
        the device computes frame i+1's pyramid/FAST/BRIEF while the host
        blocks on frame i's packed transfers (XLA dispatch is asynchronous —
        the device queue stays full instead of idling during host logic).
        items yields (img, ts) or (img, ts, imu); yields the same poses as
        track_monocular, bit-for-bit (extraction is pure, so dispatch order
        does not change any result).

        (No reference equivalent: the reference's per-frame chain is
        strictly sequential; this is the TPU-native latency-hiding form.)"""
        import jax.numpy as jnp
        from . import kernels
        from ..utils import timing
        it = iter(items)
        prev = None   # (prep, ts, imu)
        while True:
            item = next(it, None)
            if item is not None:
                img, ts = item[0], item[1]
                imu = item[2] if len(item) > 2 else None
                with timing.span("ORB extraction"):
                    prep = kernels.prepare_frame(
                        jnp.asarray(img, jnp.float32), self.cam,
                        self.tracker.orb_cfg)
                cur = (prep, float(ts), imu)
            else:
                cur = None
            if prev is not None:
                prep_p, ts_p, imu_p = prev
                pose = self.tracker.track_prepared(prep_p, ts_p,
                                                   imu_meas=imu_p)
                yield self._post_track(pose, ts_p)
            if cur is None:
                return
            prev = cur

    def track_stereo_iter(self, items):
        """Pipelined stereo/RGB-D-free ingestion, the stereo analog of
        track_monocular_iter: items yields (img_l, img_r, ts) or
        (img_l, img_r, ts, imu); the pair's extraction + row matching is
        dispatched one frame ahead. Bit-identical to track_stereo."""
        import jax.numpy as jnp
        from . import kernels
        from ..utils import timing
        it = iter(items)
        prev = None
        while True:
            item = next(it, None)
            if item is not None:
                img_l, img_r, ts = item[0], item[1], item[2]
                imu = item[3] if len(item) > 3 else None
                tk = self.tracker
                with timing.span("ORB extraction"):
                    if tk.cam2 is not None:
                        T = np.asarray(tk.T_rl)
                        prep, depth, _ = kernels.prepare_frame_stereo_fisheye(
                            jnp.asarray(img_l, jnp.float32),
                            jnp.asarray(img_r, jnp.float32),
                            tk.cam, tk.cam2,
                            jnp.asarray(T[:3, :3], jnp.float32),
                            jnp.asarray(T[:3, 3], jnp.float32), tk.orb_cfg)
                    else:
                        prep, depth, _ = kernels.prepare_frame_stereo(
                            jnp.asarray(img_l, jnp.float32),
                            jnp.asarray(img_r, jnp.float32),
                            tk.cam, tk.bf, tk.orb_cfg,
                            tk.orb_cfg.n_levels, tk.orb_cfg.scale)
                cur = (prep, depth, float(ts), imu)
            else:
                cur = None
            if prev is not None:
                prep_p, depth_p, ts_p, imu_p = prev
                pose = self.tracker.track_prepared_stereo(
                    prep_p, depth_p, ts_p, imu_meas=imu_p)
                yield self._post_track(pose, ts_p)
            if cur is None:
                return
            prev = cur

    def track_monocular_batch(self, imgs, stamps, imu_seq=None,
                              mesh=None) -> list:
        """Offline/bulk ingestion: fan ORB extraction out over a device mesh
        (pure data parallelism — SURVEY §2.9 'frames fanned out per chip'),
        then run the sequential tracking state machine over the prepared
        frames. Returns [T_cw or None] per frame; identical output to
        frame-by-frame track_monocular. mesh defaults to all local devices.

        (No reference equivalent: the reference is strictly online. This is
        the TPU-native throughput path for mapping recorded sequences.)"""
        import jax
        from jax.sharding import Mesh
        from ..parallel import batch_extract
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (batch_extract.FRAME_AXIS,))
        from ..utils import timing
        with timing.span("ORB extraction"):   # amortized batch prepare
            preps = batch_extract.prepare_frames(
                mesh, self.cam, self.tracker.orb_cfg, np.asarray(imgs))
        out = []
        for i, prep in enumerate(preps):
            imu = None if imu_seq is None else imu_seq[i]
            pose = self.tracker.track_prepared(prep, float(stamps[i]),
                                               imu_meas=imu)
            out.append(self._post_track(pose, float(stamps[i])))
        return out

    def track_stereo(self, img_l: np.ndarray, img_r: np.ndarray,
                     ts: float, imu=None) -> Optional[np.ndarray]:
        """(reference: System::TrackStereo, System.cc:277)"""
        pose = self.tracker.track_stereo(img_l, img_r, ts, imu_meas=imu)
        return self._post_track(pose, ts)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   ts: float, imu=None) -> Optional[np.ndarray]:
        """(reference: System::TrackRGBD, System.cc:361)"""
        pose = self.tracker.track_rgbd(img, depth, ts, imu_meas=imu)
        return self._post_track(pose, ts)

    def _post_track(self, pose, ts: float = 0.0):
        while self.tracker.new_keyframes:
            k = self.tracker.new_keyframes.pop(0)
            if self._async:
                self._kf_queue.put((k, ts))
                # bounded staleness: wait (off the map lock) until the
                # worker is within max_kf_lag keyframes of tracking
                if self._kf_queue.unfinished_tasks > self.max_kf_lag:
                    import time as _time
                    self.n_backpressure_waits += 1
                    while (self._kf_queue.unfinished_tasks > self.max_kf_lag
                           and self._worker is not None
                           and self._worker.is_alive()):
                        _time.sleep(0.002)
            else:
                self._process_keyframe(k, ts)
        from .tracking import LOST
        if ((self.tracker.state == LOST and not self.tracker.localization_only)
                or self._change_dataset_pending):
            if self._async:
                self.wait_idle()
            with self.map_lock:
                self._spawn_or_reset_map()
            self._change_dataset_pending = False
        return pose

    def _process_keyframe(self, k: int, ts: float):
        """One LocalMapping + LoopClosing iteration for keyframe k
        (the body of the reference's mapping/loop threads)."""
        if self.map.kf_valid[k] and self.map.n_kf > 2:
            self.local_mapper.process_keyframe(k)
        if self.enable_loop_closing:
            # the reference's LoopClosing thread detects from the FIRST
            # keyframe (ORBvoc.txt exists at startup; merge detection has
            # no min-map-size gate, LoopClosing.cc:383) — the bundled
            # default vocabulary gives us the same. Only the no-vocab
            # fallback (train from this run's descriptors) needs material:
            # wait for 3 keyframes then.
            min_kf = 1 if self._has_bundled_vocab() else 3
            if self.loop_closer is None and self.map.n_kf >= min_kf:
                self._build_recognition()
                for kk in self._kfdb_pending:
                    if self.map.kf_valid[kk]:
                        self.kfdb.add(kk, self.map.kf_feat_desc[kk],
                                      self.map.kf_feat_valid[kk])
                self._kfdb_pending.clear()
            if self.loop_closer is not None:
                if self.map.kf_valid[k]:
                    self.loop_closer.process_keyframe(k)
                    self._detect_merge(k)
            else:
                self._kfdb_pending.append(k)
        if self.inertial:
            self._imu_schedule(ts)

    def _mapping_worker(self):
        while True:
            item = self._kf_queue.get()
            if item is None:
                self._kf_queue.task_done()
                return
            k, ts = item
            try:
                with self.map_lock:
                    self._process_keyframe(k, ts)
            finally:
                self._kf_queue.task_done()

    def wait_idle(self):
        """Block until the mapping worker has drained its queue and any
        racing global BA has applied its result."""
        if self._async and self._kf_queue is not None:
            self._kf_queue.join()
        if self.loop_closer is not None:
            self.loop_closer.wait_gba()

    # ------------------------------------------------------------------
    def change_dataset(self):
        """Force a fresh map for the next sequence (reference: the
        multi-sequence mode of the examples, System::ChangeDataset,
        mono_euroc.cc:173-183)."""
        self._change_dataset_pending = True

    def _spawn_or_reset_map(self):
        """Unrecoverable loss: keep a rich map and start a new one, or reset
        a poor one in place (reference: Tracking.cc:2248-2262 — new map if
        the active map has >10 KFs, else ResetActiveMap)."""
        from ..mapping.mapstore import MapStore
        if self.map.n_kf > 10 or self._change_dataset_pending:
            new_map = self.atlas.create_new_map()
        else:
            mid = self.atlas.active_id
            old = self.atlas.maps[mid]
            self.atlas.maps[mid] = MapStore(self.atlas.map_cfg)
            self.atlas.maps[mid].map_id = mid
            self.atlas.maps[mid].big_change_idx = old.big_change_idx
            # purge the dead map's rows from the frame-pose log: the fresh
            # store reuses (slot, epoch=0) keys (Tracking::ResetActiveMap)
            self.tracker.trajectory = [
                r for r in self.tracker.trajectory if r[1] != mid]
            new_map = self.atlas.maps[mid]
        if self.loop_closer is not None:
            self.loop_closer.abort_gba()   # stale map: discard a racing GBA
        self.map = new_map
        self.tracker.reset_for_new_map(new_map)
        self.local_mapper.map = new_map
        self.local_mapper.recent_points.clear()
        if self.inertial:
            self._viba_stage = 0
            self._last_scale_refine = 0.0
        # fresh per-map recognition database (shared vocabulary)
        self.loop_closer = None
        self.kfdb = None
        self._kfdb_pending.clear()

    def _detect_merge(self, k: int):
        """Query stored maps for the current keyframe; on a verified Sim3,
        weld that map into the active one (reference:
        LoopClosing::NewDetectCommonRegions merge branch + MergeLocal,
        LoopClosing.cc:1590)."""
        if len(self.atlas.maps) < 2:
            return
        from ..lie import Sim3
        from .loop_closing import verify_sim3_pair
        import jax.numpy as jnp
        act = self.map
        for mid, other in enumerate(self.atlas.maps):
            if mid == self.atlas.active_id or other.n_kf < 3:
                continue
            db = self.kfdbs.get(mid)
            if db is None:
                continue
            cands = db.detect_relocalization_candidates(
                other, act.kf_feat_desc[k], act.kf_feat_valid[k])
            for c in cands[:3]:
                out = verify_sim3_pair(act, k, other, int(c), self.cam,
                                       self.loop_closer.cfg)
                if out is None:
                    continue
                c, S_kc = out
                # S_ao: other-world -> active-world =
                #       T_k^-1 ∘ S_kc ∘ T_c
                T_k = Sim3(jnp.asarray(act.kf_R[k]), jnp.asarray(act.kf_t[k]),
                           jnp.asarray(1.0))
                T_c = Sim3(jnp.asarray(other.kf_R[int(c)]),
                           jnp.asarray(other.kf_t[int(c)]), jnp.asarray(1.0))
                S_ao = T_k.inverse().compose(S_kc).compose(T_c)
                # inertial weld: both worlds are gravity-aligned (z up), so
                # roll/pitch of the true weld are zero — force yaw-only at
                # unit scale after the first inertial BA (reference:
                # LoopClosing.cc:182-189 mSold_new yaw projection)
                if (self.inertial and act.imu_initialized
                        and other.imu_initialized and act.imu_ba1):
                    phi = np.array(so3.log(S_ao.R))  # owned writable copy
                    phi[0] = phi[1] = 0.0
                    S_ao = Sim3(jnp.asarray(
                        so3.exp(jnp.asarray(phi, jnp.float32))),
                        S_ao.t, jnp.asarray(1.0))
                # the reference stops a running GBA before welding
                # (MergeLocal sets mbStopGBA); the merge rewrites the
                # snapshot the solve was taken from
                self.loop_closer.abort_gba()
                act_kfs_before = [int(x) for x in act.kf_ids()]
                other_inertial = bool(other.imu_initialized)
                slot_map = self.atlas.merge_map_into_active(mid, S_ao)
                # index the welded keyframes in the active map's database
                for old, new in slot_map.items():
                    self.kfdb.add(new, act.kf_feat_desc[new],
                                  act.kf_feat_valid[new])
                self.kfdbs.pop(mid, None)
                # fuse duplicate landmarks across the weld seam — the same
                # physical points exist in both maps around the merge
                # keyframe (reference: MergeLocal's SearchAndFuse over the
                # welded window, LoopClosing.cc:1590+ / 2689)
                self.loop_closer._fuse_loop_points(k, slot_map[int(c)])
                # pose snapshot: the merge essential graph measures its
                # edges against the pre-refinement (post-weld) geometry
                snap_R, snap_t = act.kf_R.copy(), act.kf_t.copy()
                # weld-region refinement: visual-inertial when both maps
                # carry initialized IMU state (reference: MergeInertialBA,
                # LoopClosing.cc:2127), else the visual welding BA
                window = None
                if (self.inertial and act.imu_initialized
                        and other_inertial):
                    from .inertial import run_merge_inertial_ba
                    window = run_merge_inertial_ba(
                        act, self.cam, k, slot_map[int(c)],
                        self.tracker.imu.calib)
                if window is None:
                    from .local_mapping import run_local_ba
                    window = [k] + list(slot_map.values())[:12]
                    run_local_ba(act, window, fixed=[k], cam=self.cam,
                                 iters=6)
                # merge essential graph: spread the weld refinement to the
                # rest of the merged map (reference: the merge overload of
                # OptimizeEssentialGraph, LoopClosing.cc:2234)
                from .loop_closing import run_merge_essential_graph
                fixed_ids = set(act_kfs_before) | set(int(w) for w in window)
                run_merge_essential_graph(
                    act, snap_R, snap_t, fixed_ids,
                    inertial=act.imu_initialized,
                    fix_scale=self.loop_closer.cfg.fix_scale)
                act.update_point_stats(np.where(act.pt_valid)[0])
                return

    # ------------------------------------------------------------------
    def _imu_schedule(self, ts: float):
        """Staged IMU initialization (reference: LocalMapping.cc:236-310:
        InitializeIMU with decreasing priors, then VIBA1 at t>5 s and VIBA2
        at t>15 s)."""
        from .inertial import try_initialize_imu, run_full_inertial_ba
        m = self.map
        imu = self.tracker.imu
        # stereo/RGB-D maps are already metric: hold scale at 1 (reference:
        # InitializeIMU's bFixedScale = sensor != MONOCULAR)
        fix_scale = self.sensor in (IMU_STEREO, IMU_RGBD)
        if self._viba_stage == 0:
            out = try_initialize_imu(m, min_kf=8, min_time=1.0,
                                     prior_gyro=1e2, prior_acc=1e6,
                                     fix_scale=fix_scale, calib=imu.calib)
            if out is None:
                return
            R_wg, s = out
            self.tracker.on_map_transformed(np.asarray(R_wg), float(s))
            # full-map visual-inertial BA closes every IMU-init stage
            # (reference: FullInertialBA(100 it) at InitializeIMU's end,
            # LocalMapping.cc:1760-1800)
            run_full_inertial_ba(m, self.cam, iters=12,
                                 prior_gyro=1e2, prior_acc=1e6,
                                 max_obs=full_obs_cap(m), calib=imu.calib)
            self._viba_stage = 1
            self._t_init = ts
            return
        t_since = ts - self._t_init
        if self._viba_stage == 1 and t_since > 5.0:
            out = try_initialize_imu(m, min_kf=8, min_time=1.0,
                                     prior_gyro=1.0, prior_acc=1e5,
                                     fix_scale=fix_scale, calib=imu.calib)
            if out is not None:
                R_wg, s = out
                self.tracker.on_map_transformed(np.asarray(R_wg), float(s))
                run_full_inertial_ba(m, self.cam, iters=12,
                                     prior_gyro=1.0, prior_acc=1e5,
                                     max_obs=full_obs_cap(m),
                                     calib=imu.calib)
            self._viba_stage = 2
            m.imu_ba1 = True
        elif self._viba_stage == 2 and t_since > 15.0:
            out = try_initialize_imu(m, min_kf=8, min_time=1.0,
                                     prior_gyro=0.0, prior_acc=0.0,
                                     fix_scale=fix_scale, calib=imu.calib)
            if out is not None:
                R_wg, s = out
                self.tracker.on_map_transformed(np.asarray(R_wg), float(s))
                run_full_inertial_ba(m, self.cam, iters=12,
                                     prior_gyro=0.0, prior_acc=0.0,
                                     max_obs=full_obs_cap(m),
                                     calib=imu.calib)
            self._viba_stage = 3
            m.imu_ba2 = True
        elif (self._viba_stage >= 3 and self.sensor == IMU_MONOCULAR
              and m.n_kf <= 200 and 25.0 <= t_since <= 75.0
              and t_since - self._last_scale_refine >= 10.0):
            # mono scale refinement: periodic scale/gravity-only re-solve
            # while the map is young (reference: LocalMapping.cc:295-310
            # ScaleRefinement -> Optimizer::InertialOptimization(scale,Rwg),
            # Optimizer.cc:4067). Huge bias priors pin the biases so only
            # scale/gravity/velocities move.
            self._last_scale_refine = t_since
            out = try_initialize_imu(m, min_kf=8, min_time=1.0,
                                     prior_gyro=1e6, prior_acc=1e8,
                                     fix_scale=False, calib=imu.calib)
            if out is not None:
                R_wg, s = out
                self.tracker.on_map_transformed(np.asarray(R_wg), float(s))

    # ------------------------------------------------------------------
    def _relocalize(self, prep):
        """Relocalization callback for the tracker: KFDB candidates ->
        descriptor matching vs candidate map points -> batched PnP RANSAC ->
        pose-optimization rescue rounds: if the optimized inlier count is
        short, a wide (r=10) guided projection search over the candidate's
        local map re-feeds the optimizer, then a narrow (r=3) retry; accept
        only at >= `reloc_accept` inliers
        (reference: Tracking::Relocalization, Tracking.cc:4324-4540)."""
        if self.kfdb is None:
            return None
        import jax
        import jax.numpy as jnp
        from ..lie import SE3
        from ..optim import pose_opt
        from ..placerec import pnp
        from ..ops import matching as matching_mod
        from . import kernels
        m = self.map
        tk = self.tracker
        desc = np.asarray(prep.feat.desc)
        fvalid = np.asarray(prep.feat.valid)
        reloc_accept = 50   # nGood acceptance (Tracking.cc:4536)
        cands = self.kfdb.detect_relocalization_candidates(m, desc, fvalid)

        def optimize(match_pt, R, t):
            """PoseOptimization over the current feature->point matches."""
            has = match_pt >= 0
            safe = np.where(has, match_pt, 0)
            res = pose_opt.pose_optimization(
                SE3(jnp.asarray(R), jnp.asarray(t)),
                jnp.asarray(m.pt_xyz[safe]), prep.xy_ud,
                jnp.asarray(tk.inv_sigma2)[prep.feat.level],
                jnp.asarray(has) & prep.feat.valid, self.cam)
            n, inl, Ro, to = jax.device_get(
                (res.n_inliers, res.inlier, res.T_cw.R, res.T_cw.t))
            return int(n), np.where(inl, match_pt, -1).astype(np.int32), Ro, to

        def guided_search(local_pts, R, t, radius, match_pt):
            """Project the candidate's local map and guided-match features
            that are still unmatched (the SearchByProjection rescue,
            Tracking.cc:4472-4530)."""
            cap = tk.cfg.local_pts_cap
            local_pts = local_pts[:cap]
            ids = np.concatenate(
                [local_pts, np.full(cap - len(local_pts), -1, np.int64)])
            safe = np.where(ids >= 0, ids, 0)
            T = SE3(jnp.asarray(R), jnp.asarray(t))
            proj = kernels.project_points(
                T, jnp.asarray(m.pt_xyz[safe]), jnp.asarray(m.pt_normal[safe]),
                jnp.asarray(m.pt_min_dist[safe]),
                jnp.asarray(m.pt_max_dist[safe]),
                jnp.asarray((ids >= 0) & m.pt_valid[safe]), self.cam,
                m.cfg.scale, m.cfg.n_levels)
            res = matching_mod.search_by_projection(
                proj.uv, proj.visible, jnp.asarray(m.pt_desc[safe]),
                proj.level, prep.feat._replace(xy=prep.xy_ud),
                radius * jnp.asarray(tk.radius_scale)[proj.level],
                max_dist=matching_mod.TH_HIGH, ratio=0.9)
            valid, fidx = jax.device_get((res.valid, res.idx))
            out = match_pt.copy()
            for p_i in np.where(valid)[0]:
                f = int(fidx[p_i])
                if out[f] < 0:
                    out[f] = ids[p_i]
            return out

        for c in cands:
            res = matching_mod.match_nn(
                jnp.asarray(desc), jnp.asarray(fvalid),
                jnp.asarray(m.kf_feat_desc[c]),
                jnp.asarray(m.kf_feat_valid[c] & (m.kf_feat_point[c] >= 0)),
                max_dist=75, ratio=0.9, mutual=True)
            valid, ridx = jax.device_get((res.valid, res.idx))
            if valid.sum() < 15:
                continue
            fidx = np.where(valid)[0]
            pids = m.kf_feat_point[c][ridx[fidx]]
            ok = (pids >= 0) & m.pt_valid[pids]
            fidx, pids = fidx[ok], pids[ok]
            if len(fidx) < 15:
                continue
            N = prep.feat.capacity
            X = np.zeros((N, 3), np.float32)
            xn = np.zeros((N, 2), np.float32)
            mask = np.zeros(N, bool)
            X[fidx] = m.pt_xyz[pids]
            xn[fidx] = np.asarray(prep.xyn)[fidx]
            mask[fidx] = True
            sol = pnp.solve_pnp_ransac(
                jnp.asarray(X), jnp.asarray(xn), jnp.asarray(mask),
                jax.random.PRNGKey(int(c)), focal=float(self.cam.fx))
            if not bool(sol.ok):
                continue
            match_pt = np.full(N, -1, np.int32)
            inl = np.asarray(sol.inliers)
            match_pt[fidx] = np.where(inl[fidx], pids, -1)
            # rescue round 1: optimize the RANSAC pose
            n_good, match_pt, R, t = optimize(match_pt, np.asarray(sol.R),
                                              np.asarray(sol.t))
            if n_good < 10:
                continue
            if n_good < reloc_accept:
                # the candidate's local map (c + covisibles)
                covis_c, _ = m.covisibility(int(c), min_weight=10)
                local_pts = m.local_point_ids(
                    np.asarray([int(c)] + [int(x) for x in covis_c[:10]]))
                for radius in (10.0, 3.0):
                    if n_good >= reloc_accept:
                        break
                    match_pt = guided_search(local_pts, R, t, radius,
                                             match_pt)
                    if (match_pt >= 0).sum() < reloc_accept:
                        continue
                    n_good, match_pt, R, t = optimize(match_pt, R, t)
            if n_good < reloc_accept:
                continue
            return R, t, match_pt, c
        return None

    def warmup(self, n_frames: int = 14):
        """Precompile the per-frame device programs before real data
        arrives: track a short rendered synthetic sequence on a THROWAWAY
        System with identical static configuration (camera statics, ORB
        config, map capacities). jit caches are process-global and keyed on
        those statics, so this instance's first real frames then hit warm
        caches instead of paying ~tens of seconds of XLA compiles.

        (no reference equivalent — XLA-specific serving concern)"""
        from ..utils import synth_render
        rng = np.random.default_rng(0)
        planes = synth_render.default_world(rng, tex_size=600)
        windows = None
        if self.inertial:
            # exactly consistent IMU so the staged IMU init SUCCEEDS in the
            # shadow run — only then do the inertial tracking programs
            # (pose_inertial_optimization + the marginal-prior LastFrame
            # variant) get compiled. The shadow uses an identity body-camera
            # extrinsic: compiled programs are keyed on SHAPES, so the cache
            # carries over to any real Tbc.
            n_frames = max(n_frames, 40)
            traj = synth_render.inertial_trajectory(n_frames)
            R, t = traj["R_cw"], traj["t_cw"]
            ts_all = np.asarray(traj["ts"], np.float64)
            windows = traj["windows"]
        else:
            R, t = synth_render.orbit_trajectory(n_frames)
            ts_all = np.arange(n_frames) / 10.0
        warm_calib = None
        if self.tracker.imu is not None:
            import dataclasses as _dc
            import jax.numpy as jnp
            c = self.tracker.imu.calib
            warm_calib = (c._replace(R_bc=jnp.eye(3), t_bc=jnp.zeros(3))
                          if hasattr(c, "_replace") else
                          _dc.replace(c, R_bc=jnp.eye(3), t_bc=jnp.zeros(3)))
        T_c1c2 = (None if self.tracker.T_rl is None
                  else np.linalg.inv(np.asarray(self.tracker.T_rl,
                                                np.float64)).astype(np.float32))
        shadow = System(self.cam, self.sensor,
                        imu_calib=warm_calib,
                        map_cfg=self.atlas.map_cfg,
                        tracking_cfg=self.tracker.cfg,
                        mapping_cfg=self.local_mapper.cfg,
                        baseline=(self.tracker.bf / self.cam.fx
                                  if self.tracker.bf else 0.0),
                        th_depth=(self.tracker.th_depth * self.cam.fx
                                  / self.tracker.bf
                                  if self.tracker.bf else 35.0),
                        camera2=self.tracker.cam2, T_c1c2=T_c1c2,
                        enable_loop_closing=False)
        from ..models import cameras as cam_mod

        def render(cam, R_cw, t_cw):
            # the homography renderer assumes a pinhole; fisheye needs rays
            if cam.kind == cam_mod.PINHOLE:
                return synth_render.render_frame(cam, planes, R_cw, t_cw)
            return synth_render.render_frame_raycast(cam, planes, R_cw, t_cw)

        for i in range(n_frames):
            imu = windows[i] if windows is not None else None
            ts_i = float(ts_all[i])
            if self.sensor in (STEREO, IMU_STEREO) and self.tracker.bf > 0:
                if self.tracker.cam2 is not None:
                    # two-camera rig: render the right eye at its true pose
                    left = render(self.cam, R[i], t[i])
                    T_rl = np.asarray(self.tracker.T_rl, np.float64)
                    R_r = (T_rl[:3, :3] @ R[i]).astype(np.float32)
                    t_r = (T_rl[:3, :3] @ t[i] + T_rl[:3, 3]).astype(np.float32)
                    right = render(self.tracker.cam2, R_r, t_r)
                else:
                    b = self.tracker.bf / self.cam.fx
                    left, right = synth_render.render_stereo_pair(
                        self.cam, planes, R[i], t[i], b)
                shadow.track_stereo(left, right, ts_i, imu=imu)
            elif self.sensor in (RGBD, IMU_RGBD):
                img = render(self.cam, R[i], t[i])
                depth = np.asarray(synth_render.render_depth(
                    self.cam, planes, R[i], t[i]))
                shadow.track_rgbd(img, depth, ts_i, imu=imu)
            else:
                img = render(self.cam, R[i], t[i])
                shadow.track_monocular(img, ts_i, imu=imu)
        return self

    def shutdown(self):
        """(reference: System::Shutdown, System.cc:563 — waits for the
        mapping/loop threads to finish)"""
        if self._async and self._worker is not None:
            self.wait_idle()
            self._kf_queue.put(None)
            self._worker.join(timeout=30)
            self._worker = None
            self._async = False
        if self.loop_closer is not None:
            self.loop_closer.wait_gba()
        self._is_shutdown = True

    def activate_localization_mode(self):
        """Camera tracking only; the map is frozen
        (reference: System::ActivateLocalizationMode, System.cc:510)."""
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        """(reference: System::DeactivateLocalizationMode, System.cc:518)"""
        self.tracker.localization_only = False

    def map_changed(self) -> bool:
        """True once after a big map correction — loop closure, applied
        global BA, or map merge (reference: System::MapChanged,
        System.cc:528, via Map::GetLastBigChangeIdx)."""
        cur = max(m.big_change_idx for m in self.atlas.maps)
        if cur > self._last_big_change:
            self._last_big_change = cur
            return True
        return False

    def reset(self):
        """Clear the whole Atlas and start over (reference: System::Reset ->
        Tracking::Reset, System.cc:537, Tracking.cc:4549)."""
        from ..mapping.atlas import Atlas
        with self.map_lock:
            if self.loop_closer is not None:
                self.loop_closer.abort_gba()
            self.atlas = Atlas(self.atlas.map_cfg)
            self.map = self.atlas.active
            # the reference clears the frame-pose log in Tracking::Reset;
            # stale rows would resolve against the fresh map's reused
            # (slot, epoch=0) keyframes and emit garbage poses
            self.tracker.trajectory.clear()
            self._last_big_change = 0
            self.tracker.reset_for_new_map(self.map)
            self.local_mapper.map = self.map
            self.local_mapper.recent_points.clear()
            if self.inertial:
                self._viba_stage = 0
                self._last_scale_refine = 0.0
            self.loop_closer = None
            self.kfdb = None
            self.kfdbs = {}
            self._kfdb_pending.clear()

    def reset_active_map(self):
        """Reset only the active map, keeping stored Atlas maps (reference:
        System::ResetActiveMap -> Tracking::ResetActiveMap, System.cc:545,
        Tracking.cc:4614)."""
        from ..mapping.mapstore import MapStore
        with self.map_lock:
            if self.loop_closer is not None:
                self.loop_closer.abort_gba()
            mid = self.atlas.active_id
            old = self.atlas.maps[mid]
            self.atlas.maps[mid] = MapStore(self.atlas.map_cfg)
            self.atlas.maps[mid].map_id = mid
            # keep the change counter monotone across the store swap so
            # System.map_changed never regresses below what it reported
            self.atlas.maps[mid].big_change_idx = old.big_change_idx
            self.map = self.atlas.maps[mid]
            # purge this map's rows from the frame-pose log (fresh store
            # reuses (slot, epoch=0) keys; reference Tracking::ResetActiveMap
            # erases the lost map's frames)
            self.tracker.trajectory = [
                r for r in self.tracker.trajectory if r[1] != mid]
            self.tracker.reset_for_new_map(self.map)
            self.local_mapper.map = self.map
            self.local_mapper.recent_points.clear()
            if self.inertial:
                self._viba_stage = 0
                self._last_scale_refine = 0.0
            self.loop_closer = None
            self.kfdb = None
            self.kfdbs.pop(mid, None)
            self._kfdb_pending.clear()

    def get_time_from_imu_init(self) -> float:
        """Seconds since the IMU initialized, 0 before (reference:
        System::GetTimeFromIMUInit, System.cc:1418)."""
        if (not self.inertial or getattr(self, "_viba_stage", 0) < 1
                or self.tracker.last_ts is None):
            return 0.0
        return max(self.tracker.last_ts - self._t_init, 0.0)

    def is_shutdown(self) -> bool:
        """(reference: System::isShutDown, System.h:141)"""
        return self._is_shutdown

    def is_finished(self) -> bool:
        """Mapping/loop workers drained (reference: System::isFinished
        semantics — all threads finished after Shutdown)."""
        return self._is_shutdown

    def get_image_scale(self) -> float:
        """Resize factor applied to inputs when Camera.newWidth is set
        (reference: System::GetImageScale, System.cc:1565; callers divide
        pixel coordinates by it)."""
        return self.image_scale

    def print_time_stats(self, file=None):
        """Per-stage timing table (reference: Tracking::PrintTimeStats,
        the REGISTER_TIMES subsystem)."""
        from ..utils import timing
        return timing.print_time_stats(file)

    def save_track_stats(self, path: str):
        """Per-frame tracking-stats CSV
        (reference: the optional track-stats CSV, Tracking.h:344-351)."""
        with open(path, "w") as f:
            f.write("#timestamp,state,n_features,n_matches\n")
            for ts, st, nf, nm in self.tracker.track_stats:
                f.write(f"{ts:.6f},{st},{nf},{nm}\n")

    # ------------------------------------------------------------------
    def trajectory_tum(self) -> list:
        """Frame trajectory in TUM format rows (t tx ty tz qx qy qz qw),
        replaying relative poses against (possibly BA-corrected) reference
        keyframes (reference: System::SaveTrajectoryEuRoC, System.cc:721)."""
        import jax.numpy as jnp
        rows = []
        for ts, map_id, ref_kf, epoch, R_cr, t_cr, state in self.tracker.trajectory:
            resolved = self.atlas.resolve_kf_pose(map_id, ref_kf, epoch)
            if resolved is None:
                continue
            R_rw, t_rw = resolved
            R_cw = R_cr @ R_rw
            t_cw = R_cr @ t_rw + t_cr
            # world pose of the camera (T_wc)
            R_wc = R_cw.T
            t_wc = -R_wc @ t_cw
            q = np.asarray(so3.to_quat(jnp.asarray(R_wc)))
            rows.append((ts, *t_wc.tolist(), *q.tolist()))
        return rows

    def save_trajectory_tum(self, path: str):
        """(reference: System::SaveTrajectoryTUM, System.cc:646)"""
        with open(path, "w") as f:
            for row in self.trajectory_tum():
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")

    def save_sub_trajectory(self, path: str, t_start: float, t_end: float):
        """Save only the frames with t_start <= ts <= t_end (reference:
        Tracking::SaveSubTrajectory, Tracking.h:106)."""
        with open(path, "w") as f:
            for row in self.trajectory_tum():
                if t_start <= row[0] <= t_end:
                    f.write(" ".join(f"{v:.9f}" for v in row) + "\n")

    def print_point_distribution(self):
        """Per-pyramid-level feature/tracked-point counts of the last frame
        (reference: Frame::PrintPointDistribution, Frame.h:357)."""
        fr = self.tracker.last
        if fr is None:
            print("point distribution: no frame yet")
            return
        lv = np.asarray(fr.prepared.feat.level)
        ok = np.asarray(fr.prepared.feat.valid)
        tracked = fr.match_pt >= 0
        print("level |  features | tracked points")
        for l in range(int(lv.max()) + 1 if lv.size else 0):
            m = ok & (lv == l)
            print(f"{l:5d} | {int(m.sum()):9d} | {int((m & tracked).sum()):14d}")

    def check_map_consistency(self) -> list:
        """Run MapStore.check_invariants over every Atlas map (reference:
        Map::CheckEssentialGraph debug helper, Map.h:128)."""
        errs = []
        for i, m in enumerate(self.atlas.maps):
            errs += [f"map {i}: {e}" for e in m.check_invariants()]
        return errs

    def save_trajectory_euroc(self, path: str):
        """Timestamps in ns, same TUM-style fields
        (reference: System::SaveTrajectoryEuRoC, System.cc:721)."""
        with open(path, "w") as f:
            for row in self.trajectory_tum():
                f.write(f"{row[0] * 1e9:.0f} "
                        + " ".join(f"{v:.9f}" for v in row[1:]) + "\n")

    def save_trajectory_kitti(self, path: str):
        """3x4 row-major world poses per line
        (reference: System::SaveTrajectoryKITTI, System.cc:1273)."""
        import jax.numpy as jnp
        with open(path, "w") as f:
            for ts, map_id, ref_kf, epoch, R_cr, t_cr, state in self.tracker.trajectory:
                resolved = self.atlas.resolve_kf_pose(map_id, ref_kf, epoch)
                if resolved is None:
                    continue
                R_rw, t_rw = resolved
                R_cw = R_cr @ R_rw
                t_cw = R_cr @ t_rw + t_cr
                R_wc = R_cw.T
                t_wc = -R_wc @ t_cw
                M = np.concatenate([R_wc, t_wc[:, None]], axis=1)
                f.write(" ".join(f"{v:.9e}" for v in M.reshape(-1)) + "\n")

    def save_keyframe_trajectory_tum(self, path: str):
        """(reference: System::SaveKeyFrameTrajectoryTUM, System.cc:680)"""
        import jax.numpy as jnp
        from ..lie import so3 as so3_mod
        kfs = self.map.kf_ids()
        order = np.argsort(self.map.kf_ts[kfs])
        with open(path, "w") as f:
            for k in kfs[order]:
                R_wc = self.map.kf_R[k].T
                t_wc = -R_wc @ self.map.kf_t[k]
                q = np.asarray(so3_mod.to_quat(jnp.asarray(R_wc)))
                f.write(f"{self.map.kf_ts[k]:.9f} "
                        + " ".join(f"{v:.9f}" for v in [*t_wc, *q]) + "\n")

    def save_keyframe_trajectory_euroc(self, path: str):
        """Keyframe poses with ns timestamps (reference:
        System::SaveKeyFrameTrajectoryEuRoC, System.cc:940)."""
        import jax.numpy as jnp
        from ..lie import so3 as so3_mod
        kfs = self.map.kf_ids()
        order = np.argsort(self.map.kf_ts[kfs])
        with open(path, "w") as f:
            for k in kfs[order]:
                R_wc = self.map.kf_R[k].T
                t_wc = -R_wc @ self.map.kf_t[k]
                q = np.asarray(so3_mod.to_quat(jnp.asarray(R_wc)))
                f.write(f"{self.map.kf_ts[k] * 1e9:.0f} "
                        + " ".join(f"{v:.9f}" for v in [*t_wc, *q]) + "\n")

    # ------------------------------------------------------------ state
    def get_tracking_state(self) -> int:
        """(reference: System::GetTrackingState, System.h:176)"""
        return int(self.tracker.state)

    def is_lost(self) -> bool:
        """(reference: System::isLost, System.h:182)"""
        from .tracking import LOST, RECENTLY_LOST
        return self.tracker.state in (LOST, RECENTLY_LOST)

    def get_tracked_map_points(self) -> np.ndarray:
        """Per-feature map-point id of the last frame, -1 where untracked
        (reference: System::GetTrackedMapPoints, System.h:177)."""
        last = self.tracker.last
        if last is None:
            return np.empty(0, np.int64)
        return np.asarray(last.match_pt).copy()

    def get_tracked_keypoints(self) -> np.ndarray:
        """Undistorted keypoints [N, 2] of the last frame (reference:
        System::GetTrackedKeyPointsUn, System.h:178)."""
        last = self.tracker.last
        if last is None:
            return np.empty((0, 2), np.float32)
        return np.asarray(last.prepared.xy_ud)

    def save_atlas(self, path: str):
        """Checkpoint all maps (reference: System::SaveAtlas, System.cc:1466)."""
        from ..utils import serialization
        serialization.save_atlas(self.atlas, path)

    def load_atlas(self, path: str):
        from ..utils import serialization
        from .tracking import LOST
        self.atlas = serialization.load_atlas(path)
        for i, m in enumerate(self.atlas.maps):
            m.map_id = i
        self.map = self.atlas.active
        self.tracker.map = self.map
        self.local_mapper.map = self.map
        if self.loop_closer is not None:
            self.loop_closer.map = self.map
        # resume = relocalize into the loaded map (reference: LoadAtlas
        # session resume, System.cc:180)
        if self.map.n_kf > 0:
            self.tracker.state = LOST
            self.tracker.lost_count = 0

    @property
    def n_keyframes(self):
        return self.map.n_kf

    @property
    def n_map_points(self):
        return self.map.n_points
