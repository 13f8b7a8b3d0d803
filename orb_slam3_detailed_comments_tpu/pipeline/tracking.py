"""Tracking: the per-frame front end state machine.

Replaces the reference's Tracking thread (src/Tracking.cc:1971 Track() and
its helpers). The host drives the state machine; every hot loop — feature
extraction, projection search, pose optimization, two-view reconstruction —
is a fused jitted device program from pipeline/kernels.py.

States (reference: include/Tracking.h:121-129): NO_IMAGES_YET,
NOT_INITIALIZED, OK, RECENTLY_LOST, LOST.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import SE3
from ..models import cameras, twoview
from ..ops import extractor, matching
from ..optim import ba
from ..mapping.mapstore import MapStore, MapConfig, NO_POINT
from . import kernels

NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
RECENTLY_LOST = 3
LOST = 4


@dataclass
class TrackingConfig:
    n_features: int = 1024
    max_frames: int = 20          # KF policy c1a: fps (reference mMaxFrames)
    min_frames: int = 0
    ref_ratio: float = 0.9        # mono thRefRatio (reference: Tracking.cc:3737)
    min_init_matches: int = 100   # reference: Tracking.cc:2825,2859
    motion_radius: float = 15.0   # px search radius, motion model (mono)
    local_radius: float = 4.0     # px search radius, local map
    local_pts_cap: int = 4096     # padded local point set size
    min_inliers_mm: int = 20
    min_inliers_local: int = 30
    recently_lost_frames: int = 100  # ~5 s at 20 fps (reference 5 s budget)
    periodic_kf: bool = True      # insert a KF every max_frames regardless
                                  # of c2 (see _need_new_keyframe)
    insert_kfs_when_lost: bool = True  # IMU mode: keep the KF cadence while
                                  # RECENTLY_LOST (reference IMU.
                                  # InsertKFsWhenLost, Tracking.cc:2569)


@dataclass
class FrameRecord:
    """Host-side record of the last processed frame."""
    prepared: kernels.PreparedFrame
    T_cw: SE3
    match_pt: np.ndarray    # [N] map point per feature
    ts: float
    frame_id: int
    angles: Optional[np.ndarray] = None   # host copy of feat.angle, if pulled
    depth: Optional[np.ndarray] = None    # [N] per-feature depth (stereo/RGBD)


def _compose_np(A: SE3, B: SE3) -> SE3:
    """A ∘ B on the host: per-frame 3x3 pose math must not issue eager
    device dispatches (each one is a tunnel round trip on TPU)."""
    Ra, ta = np.asarray(A.R), np.asarray(A.t)
    Rb, tb = np.asarray(B.R), np.asarray(B.t)
    return SE3((Ra @ Rb).astype(np.float32), (Ra @ tb + ta).astype(np.float32))


def _inverse_np(A: SE3) -> SE3:
    Rt = np.asarray(A.R).T
    return SE3(Rt.astype(np.float32),
               (-Rt @ np.asarray(A.t)).astype(np.float32))


SENSOR_MONO = 0
SENSOR_STEREO = 1
SENSOR_RGBD = 2


class Tracker:
    def __init__(self, cam: cameras.CameraParams, mapstore: MapStore,
                 cfg: TrackingConfig = TrackingConfig(),
                 orb_cfg: Optional[extractor.OrbConfig] = None,
                 sensor: int = SENSOR_MONO, bf: float = 0.0,
                 th_depth: float = 35.0, imu_calib=None,
                 cam2=None, T_rl=None):
        self.cam = cam
        # second (non-rectified / fisheye) stereo camera + right<-left
        # extrinsic 4x4 (reference: the two-GeometricCamera stereo mode)
        self.cam2 = cam2
        self.T_rl = T_rl
        if cam2 is not None and T_rl is not None and bf <= 0.0:
            bf = float(np.linalg.norm(np.asarray(T_rl)[:3, 3])) * cam.fx
        self.map = mapstore
        self.cfg = cfg
        self.sensor = sensor
        self.bf = bf                      # baseline * fx (stereo/RGBD)
        # close-point threshold = th_depth * baseline (reference ThDepth)
        self.th_depth = th_depth * (bf / cam.fx) if bf > 0 else 0.0
        self.cur_depth = None             # [N] per-feature depth or None
        self.orb_cfg = orb_cfg or extractor.OrbConfig(n_features=cfg.n_features)
        self.state = NO_IMAGES_YET
        self.localization_only = False
        import threading
        self.map_lock = threading.RLock()   # System shares its own in async
        self.velocity: Optional[SE3] = None
        self.last: Optional[FrameRecord] = None
        self.ref_kf: int = -1
        self.last_kf_frame_id: int = -999
        self.last_kf_id: int = -1
        self.init_ref: Optional[FrameRecord] = None
        self.frame_id = 0
        self.lost_count = 0
        # host copies: radius_px * radius_scale must be numpy math, not an
        # eager device multiply (one dispatch per tracking stage otherwise)
        self.radius_scale, self.inv_sigma2 = (
            np.asarray(a) for a in kernels.level_weights(
                self.orb_cfg.n_levels, self.orb_cfg.scale))
        # inertial state (None for pure-visual sensors); see pipeline/inertial
        self.imu = None
        if imu_calib is not None:
            from .inertial import ImuFrameState
            self.imu = ImuFrameState(calib=imu_calib)
        self.last_ts: Optional[float] = None
        self.last_kf_ts: float = -1e9
        self.min_kf_dt: float = 0.25   # IMU-mode KF cadence (Tracking.cc:3700)
        # set by System: prep -> (R, t, match_pt, ref_kf) or None
        self.relocalizer = None
        self.n_relocalizations = 0
        # trajectory: (ts, map_id, ref_kf, epoch, T_cr, state)
        self.trajectory: list = []
        self.new_keyframes: list = []   # queue to local mapping
        # per-frame stats rows: (ts, state, n_features, n_matches)
        # (reference: the track-stats CSV, Tracking.h:344-351)
        self.track_stats: list = []

    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, ts: float,
                        imu_meas=None) -> Optional[np.ndarray]:
        """Process one grayscale frame; returns T_cw 4x4 or None if lost.
        imu_meas: optional (acc [M,3], gyro [M,3], t [M]) samples since the
        previous frame (reference: vImuMeas in System::TrackMonocular).

        (reference: Tracking::GrabImageMonocular + Track(), Tracking.cc:1668,1971)
        """
        from ..utils import timing
        with timing.span("ORB extraction"):
            prep = kernels.prepare_frame(
                jnp.asarray(img, jnp.float32), self.cam, self.orb_cfg)
        return self._track_frame(prep, None, ts, imu_meas)

    def track_prepared(self, prep: kernels.PreparedFrame, ts: float,
                       imu_meas=None) -> Optional[np.ndarray]:
        """Track a pre-extracted monocular frame (see
        parallel.batch_extract.prepare_frames: extraction fanned out over a
        device mesh, the sequential state machine consuming the results)."""
        return self._track_frame(prep, None, ts, imu_meas)

    def track_prepared_stereo(self, prep: kernels.PreparedFrame, depth,
                              ts: float, imu_meas=None) -> Optional[np.ndarray]:
        """Track a pre-extracted stereo/RGB-D frame (pipelined ingestion:
        System.track_stereo_iter dispatches prepare_frame_stereo ahead)."""
        return self._track_frame(prep, depth, ts, imu_meas)

    def track_stereo(self, img_l: np.ndarray, img_r: np.ndarray,
                     ts: float, imu_meas=None) -> Optional[np.ndarray]:
        """(reference: Tracking::GrabImageStereo, Tracking.cc:1523)"""
        if self.cam2 is not None:
            # non-rectified pair (fisheye): epipolar-gated matching +
            # triangulation instead of row search
            T = np.asarray(self.T_rl)
            prep, depth, _ = kernels.prepare_frame_stereo_fisheye(
                jnp.asarray(img_l, jnp.float32),
                jnp.asarray(img_r, jnp.float32),
                self.cam, self.cam2,
                jnp.asarray(T[:3, :3], jnp.float32),
                jnp.asarray(T[:3, 3], jnp.float32), self.orb_cfg)
        else:
            prep, depth, _ = kernels.prepare_frame_stereo(
                jnp.asarray(img_l, jnp.float32), jnp.asarray(img_r, jnp.float32),
                self.cam, self.bf, self.orb_cfg,
                self.orb_cfg.n_levels, self.orb_cfg.scale)
        # depth stays ON DEVICE: it rides the local-map stage's packed
        # transfer instead of a standalone blocking download here
        return self._track_frame(prep, depth, ts, imu_meas)

    def track_rgbd(self, img: np.ndarray, depth_img: np.ndarray,
                   ts: float, imu_meas=None) -> Optional[np.ndarray]:
        """(reference: Tracking::GrabImageRGBD, Tracking.cc:1613)"""
        prep, depth, _ = kernels.prepare_frame_rgbd(
            jnp.asarray(img, jnp.float32), jnp.asarray(depth_img, jnp.float32),
            self.cam, self.bf, self.orb_cfg)
        return self._track_frame(prep, depth, ts, imu_meas)

    def _preintegrate(self, ts: float, imu_meas):
        """Integrate the frame-gap IMU window and accumulate the since-last-KF
        window (reference: Tracking::PreintegrateIMU, Tracking.cc:1739)."""
        from . import inertial
        from ..imu import preintegration as pre_mod
        acc, gyro, t = imu_meas
        acc = np.asarray(acc, np.float32).reshape(-1, 3)
        gyro = np.asarray(gyro, np.float32).reshape(-1, 3)
        t = np.asarray(t, np.float64).reshape(-1)
        t0 = self.last_ts if self.last_ts is not None else (t[0] if len(t) else ts)
        edges = np.concatenate([[t0], t[:-1]]) if len(t) else np.zeros(0)
        dts = np.maximum(t - edges, 0.0) if len(t) else np.zeros(0)
        # last sample may not land on the frame time: extend to ts
        if len(t) and ts > t[-1]:
            dts[-1] += ts - t[-1]
        if len(t) == 0 or dts.sum() <= 0:
            return
        pre = inertial.integrate_frame_window(
            self.imu.calib, gyro, acc, dts.astype(np.float32),
            self.imu.bg, self.imu.ba)
        self.imu.pre_last_frame = pre
        if self.imu.pre_since_kf is None:
            self.imu.pre_since_kf = pre
        else:
            self.imu.pre_since_kf = pre_mod.merge(self.imu.pre_since_kf, pre)

    def _track_frame(self, prep, depth, ts: float,
                     imu_meas=None) -> Optional[np.ndarray]:
        fid = self.frame_id
        self.frame_id += 1
        self.cur_depth = depth
        if self.imu is not None:
            self.imu.pre_last_frame = None
            if imu_meas is not None:
                self._preintegrate(ts, imu_meas)
        self.last_ts = ts
        self.cur_ts = ts
        # everything below reads/writes the map: hold the per-map update
        # lock so the async mapping worker can't mutate it mid-frame
        # (reference: the mMutexMapUpdate acquisition in Track(),
        # Tracking.cc:2078); feature extraction ran before this, unlocked
        with self.map_lock:
            return self._track_frame_locked(prep, depth, ts, fid)

    def _track_frame_locked(self, prep, depth, ts: float,
                            fid: int) -> Optional[np.ndarray]:
        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            if self.localization_only or (self.map.n_kf > 0 and self.ref_kf < 0):
                # a map already exists (loaded atlas): relocalize into it
                # instead of initializing a new one
                self.state = LOST
            else:
                self.state = NOT_INITIALIZED
        if self.state == NOT_INITIALIZED:
            if depth is None:
                self._monocular_initialization(prep, ts, fid)
            else:
                self._stereo_initialization(prep, depth, ts, fid)
            if self.state != OK:
                return None
            return self._log_and_return(ts)

        # timestamp jump: the sequence skipped ahead (>1 s) — abandon the
        # frame and let the System spawn/reset a map, like a dataset change
        # (reference: Tracking.cc:2010-2043)
        if (self.state == OK and not self.localization_only
                and self.last is not None and ts - self.last.ts > 1.0):
            self.state = LOST
            self.velocity = None
            return None

        # --- normal tracking ---
        from ..utils import timing
        self._update_last_frame_pose()
        ok = False
        imu_ready = (self.imu is not None and self.map.imu_initialized
                     and self.imu.pre_last_frame is not None
                     and self.last is not None)
        use_imu_pred = imu_ready and self.state == OK
        # RECENTLY_LOST visual re-acquisition: the reference predicts the
        # pose from the IMU and then runs TrackLocalMap on it
        # (Tracking.cc:2203-2240 -> 3067) — matching the local map at the
        # dead-reckoned pose is what ends a blackout. Stage-1 candidates
        # come from the recent observation-bearing keyframes
        # (seed_from_kfs) because the last frames carry no matches.
        imu_rescue = imu_ready and self.state == RECENTLY_LOST
        fused = False
        with timing.span("pose prediction"):
            if use_imu_pred or imu_rescue or (self.velocity is not None
                                              and self.state == OK):
                # the fused one-dispatch step covers BOTH the motion-model
                # and local-map stages; "fail1" falls through to the
                # reference's fallback chain (Tracking.cc:2120)
                r = self._track_steady_fused(
                    prep, ts, fid, use_imu=use_imu_pred or imu_rescue,
                    seed_from_kfs=imu_rescue)
                if r != "fail1":
                    fused = True
                    ok = r == "ok"
            if not ok and not fused:
                ok = self._track_reference_keyframe(prep, ts, fid)
            vo_mode = False
            if not ok and not fused and self.localization_only:
                # mbVO: the frozen map left too few matches — track
                # frame-to-frame on the last frame's depth-backed features
                # (reference: Tracking.cc:2279-2360 visual-odometry branch)
                ok = vo_mode = self._track_visual_odometry(prep, ts, fid)
            if not ok and not fused and self.state in (RECENTLY_LOST, LOST) \
                    and self.relocalizer:
                ok = self._relocalization(prep, ts, fid)
        if ok and not fused and not vo_mode:
            with timing.span("track local map"):
                ok = self._track_local_map()
        if ok:
            was_lost = self.state in (RECENTLY_LOST, LOST)
            self.state = OK
            self.lost_count = 0
            # velocity update (reference: Tracking.cc:2512-2520)
            if self.last is not None:
                self.velocity = _compose_np(self.cur_T,
                                            _inverse_np(self.last.T_cw))
                if was_lost:
                    # the frame-to-frame deltas below would absorb the
                    # re-acquisition pose CORRECTION (visual fix minus
                    # dead-reckoned prediction) as phantom motion — a
                    # 5 cm correction at 20 fps reads as 1 m/s of velocity
                    # error and throws the next IMU prediction off the map
                    # (measured: re-lost on the very next frame). Keep the
                    # IMU-propagated velocity instead; the motion model
                    # restarts clean.
                    self.velocity = None
                    # only a prediction produced for THIS frame may seed the
                    # world velocity: recovery via the relocalization
                    # fallback (e.g. from LOST) would otherwise inject a
                    # stale _v_pred from many frames earlier (ADVICE r4)
                    if (self.imu is not None
                            and getattr(self, "_v_pred", None) is not None
                            and getattr(self, "_v_pred_fid", None) == fid):
                        self.imu.v_w = np.asarray(self._v_pred, np.float32)
                elif self.imu is not None and self.map.imu_initialized:
                    dt = ts - self.last.ts
                    if dt > 1e-6:
                        from .inertial import _extr, body_from_camera
                        R_bc, t_bc = _extr(self.imu.calib)
                        _, p1 = body_from_camera(self.last.T_cw.R,
                                                 self.last.T_cw.t, R_bc, t_bc)
                        _, p2 = body_from_camera(self.cur_T.R, self.cur_T.t,
                                                 R_bc, t_bc)
                        self.imu.v_w = ((p2 - p1) / dt).astype(np.float32)
            self._update_found_counters()
            if self._need_new_keyframe():
                self._create_new_keyframe(ts, fid)
            self.last = FrameRecord(
                self.cur_prep, self.cur_T, self.cur_match, ts, fid,
                angles=(self._cur_angles
                        if getattr(self, "_cur_cache_prep", None)
                        is self.cur_prep else None),
                depth=(np.asarray(self.cur_depth)
                       if self.cur_depth is not None else None))
            return self._log_and_return(ts)

        # --- lost handling (reference: Tracking.cc:2203-2262) ---
        self.lost_count += 1
        if self.lost_count <= self.cfg.recently_lost_frames and self.map.n_kf > 5:
            self.state = RECENTLY_LOST
        else:
            self.state = LOST
        self.velocity = None
        # IMU dead-reckoning rescue: while RECENTLY_LOST in an initialized
        # inertial map, keep emitting IMU-predicted poses (and propagating
        # the state for the next frame's prediction) until relocalization
        # succeeds or the budget runs out (reference: Tracking.cc:2203-2240,
        # bOK = PredictStateIMU() during RECENTLY_LOST)
        if (self.state == RECENTLY_LOST and self.imu is not None
                and self.map.imu_initialized and self.last is not None
                and self.imu.pre_last_frame is not None):
            from . import inertial
            T_pred, v_pred = inertial.predict_pose_imu(
                self.map, self.imu, self.last.T_cw, self.imu.pre_last_frame)
            self.cur_T = T_pred
            self.cur_prep = prep
            self.cur_match = np.full(prep.feat.valid.shape[0], -1, np.int32)
            self.imu.v_w = np.asarray(v_pred, np.float32)
            # keep inserting keyframes on the IMU cadence while visually
            # lost so the preintegration chain stays dense through the
            # blackout (reference: InsertKFsWhenLost — CreateNewKeyFrame
            # when bNeedKF && RECENTLY_LOST && IMU sensor, Tracking.cc:2569)
            if (self.cfg.insert_kfs_when_lost and not self.localization_only
                    and ts - self.last_kf_ts >= self.min_kf_dt):
                self.cur_ts = ts
                self._create_new_keyframe(ts, fid)
            self.last = FrameRecord(prep, T_pred, self.cur_match, ts, fid)
            return self._log_and_return(ts)
        return None

    # ------------------------------------------------------------------
    def _log_and_return(self, ts):
        # all-host math: cur_T is a host pose on the steady-state paths and
        # the ref-KF pose lives in host arrays, so trajectory logging issues
        # ZERO device work (np.asarray on the already-host arrays is free)
        n_valid = (int(self._cur_valid.sum())
                   if getattr(self, "_cur_cache_prep", None) is self.cur_prep
                   else int(np.asarray(self.cur_prep.feat.valid).sum()))
        self.track_stats.append(
            (ts, self.state, n_valid, int((self.cur_match >= 0).sum())))
        R_cw = np.asarray(self.cur_T.R)
        t_cw = np.asarray(self.cur_T.t)
        Rr = self.map.kf_R[self.ref_kf]
        tr = self.map.kf_t[self.ref_kf]
        R_cr = (R_cw @ Rr.T).astype(np.float32)    # T_cr = T_cw ∘ T_rw⁻¹
        t_cr = (t_cw - R_cr @ tr).astype(np.float32)
        self.trajectory.append(
            (ts, self.map.map_id, self.ref_kf,
             int(self.map.kf_epoch[self.ref_kf]), R_cr, t_cr, self.state))
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = R_cw
        M[:3, 3] = t_cw
        return M

    # ------------------------------------------------------------------
    def _track_visual_odometry(self, prep, ts, fid) -> bool:
        """Localization-mode rescue: match the last frame's depth-backed
        features against the current frame and optimize the pose on their
        backprojections — the reference's mbVO "visual odometry" points
        (Tracking.cc:2279-2360, UpdateLastFrame's temporal points at
        Tracking.cc:3270-3340). Stereo/RGB-D only (needs per-feature
        depth); drifts like any VO until the map is re-acquired."""
        from ..optim import pose_opt
        last = self.last
        if (last is None or last.depth is None or last.prepared is None):
            return False
        lvalid = (np.asarray(last.prepared.feat.valid)
                  & (last.depth > 0))
        if lvalid.sum() < 40:
            return False
        res = matching.match_nn(
            last.prepared.feat.desc, jnp.asarray(lvalid),
            prep.feat.desc, prep.feat.valid,
            max_dist=matching.TH_HIGH, ratio=0.9, mutual=True)
        valid, idx = jax.device_get((res.valid, res.idx))
        if valid.sum() < 20:
            return False
        # backproject last-frame features at their measured depth
        xyn = np.asarray(last.prepared.xyn)
        z = np.where(lvalid, last.depth, 1.0).astype(np.float32)
        Xc = np.stack([xyn[:, 0] * z, xyn[:, 1] * z, z], 1)
        R_lw, t_lw = np.asarray(last.T_cw.R), np.asarray(last.T_cw.t)
        Xw = (Xc - t_lw) @ R_lw
        uv = np.asarray(prep.xy_ud)[np.where(valid, idx, 0)]
        T0 = (_compose_np(self.velocity, last.T_cw)
              if self.velocity is not None else last.T_cw)
        out = pose_opt.pose_optimization(
            SE3(jnp.asarray(T0.R), jnp.asarray(T0.t)), jnp.asarray(Xw),
            jnp.asarray(uv), jnp.ones(len(Xw), jnp.float32),
            jnp.asarray(valid), self.cam)
        n_inl, R_n, t_n = jax.device_get(
            (out.n_inliers, out.T_cw.R, out.T_cw.t))
        if int(n_inl) < 20 or not np.isfinite(t_n).all():
            return False
        self.cur_T = SE3(R_n, t_n)
        self.cur_prep = prep
        self.cur_match = np.full(np.asarray(prep.feat.valid).shape[0], -1,
                                 np.int32)
        return True

    # ------------------------------------------------------------------
    def _update_last_frame_pose(self):
        """Re-anchor the last frame's pose on its reference keyframe's
        CURRENT map pose (reference: Tracking::UpdateLastFrame,
        Tracking.cc:3247: Tlw = Tlr * Trw). Local BA, loop correction, GBA
        and merges all move keyframes between frames; the motion-model /
        IMU prediction must start from a map-consistent pose or tracking
        falls off the corrected map. The last trajectory row holds exactly
        T_lr at frame time (rescaled by on_map_transformed when the world
        rescales), so this is pure host math."""
        if self.last is None or not self.trajectory:
            return
        ts_, mid, rk, ep, R_cr, t_cr, _ = self.trajectory[-1]
        if (mid != self.map.map_id or abs(ts_ - self.last.ts) > 1e-9
                or rk < 0 or not self.map.kf_valid[rk]
                or int(self.map.kf_epoch[rk]) != ep):
            return
        Rr, tr = self.map.kf_R[rk], self.map.kf_t[rk]
        R_lw = (R_cr @ Rr).astype(np.float32)
        t_lw = (R_cr @ tr + t_cr).astype(np.float32)
        self.last = dataclasses.replace(self.last, T_cw=SE3(R_lw, t_lw))

    # ------------------------------------------------------------------
    def _monocular_initialization(self, prep, ts, fid):
        """(reference: Tracking::MonocularInitialization, Tracking.cc:2818)"""
        n_valid = int(np.asarray(prep.feat.valid).sum())
        if self.init_ref is None or n_valid <= self.cfg.min_init_matches:
            if n_valid > self.cfg.min_init_matches:
                self.init_ref = FrameRecord(prep, SE3.identity(), None, ts, fid)
                if self.imu is not None:
                    self.imu.pre_since_kf = None  # chain starts at init_ref
            return

        f1 = self.init_ref.prepared
        res = matching.search_for_initialization(
            f1.feat._replace(xy=f1.xy_ud), prep.feat._replace(xy=prep.xy_ud))
        valid = np.asarray(res.valid)
        n_matches = int(valid.sum())
        if n_matches < self.cfg.min_init_matches:
            self.init_ref = FrameRecord(prep, SE3.identity(), None, ts, fid)
            if self.imu is not None:
                self.imu.pre_since_kf = None
            return

        idx2 = np.asarray(res.idx)
        tv = twoview.reconstruct(
            f1.xyn, prep.xyn[idx2], jnp.asarray(valid),
            jax.random.PRNGKey(fid), focal=float(self.cam.fx))
        if not bool(tv.success):
            return
        self._create_initial_map(f1, prep, idx2, np.asarray(tv.is_good),
                                 tv, ts, fid)

    def _create_initial_map(self, f1, f2prep, idx2, good, tv, ts, fid):
        """(reference: Tracking::CreateInitialMapMonocular, Tracking.cc:2920)"""
        X = np.asarray(tv.points3d)
        good = good & np.isfinite(X).all(axis=1)
        n_good = int(good.sum())
        if n_good < 50:
            return
        # gauge: median depth -> 1
        depths = X[good][:, 2]
        med = float(np.median(depths))
        if med <= 0:
            return
        X = X / med
        t21 = np.asarray(tv.t21) / med
        R21 = np.asarray(tv.R21)

        N = self.map.cfg.n_feat
        feat_pt1 = np.full(N, NO_POINT, np.int32)
        feat_pt2 = np.full(N, NO_POINT, np.int32)
        gidx1 = np.where(good)[0]
        pids = self.map.alloc_points(n_good)
        desc1 = np.asarray(f1.feat.desc)
        self.map.pt_xyz[pids] = X[gidx1]
        self.map.pt_desc[pids] = desc1[gidx1]
        self.map.pt_valid[pids] = True
        feat_pt1[gidx1] = pids
        feat_pt2[idx2[gidx1]] = pids

        k1 = self.map.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32), self.init_ref.ts,
            self.init_ref.frame_id,
            np.asarray(f1.xy_ud), np.asarray(f1.xyn),
            np.asarray(f1.feat.level), np.asarray(f1.feat.angle),
            np.asarray(f1.feat.desc), np.asarray(f1.feat.valid), feat_pt1)
        k2 = self.map.add_keyframe(
            R21, t21, ts, fid,
            np.asarray(f2prep.xy_ud), np.asarray(f2prep.xyn),
            np.asarray(f2prep.feat.level), np.asarray(f2prep.feat.angle),
            np.asarray(f2prep.feat.desc), np.asarray(f2prep.feat.valid), feat_pt2)
        self.map.pt_ref_kf[pids] = k2
        self.map.pt_first_kf[pids] = k2
        self.map.update_point_stats(pids)

        # full BA on the initial two-view map (reference runs
        # GlobalBundleAdjustemnt(20) here)
        from .local_mapping import run_local_ba
        run_local_ba(self.map, [k1, k2], fixed=[k1], cam=self.cam, iters=20)

        # rescale again to median depth 1 after BA
        pvalid = self.map.pt_valid
        if pvalid.sum() >= 30:
            med = float(np.median(np.linalg.norm(
                self.map.pt_xyz[pvalid], axis=-1)))
            if med > 0:
                self.map.pt_xyz[pvalid] /= med
                self.map.kf_t[[k1, k2]] /= med
        self.map.update_point_stats(np.where(pvalid)[0])

        if self.imu is not None and self.imu.pre_since_kf is not None:
            self.map.set_kf_preintegration(k2, self.imu.pre_since_kf, k1)
            self.imu.pre_since_kf = None
            self.imu.t_first_kf = self.init_ref.ts
        self.ref_kf = k2
        self.last_kf_frame_id = fid
        self.last_kf_id = k2
        self.last_kf_ts = ts
        T2 = SE3(jnp.asarray(self.map.kf_R[k2]), jnp.asarray(self.map.kf_t[k2]))
        self.cur_T = T2
        self.cur_prep = f2prep
        self.cur_match = feat_pt2
        self.last = FrameRecord(f2prep, T2, feat_pt2, ts, fid)
        self.velocity = None
        self.state = OK
        self.new_keyframes.extend([k1, k2])

    # ------------------------------------------------------------------
    def _stereo_initialization(self, prep, depth, ts, fid):
        """Instant map init from stereo/RGB-D depth
        (reference: Tracking::StereoInitialization, Tracking.cc:2678)."""
        depth = np.asarray(depth)
        good = (depth > 0) & np.asarray(prep.feat.valid)
        if good.sum() < 300:   # reference requires >500 kps; depth-valid subset
            return
        N = self.map.cfg.n_feat
        idx = np.where(good)[0]
        xyn = np.asarray(prep.xyn)[idx]
        z = depth[idx]
        X = np.stack([xyn[:, 0] * z, xyn[:, 1] * z, z], axis=1).astype(np.float32)
        feat_pt = np.full(N, NO_POINT, np.int32)
        pids = self.map.alloc_points(len(idx))
        self.map.pt_xyz[pids] = X
        self.map.pt_desc[pids] = np.asarray(prep.feat.desc)[idx]
        self.map.pt_valid[pids] = True
        feat_pt[idx] = pids
        k = self.map.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32), ts, fid,
            np.asarray(prep.xy_ud), np.asarray(prep.xyn),
            np.asarray(prep.feat.level), np.asarray(prep.feat.angle),
            np.asarray(prep.feat.desc), np.asarray(prep.feat.valid), feat_pt)
        self.map.pt_ref_kf[pids] = k
        self.map.pt_first_kf[pids] = k
        self.map.update_point_stats(pids)
        if self.imu is not None:
            self.imu.pre_since_kf = None   # chain starts at this keyframe
            self.imu.t_first_kf = ts
        self.ref_kf = k
        self.last_kf_frame_id = fid
        self.last_kf_id = k
        self.last_kf_ts = ts
        self.cur_T = SE3.identity()
        self.cur_prep = prep
        self.cur_match = feat_pt
        self.last = FrameRecord(prep, SE3.identity(), feat_pt, ts, fid)
        self.velocity = None
        self.state = OK
        self.new_keyframes.append(k)

    def _create_depth_points(self, k: int, max_new: int = 100):
        """Create close map points from the frame's depth for features that
        have no match yet (reference: CreateNewKeyFrame's stereo/RGBD point
        creation, Tracking.cc:3865-3950: sorted by depth, close-first)."""
        if self.cur_depth is None or self.bf <= 0:
            return
        # stereo-init path reaches here before the local-map stage pulled it
        self.cur_depth = np.asarray(self.cur_depth)
        m = self.map
        prep = self.cur_prep
        free = ((m.kf_feat_point[k] == NO_POINT)
                & np.asarray(prep.feat.valid)
                & (self.cur_depth > 0))
        idx = np.where(free)[0]
        if len(idx) == 0:
            return
        z = self.cur_depth[idx]
        order = np.argsort(z)
        sel = []
        for i in order:
            if z[i] <= self.th_depth or len(sel) < max_new:
                sel.append(i)
            if len(sel) >= max_new and z[i] > self.th_depth:
                break
        idx = idx[np.asarray(sel, np.int64)]
        z = self.cur_depth[idx]
        xyn = np.asarray(prep.xyn)[idx]
        Xc = np.stack([xyn[:, 0] * z, xyn[:, 1] * z, z], 1).astype(np.float32)
        # host math: Xc has a data-dependent length, and a device op per
        # distinct length compiles a fresh tiny XLA program (compile leak)
        R_cw, t_cw = m.kf_R[k], m.kf_t[k]
        Xw = ((Xc - t_cw) @ R_cw).astype(np.float32)   # R_cw^T (Xc - t)
        try:
            pids = m.add_points(Xw, np.asarray(prep.feat.desc)[idx], ref_kf=k)
        except RuntimeError:
            return
        m.kf_feat_point[k, idx] = pids
        m.update_point_stats(pids)

    # ------------------------------------------------------------------
    def _candidate_points(self, pt_ids: np.ndarray, T_pred: SE3):
        """Pad candidate point set + device projection. Map arrays live on
        device (cached per map version) — only the id list is uploaded per
        frame, the row gathers happen on-chip."""
        cap = self.cfg.local_pts_cap
        pt_ids = pt_ids[:cap]
        pad = cap - len(pt_ids)
        ids = np.concatenate([pt_ids, np.full(pad, -1, np.int64)])
        safe = np.where(ids >= 0, ids, 0)
        dp = self.map.device_points()
        proj = kernels.gather_and_project(
            T_pred, jnp.asarray(ids, jnp.int32),
            dp["xyz"], dp["normal"], dp["min_dist"], dp["max_dist"],
            dp["valid"], self.cam, self.orb_cfg.scale, self.orb_cfg.n_levels)
        return ids, safe, proj

    def _run_track(self, prep, T_pred, ids, safe, proj, radius_px, prior=None,
                   proj_angle=None):
        prior = (jnp.full((self.map.cfg.n_feat,), -1, jnp.int32)
                 if prior is None else jnp.asarray(prior))
        dp = self.map.device_points()
        res = kernels.match_and_optimize(
            T_pred, prep, jnp.asarray(ids, jnp.int32), proj,
            dp["desc"],
            dp["xyz"],
            radius_px * self.radius_scale, self.inv_sigma2,
            prior, self.cam,
            proj_angle=(None if proj_angle is None
                        else jnp.asarray(proj_angle, jnp.float32)))
        return res

    def _track_steady_fused(self, prep, ts, fid, use_imu=False,
                            seed_from_kfs=False) -> str:
        """The steady-state frame as ONE device dispatch + ONE packed fetch:
        motion-model tracking, on-chip local-keyframe selection, and
        local-map tracking fused into kernels.track_step_visual. Replaces
        the _track_with_motion_model -> _track_local_map pair (two serialized
        device round trips) on the OK-state path.

        seed_from_kfs: RECENTLY_LOST re-acquisition — the last frames carry
        no matches (blackout), so stage-1 candidates come from the most
        recent observation-bearing keyframes of the temporal chain instead,
        at widened radii (the reference's PredictStateIMU + TrackLocalMap
        recovery, Tracking.cc:2203-2240).

        Returns "ok", "fail1" (motion-model short: run the reference's
        fallback chain, Tracking.cc:2120), or "fail2" (local-map short:
        lost handling, Tracking.cc:3474)."""
        if use_imu:
            from . import inertial
            T_pred, v_pred = inertial.predict_pose_imu(
                self.map, self.imu, self.last.T_cw, self.imu.pre_last_frame)
            self._v_pred = v_pred
            self._v_pred_fid = fid
        else:
            T_pred = _compose_np(self.velocity, self.last.T_cw)
        cap = self.map.cfg.n_feat
        ang_of_pt = np.zeros(self.map.pt_valid.shape[0], np.float32)
        if seed_from_kfs:
            # walk the keyframe chain back from the newest, collecting
            # observed points (blackout-cadence KFs are featureless and
            # contribute nothing)
            # a long blackout leaves MANY featureless cadence keyframes at
            # the chain head — walk as deep as needed to reach
            # observation-bearing ones (bounded only by the chain itself)
            pts_l, k, hops = [], self.last_kf_id, 0
            n_got = 0
            while (k >= 0 and self.map.kf_valid[k] and hops < 64
                   and n_got < cap):
                fp = self.map.kf_feat_point[k]
                s = fp >= 0
                if s.any():
                    pts_l.append(fp[s])
                    ang_of_pt[fp[s]] = self.map.kf_feat_angle[k][s]
                    n_got += int(s.sum())
                k = int(self.map.kf_prev[k])
                hops += 1
            last_pts = (np.unique(np.concatenate(pts_l)) if pts_l
                        else np.zeros(0, np.int64))
        else:
            last_pts = np.unique(self.last.match_pt[self.last.match_pt >= 0])
        last_pts = last_pts[self.map.pt_valid[last_pts]]
        self._dbg_seed_n = len(last_pts)
        if len(last_pts) < 10:
            return "fail1"
        # stage-1 candidates: last frame's matched points, padded to the
        # feature capacity (they are <= one frame's features by construction)
        last_pts = last_pts[:cap]
        ids1 = np.full(cap, -1, np.int64)
        ids1[:len(last_pts)] = last_pts
        safe1 = np.where(ids1 >= 0, ids1, 0)
        if not seed_from_kfs:
            # rotation-consistency reference angles (ORBmatcher.cc:1950)
            lm = self.last.match_pt
            sel = lm >= 0
            last_ang = (self.last.angles if self.last.angles is not None
                        else np.asarray(self.last.prepared.feat.angle))
            ang_of_pt[lm[sel]] = last_ang[sel]
        # local-map radius, widened right after relocalization
        # (reference: Tracking.cc:4039-4062); re-acquisition widens both
        # stages the same way
        radius2 = self.cfg.local_radius
        if (seed_from_kfs
                or self.frame_id <= getattr(self, "last_reloc_fid", -999) + 2):
            radius2 = 3.0 * radius2
        dp = self.map.device_points()
        ko = self.map.device_kf_obs()
        common = (T_pred, prep,
                  jnp.asarray(ids1, jnp.int32), jnp.asarray(ang_of_pt[safe1]),
                  dp["xyz"], dp["desc"], dp["normal"], dp["min_dist"],
                  dp["max_dist"], dp["valid"],
                  ko["feat_point"], ko["valid"], ko["covis"],
                  ko["point_bits"],
                  (3.0 if seed_from_kfs else 1.0)
                  * self.cfg.motion_radius * self.radius_scale,
                  radius2 * self.radius_scale,
                  self.inv_sigma2)
        statics = dict(cam=self.cam, scale=self.orb_cfg.scale,
                       n_levels=self.orb_cfg.n_levels,
                       local_cap=self.cfg.local_pts_cap)
        # eligible for the fused inertial refine? (same gate as
        # _pose_inertial_refine; both branches host-known before dispatch)
        m = self.map
        refine = (self.imu is not None and m.imu_initialized
                  and self.imu.pre_since_kf is not None
                  and self.last_kf_id >= 0
                  and m.kf_valid[self.last_kf_id])
        use_lf = False
        if refine:
            from .inertial import GRAVITY_MAG, _extr, body_from_camera
            R_bc, t_bc = _extr(self.imu.calib)
            R_cb, t_cb = R_bc.T, -R_bc.T @ t_bc
            g = np.array([0.0, 0.0, -GRAVITY_MAG], np.float32)
            prior_key = (id(m), m.version, self.last.frame_id)
            use_lf = (getattr(self, "_imu_prior", None) is not None
                      and getattr(self, "_imu_prior_key", None) == prior_key
                      and self.imu.pre_last_frame is not None)
            if use_lf:
                res = kernels.track_step_inertial_lf(
                    *common, jnp.asarray(self.imu.v_w), self._imu_prior,
                    self.imu.pre_last_frame, jnp.asarray(g),
                    jnp.asarray(R_cb), jnp.asarray(t_cb),
                    pt_proj8=dp.get("proj8"), **statics)
            else:
                k = self.last_kf_id
                R_wb_a, p_a = body_from_camera(m.kf_R[k], m.kf_t[k],
                                               R_bc, t_bc)
                res = kernels.track_step_inertial_anchor(
                    *common, jnp.asarray(self.imu.v_w),
                    jnp.asarray(R_wb_a.astype(np.float32)),
                    jnp.asarray(p_a.astype(np.float32)),
                    jnp.asarray(m.kf_vel[k]), jnp.asarray(m.kf_bg[k]),
                    jnp.asarray(m.kf_ba[k]), self.imu.pre_since_kf,
                    jnp.asarray(g), jnp.asarray(R_cb), jnp.asarray(t_cb),
                    pt_proj8=dp.get("proj8"), **statics)
        else:
            res = kernels.track_step_visual(*common,
                                            pt_proj8=dp.get("proj8"),
                                            **statics)
        # the single packed transfer of the whole frame: visual + refine
        # leaves together (the marginalization prior stays on device), plus
        # the device depth deferral, exactly as the staged path does
        leaves = list(res)[:9]
        if refine:
            leaves += [res.ni, res.inl_i, res.v_w, res.Ri_cw, res.ti_cw]
        dev_depth = (self.cur_depth is not None
                     and not isinstance(self.cur_depth, np.ndarray))
        if dev_depth:
            leaves.append(self.cur_depth)
        got = jax.device_get(tuple(leaves))
        n1, ref_kf, match, R_cw, t_cw, ids2, visible2, cur_ang, cur_valid = \
            got[:9]
        if dev_depth:
            self.cur_depth = got[-1]
        self.cur_prep = prep
        self._cur_cache_prep = prep
        self._cur_angles = cur_ang
        self._cur_valid = cur_valid
        self._dbg_n1 = int(n1)
        # RECENTLY_LOST re-acquisition accepts with >10 inliers (reference:
        # TrackLocalMap's RECENTLY_LOST clause, Tracking.cc:3581)
        min1 = 11 if seed_from_kfs else self.cfg.min_inliers_mm
        if int(n1) < min1:
            return "fail1"
        self.ref_kf = int(ref_kf)
        vis_ids = ids2[visible2 & (ids2 >= 0)]
        self.map.pt_visible[vis_ids] += 1
        self.cur_T = SE3(R_cw, t_cw)
        self.cur_match = match
        min2 = 11 if seed_from_kfs else self.cfg.min_inliers_local
        if int((match >= 0).sum()) < min2:
            return "fail2"
        if refine:
            ni, inl_i, v_w, Ri_cw, ti_cw = got[9:14]
            if int(ni) < self.cfg.min_inliers_local:
                # keep the visual-only solution (reference: the outlier
                # bailout of PoseInertialOptimization acceptance)
                self._imu_prior = None
            else:
                self._imu_prior = res.prior     # device-resident
                self._imu_prior_key = (id(m), m.version, self.frame_id - 1)
                self.cur_T = SE3(Ri_cw, ti_cw)
                self.imu.v_w = np.asarray(v_w, np.float32)
                self.cur_match = np.where(inl_i, match, -1).astype(np.int32)
        return "ok"

    def _track_with_motion_model(self, prep, ts, fid, use_imu=False) -> bool:
        """(reference: Tracking::TrackWithMotionModel, Tracking.cc:3352;
        with IMU initialized the prediction is dead-reckoned from the last
        frame's state — Tracking::PredictStateIMU, Tracking.cc:1892)"""
        if use_imu:
            from . import inertial
            T_pred, v_pred = inertial.predict_pose_imu(
                self.map, self.imu, self.last.T_cw, self.imu.pre_last_frame)
            self._v_pred = v_pred
            self._v_pred_fid = fid
        else:
            T_pred = _compose_np(self.velocity, self.last.T_cw)
        last_pts = np.unique(self.last.match_pt[self.last.match_pt >= 0])
        last_pts = last_pts[self.map.pt_valid[last_pts]]
        if len(last_pts) < 10:
            return False
        ids, safe, proj = self._candidate_points(last_pts, T_pred)
        # rotation-consistency reference angle: the last-frame keypoint that
        # observed each candidate point (ORBmatcher.cc:1950 orientation pass)
        lm = self.last.match_pt
        sel = lm >= 0
        last_ang = (self.last.angles if self.last.angles is not None
                    else np.asarray(self.last.prepared.feat.angle))
        ang_of_pt = np.zeros(self.map.pt_valid.shape[0], np.float32)
        ang_of_pt[lm[sel]] = last_ang[sel]
        res = self._run_track(prep, T_pred, ids, safe, proj,
                              self.cfg.motion_radius,
                              proj_angle=ang_of_pt[safe])
        # one PACKED host transfer per stage (device_get overlaps the leaf
        # copies): match array + optimized pose together; inliers are
        # counted from the match array rather than syncing n_inliers
        # separately (each separate sync is a device round trip)
        match, R_cw, t_cw = jax.device_get(
            (res.match_pt, res.T_cw_R, res.T_cw_t))
        n = int((match >= 0).sum())
        if n < self.cfg.min_inliers_mm:
            return False
        self.cur_T = SE3(R_cw, t_cw)
        self.cur_prep = prep
        self.cur_match = match
        return True

    def _track_reference_keyframe(self, prep, ts, fid) -> bool:
        """(reference: Tracking::TrackReferenceKeyFrame, Tracking.cc:3171 —
        BoW-bucketed matching replaced by dense NN matching)"""
        if self.ref_kf < 0:
            return False
        if not self.map.kf_valid[self.ref_kf]:
            # reference was culled: fall back to the newest valid keyframe
            ids = self.map.kf_ids()
            if len(ids) == 0:
                return False
            self.ref_kf = int(ids[np.argmax(self.map.kf_frame_id[ids])])
        k = self.ref_kf
        res = matching.match_nn(
            prep.feat.desc, prep.feat.valid,
            jnp.asarray(self.map.kf_feat_desc[k]),
            jnp.asarray(self.map.kf_feat_valid[k]
                        & (self.map.kf_feat_point[k] >= 0)),
            max_dist=matching.TH_LOW, ratio=0.7, mutual=True)
        # orientation-consistency gate (reference: the mbCheckOrientation
        # pass of SearchByBoW, ORBmatcher.cc:259,404-424)
        dang = (jnp.asarray(self.map.kf_feat_angle[k])[res.idx]
                - prep.feat.angle)
        valid, idx = jax.device_get(
            (matching.rotation_consistency_mask(dang, res.valid), res.idx))
        kf_pt = self.map.kf_feat_point[k][idx]
        match = np.where(valid & (kf_pt >= 0), kf_pt, -1).astype(np.int32)
        if (match >= 0).sum() < 15:
            return False
        T0 = self.last.T_cw if self.last is not None else SE3.identity()
        from ..optim import pose_opt
        has = match >= 0
        safe = np.where(has, match, 0)
        opt = pose_opt.pose_optimization(
            T0, jnp.asarray(self.map.pt_xyz[safe]), prep.xy_ud,
            jnp.asarray(self.inv_sigma2)[prep.feat.level],
            jnp.asarray(has) & prep.feat.valid, self.cam)
        n_in, inl, R_cw, t_cw = jax.device_get(
            (opt.n_inliers, opt.inlier, opt.T_cw.R, opt.T_cw.t))
        if int(n_in) < self.cfg.min_inliers_mm:
            return False
        self.cur_T = SE3(R_cw, t_cw)
        self.cur_prep = prep
        self.cur_match = np.where(inl, match, -1).astype(np.int32)
        return True

    def _relocalization(self, prep, ts, fid) -> bool:
        """(reference: Tracking::Relocalization, Tracking.cc:4324 — BoW
        candidates + PnP RANSAC, delegated to the System's recognizer)"""
        out = self.relocalizer(prep)
        if out is None:
            return False
        R, t, match_pt, ref = out
        from ..optim import pose_opt
        has = match_pt >= 0
        safe = np.where(has, match_pt, 0)
        opt = pose_opt.pose_optimization(
            SE3(jnp.asarray(R), jnp.asarray(t)),
            jnp.asarray(self.map.pt_xyz[safe]), prep.xy_ud,
            jnp.asarray(self.inv_sigma2)[prep.feat.level],
            jnp.asarray(has) & prep.feat.valid, self.cam)
        n_in, inl, R_cw, t_cw = jax.device_get(
            (opt.n_inliers, opt.inlier, opt.T_cw.R, opt.T_cw.t))
        if int(n_in) < 15:
            return False
        self.cur_T = SE3(R_cw, t_cw)
        self.cur_prep = prep
        self.cur_match = np.where(inl, match_pt, -1).astype(np.int32)
        self.ref_kf = int(ref)
        self.n_relocalizations += 1
        self.last_reloc_fid = fid   # widens the local search for 2 frames
        return True

    def _track_local_map(self) -> bool:
        """(reference: Tracking::TrackLocalMap, Tracking.cc:3474)"""
        # local keyframes: observers of current points + their covisibles
        cur_pts = self.cur_match[self.cur_match >= 0]
        if len(cur_pts) == 0:
            return False
        inc = self.map.incidence()
        obs_counts = inc[:, cur_pts].sum(axis=1)
        kf_order = np.argsort(-obs_counts)
        local_kfs = [k for k in kf_order[:10] if obs_counts[k] > 0]
        if not local_kfs:
            return False
        self.ref_kf = int(local_kfs[0])
        covis = self.map.covisibility_matrix()
        extra = set()
        for k in local_kfs:
            nb = np.argsort(-covis[k])
            extra.update(int(x) for x in nb[:10] if covis[k, x] >= 15)
        local_kfs = list(dict.fromkeys(list(local_kfs) + sorted(extra)))
        pt_ids = self.map.local_point_ids(np.asarray(local_kfs))
        ids, safe, proj = self._candidate_points(pt_ids, self.cur_T)
        # widen the projection window right after relocalization or while
        # re-acquiring from RECENTLY_LOST, as the reference widens th 1->5
        # (recent reloc) / 15 (recently lost, IMU) in SearchLocalPoints
        # (reference: Tracking.cc:4039-4062)
        radius = self.cfg.local_radius
        if self.frame_id <= getattr(self, "last_reloc_fid", -999) + 2:
            radius = 3.0 * radius
        elif self.state == RECENTLY_LOST:
            radius = max(radius, self.cfg.motion_radius)
        res = self._run_track(self.cur_prep, self.cur_T, ids, safe, proj,
                              radius, prior=self.cur_match)
        # one PACKED transfer for the whole stage, issued AFTER dispatching
        # the match program so nothing stalls the device pipeline: match +
        # pose + visibility mask + the current frame's angle/valid arrays
        # (cached on the host for next frame's rotation gate / stats, so
        # they are never re-downloaded as standalone round trips)
        leaves = [res.match_pt, res.T_cw_R, res.T_cw_t, proj.visible,
                  self.cur_prep.feat.angle, self.cur_prep.feat.valid]
        dev_depth = (self.cur_depth is not None
                     and not isinstance(self.cur_depth, np.ndarray))
        if dev_depth:
            leaves.append(self.cur_depth)
        got = jax.device_get(tuple(leaves))
        match, R_cw, t_cw, visible, cur_ang, cur_valid = got[:6]
        if dev_depth:
            self.cur_depth = got[6]
        vis_ids = ids[visible & (ids >= 0)]
        self.map.pt_visible[vis_ids] += 1
        self._cur_cache_prep = self.cur_prep
        self._cur_angles = cur_ang
        self._cur_valid = cur_valid
        n = int((match >= 0).sum())
        if n < self.cfg.min_inliers_local:
            return False
        self.cur_T = SE3(R_cw, t_cw)
        self.cur_match = match
        self._pose_inertial_refine()
        return True

    def _pose_inertial_refine(self):
        """After the visual local-map optimization, re-optimize the frame's
        nav state with the preintegrated edge to the last keyframe
        (reference: TrackLocalMap uses PoseInertialOptimizationLastKeyFrame
        once the IMU is initialized, Tracking.cc:3502-3528)."""
        if (self.imu is None or not self.map.imu_initialized
                or self.imu.pre_since_kf is None or self.last_kf_id < 0
                or not self.map.kf_valid[self.last_kf_id]):
            return
        from ..optim import pose_opt
        from .inertial import GRAVITY_MAG, _extr, body_from_camera
        m = self.map
        k = self.last_kf_id
        R_bc, t_bc = _extr(self.imu.calib)
        R_wb_a, p_a = body_from_camera(m.kf_R[k], m.kf_t[k], R_bc, t_bc)
        match = self.cur_match
        has = match >= 0
        safe = np.where(has, match, 0)
        prep = self.cur_prep
        g = np.array([0.0, 0.0, -GRAVITY_MAG], np.float32)
        dp = m.device_points()
        X, w = kernels.gather_matched_rows(
            dp["xyz"], jnp.asarray(safe, jnp.int32),
            self.inv_sigma2, prep.feat.level)
        R_cb, t_cb = R_bc.T, -R_bc.T @ t_bc
        vmask = jnp.asarray(has) & prep.feat.valid
        # reference gating (Tracking.cc:3502-3528): if the map changed since
        # the last frame (KF inserted / BA applied / world re-aligned), the
        # running marginalization prior is stale — anchor to the last
        # keyframe instead and re-seed the prior; otherwise optimize jointly
        # with the last frame's 15-dof state under the prior and marginalize
        # it out (PoseInertialOptimizationLastFrame + Marginalize)
        prior_key = (id(m), m.version, self.last.frame_id
                     if self.last is not None else -1)
        use_lf = (getattr(self, "_imu_prior", None) is not None
                  and getattr(self, "_imu_prior_key", None) == prior_key
                  and self.imu.pre_last_frame is not None)
        if use_lf:
            res = pose_opt.pose_inertial_optimization_last_frame(
                self.cur_T, jnp.asarray(self.imu.v_w), self._imu_prior,
                self.imu.pre_last_frame, X, prep.xy_ud, w, vmask, self.cam,
                gravity=jnp.asarray(g),
                R_cb=jnp.asarray(R_cb), t_cb=jnp.asarray(t_cb))
            n2, inl, v_w, R_cw, t_cw, prior = jax.device_get(
                (res.n_inliers, res.inlier, res.v_w,
                 res.T_cw.R, res.T_cw.t, res.prior))
        else:
            res = pose_opt.pose_inertial_optimization(
                self.cur_T, jnp.asarray(self.imu.v_w),
                jnp.asarray(R_wb_a.astype(np.float32)),
                jnp.asarray(p_a.astype(np.float32)),
                jnp.asarray(m.kf_vel[k]), jnp.asarray(m.kf_bg[k]),
                jnp.asarray(m.kf_ba[k]), self.imu.pre_since_kf,
                X, prep.xy_ud, w, vmask, self.cam,
                gravity=jnp.asarray(g),
                R_cb=jnp.asarray(R_cb), t_cb=jnp.asarray(t_cb))
            prior_dev = pose_opt.build_frame_prior(
                res.T_cw, res.v_w, jnp.asarray(m.kf_bg[k]),
                jnp.asarray(m.kf_ba[k]),
                jnp.asarray(R_wb_a.astype(np.float32)),
                jnp.asarray(p_a.astype(np.float32)),
                jnp.asarray(m.kf_vel[k]), self.imu.pre_since_kf,
                X, prep.xy_ud, w, res.inlier, self.cam,
                jnp.asarray(g), R_cb=jnp.asarray(R_cb),
                t_cb=jnp.asarray(t_cb))
            n2, inl, v_w, R_cw, t_cw, prior = jax.device_get(
                (res.n_inliers, res.inlier, res.v_w,
                 res.T_cw.R, res.T_cw.t, prior_dev))
        if int(n2) < self.cfg.min_inliers_local:
            self._imu_prior = None
            return   # keep the visual-only solution
        # the prior is valid for the NEXT frame only while the map stays
        # unchanged and that frame follows this one directly
        self._imu_prior = prior
        self._imu_prior_key = (id(m), m.version, self.frame_id - 1)
        self.cur_T = SE3(R_cw, t_cw)
        self.imu.v_w = v_w
        self.cur_match = np.where(inl, match, -1).astype(np.int32)

    def _update_found_counters(self):
        pts = self.cur_match[self.cur_match >= 0]
        self.map.pt_found[pts] += 1

    # ------------------------------------------------------------------
    def on_map_transformed(self, R_wg: np.ndarray, s: float):
        """Re-express tracker state after Map::ApplyScaledRotation rotated
        and rescaled the world (reference: Tracking::UpdateFrameIMU,
        Tracking.cc:4769): T_cw' = (R_cw R_wg, s t_cw)."""
        self._imu_prior = None   # prior lives in the pre-transform world
        def fix(T):
            R = (np.asarray(T.R) @ R_wg).astype(np.float32)
            t = (s * np.asarray(T.t)).astype(np.float32)
            return SE3(R, t)
        if self.last is not None:
            self.last = dataclasses.replace(self.last, T_cw=fix(self.last.T_cw))
        if hasattr(self, "cur_T"):
            self.cur_T = fix(self.cur_T)
        if self.velocity is not None:
            self.velocity = SE3(np.asarray(self.velocity.R),
                                (s * np.asarray(self.velocity.t)).astype(
                                    np.float32))
        # relative trajectory rows of THIS map: R_cr invariant, t_cr scales
        self.trajectory = [
            (ts_, mid, rk, ep, R_cr,
             (s * t_cr).astype(np.float32) if mid == self.map.map_id else t_cr,
             st)
            for (ts_, mid, rk, ep, R_cr, t_cr, st) in self.trajectory]
        if self.imu is not None:
            chain = self.map.temporal_chain()
            if len(chain):
                kl = int(chain[-1])
                self.imu.v_w = self.map.kf_vel[kl].copy()
                self.imu.bg = self.map.kf_bg[kl].copy()
                self.imu.ba = self.map.kf_ba[kl].copy()

    # ------------------------------------------------------------------
    def reset_for_new_map(self, new_map: MapStore):
        """Rebind to a freshly created (empty) map and restart initialization
        (reference: Tracking::CreateMapInAtlas, Tracking.cc:3093). The frame
        counter and trajectory log continue; IMU biases carry over."""
        self.map = new_map
        self.state = NOT_INITIALIZED
        self.velocity = None
        self._imu_prior = None
        self.last = None
        self.init_ref = None
        self.ref_kf = -1
        self.last_kf_frame_id = self.frame_id
        self.last_kf_id = -1
        self.last_kf_ts = -1e9
        self.lost_count = 0
        if self.imu is not None:
            self.imu.pre_since_kf = None
            self.imu.pre_last_frame = None
            self.imu.v_w = np.zeros(3, np.float32)

    # ------------------------------------------------------------------
    def _need_new_keyframe(self) -> bool:
        """(reference: Tracking::NeedNewKeyFrame, Tracking.cc:3625)"""
        if self.localization_only:
            return False   # reference: mbOnlyTracking gate, Tracking.cc:3631
        n_tracked = int((self.cur_match >= 0).sum())
        if self.imu is not None:
            # IMU mode: keep the preintegration chain dense — insert on a
            # time cadence (reference: >= 0.25 s gap, Tracking.cc:3700-3710)
            return (self.cur_ts - self.last_kf_ts >= self.min_kf_dt
                    and n_tracked > 15)
        # reference counts only ref-KF points with >= minObs observations,
        # minObs = 3 (2 while the map has <= 2 KFs)
        # (reference: Tracking::NeedNewKeyFrame nMinObs, Tracking.cc:3659)
        min_obs = 3 if self.map.n_kf > 2 else 2
        # anchor c2 on the strongest KF of the local window, not just the
        # (possibly brand-new) reference KF: comparing against a weak ref
        # deadlocks — its own count shrinks in lockstep with the frame's,
        # so c2 never fires while tracking decays to loss. The anchor count
        # only changes when the map does: cache per (ref, map version).
        key = (self.ref_kf, id(self.map), self.map.version, min_obs)
        if getattr(self, "_ref_tracked_key", None) == key:
            ref_tracked = self._ref_tracked
        else:
            obs = self.map.observation_counts()
            anchors = [self.ref_kf]
            covis_ids, _ = self.map.covisibility(self.ref_kf, min_weight=15)
            anchors += [int(x) for x in covis_ids[:5]]
            ref_tracked = 0
            for a in anchors:
                if a < 0 or not self.map.kf_valid[a]:
                    continue
                pts = self.map.kf_feat_point[a]
                pts = pts[pts >= 0]
                ref_tracked = max(ref_tracked,
                                  int((obs[pts] >= min_obs).sum()))
            self._ref_tracked_key = key
            self._ref_tracked = ref_tracked
        # stereo/RGBD close-point pressure: few close points tracked but many
        # close features available -> insert to densify the near field
        # (reference: bNeedToInsertClose, Tracking.cc:3674-3695)
        need_close = False
        if self.cur_depth is not None and self.bf > 0:
            cur_valid = (self._cur_valid
                         if getattr(self, "_cur_cache_prep", None)
                         is self.cur_prep
                         else np.asarray(self.cur_prep.feat.valid))
            close = ((self.cur_depth > 0) & (self.cur_depth < self.th_depth)
                     & cur_valid)
            tracked_close = int((close & (self.cur_match >= 0)).sum())
            need_close = (tracked_close < 100
                          and int((close & (self.cur_match < 0)).sum()) > 70)
        c1a = self.frame_id >= self.last_kf_frame_id + self.cfg.max_frames
        c1b = self.frame_id >= self.last_kf_frame_id + self.cfg.min_frames + 1
        # c1c (stereo/RGBD only): tracking collapsed to a quarter of the
        # anchor or close points are needed (reference: Tracking.cc:3711)
        c1c = (self.sensor != SENSOR_MONO
               and (n_tracked < 0.25 * ref_tracked or need_close))
        c2 = ((n_tracked < self.cfg.ref_ratio * ref_tracked or need_close)
              and n_tracked > 15)
        # periodic floor: after max_frames without a keyframe, insert even if
        # tracking quality hasn't decayed (deviation from the reference's
        # pure-c2 gate: on very smooth motion c2 can stay silent until the
        # map is too thin to survive a disturbance; KF culling removes the
        # redundancy this creates)
        periodic = self.cfg.periodic_kf and c1a and n_tracked > 15
        return ((c1a or c1b or c1c) and c2) or periodic

    def _create_new_keyframe(self, ts, fid):
        """(reference: Tracking::CreateNewKeyFrame, Tracking.cc:3826)"""
        prep = self.cur_prep
        # one packed transfer for the whole keyframe snapshot
        xy_ud, xyn, level, angle, desc, valid = jax.device_get(
            (prep.xy_ud, prep.xyn, prep.feat.level, prep.feat.angle,
             prep.feat.desc, prep.feat.valid))
        k = self.map.add_keyframe(
            np.asarray(self.cur_T.R), np.asarray(self.cur_T.t), ts, fid,
            xy_ud, xyn, level, angle, desc, valid,
            self.cur_match.astype(np.int32))
        if self.imu is not None and self.imu.pre_since_kf is not None \
                and self.last_kf_id >= 0:
            self.map.set_kf_preintegration(k, self.imu.pre_since_kf,
                                           self.last_kf_id)
            self.map.kf_vel[k] = self.imu.v_w
            self.map.kf_bg[k] = self.imu.bg
            self.map.kf_ba[k] = self.imu.ba
            self.imu.pre_since_kf = None
        self.ref_kf = k
        self.last_kf_frame_id = fid
        self.last_kf_id = k
        self.last_kf_ts = ts
        self._create_depth_points(k)
        self.new_keyframes.append(k)
