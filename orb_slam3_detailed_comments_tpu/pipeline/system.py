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
from .local_mapping import LocalMapper, LocalMappingConfig
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
                 baseline: float = 0.0, th_depth: float = 35.0):
        if sensor not in (MONOCULAR, STEREO, RGBD):
            raise NotImplementedError(
                "round-1 build supports MONOCULAR/STEREO/RGBD; IMU variants "
                "use the imu/ + optim/vi_ba modules (pipeline wiring next round)")
        self.cam = cam
        self.sensor = sensor
        self.map = MapStore(map_cfg or MapConfig())
        from .tracking import SENSOR_MONO, SENSOR_RGBD, SENSOR_STEREO
        tsensor = {MONOCULAR: SENSOR_MONO, STEREO: SENSOR_STEREO,
                   RGBD: SENSOR_RGBD}[sensor]
        self.tracker = Tracker(cam, self.map, tracking_cfg or TrackingConfig(),
                               sensor=tsensor, bf=baseline * cam.fx,
                               th_depth=th_depth)
        self.local_mapper = LocalMapper(self.map, cam,
                                        mapping_cfg or LocalMappingConfig())
        self.enable_loop_closing = enable_loop_closing
        self.loop_closer = None
        self.kfdb = None
        self._vocab_path = vocab_path
        self._kfdb_pending: list = []
        if vocab_path is not None:
            self._build_recognition(vocab_path=vocab_path)
        if enable_loop_closing or True:
            self.tracker.relocalizer = self._relocalize

    # ------------------------------------------------------------------
    def _build_recognition(self, vocab_path=None):
        """Create the vocabulary + keyframe database. Without a pretrained
        vocabulary file (the reference ships ORBvoc.txt; we can't), train one
        from the descriptors collected so far."""
        from ..placerec import vocab as vocab_mod
        from ..placerec.keyframe_db import KeyFrameDatabase
        from .loop_closing import LoopCloser
        if vocab_path is not None:
            voc = vocab_mod.load(vocab_path)
        else:
            kfs = self.map.kf_ids()
            descs = self.map.kf_feat_desc[kfs][self.map.kf_feat_valid[kfs]]
            voc = vocab_mod.train(np.asarray(descs), k=10, levels=3)
        self.kfdb = KeyFrameDatabase(voc, self.map.cfg.max_kf)
        self.loop_closer = LoopCloser(self.map, self.cam, self.kfdb)

    def track_monocular(self, img: np.ndarray, ts: float) -> Optional[np.ndarray]:
        """Feed one grayscale frame; returns 4x4 T_cw or None
        (reference: System::TrackMonocular, System.cc:441)."""
        pose = self.tracker.track_monocular(img, ts)
        return self._post_track(pose)

    def track_stereo(self, img_l: np.ndarray, img_r: np.ndarray,
                     ts: float) -> Optional[np.ndarray]:
        """(reference: System::TrackStereo, System.cc:277)"""
        pose = self.tracker.track_stereo(img_l, img_r, ts)
        return self._post_track(pose)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   ts: float) -> Optional[np.ndarray]:
        """(reference: System::TrackRGBD, System.cc:361)"""
        pose = self.tracker.track_rgbd(img, depth, ts)
        return self._post_track(pose)

    def _post_track(self, pose):
        while self.tracker.new_keyframes:
            k = self.tracker.new_keyframes.pop(0)
            if self.map.kf_valid[k] and self.map.n_kf > 2:
                self.local_mapper.process_keyframe(k)
            if self.enable_loop_closing:
                if self.loop_closer is None and self.map.n_kf >= 3:
                    self._build_recognition()
                    for kk in self._kfdb_pending:
                        if self.map.kf_valid[kk]:
                            self.kfdb.add(kk, self.map.kf_feat_desc[kk],
                                          self.map.kf_feat_valid[kk])
                    self._kfdb_pending.clear()
                if self.loop_closer is not None:
                    if self.map.kf_valid[k]:
                        self.loop_closer.process_keyframe(k)
                else:
                    self._kfdb_pending.append(k)
        return pose

    # ------------------------------------------------------------------
    def _relocalize(self, prep):
        """Relocalization callback for the tracker: KFDB candidates ->
        descriptor matching vs candidate map points -> batched PnP RANSAC
        (reference: Tracking::Relocalization, Tracking.cc:4324)."""
        if self.kfdb is None:
            return None
        import jax
        import jax.numpy as jnp
        from ..placerec import pnp
        from ..ops import matching as matching_mod
        m = self.map
        desc = np.asarray(prep.feat.desc)
        fvalid = np.asarray(prep.feat.valid)
        cands = self.kfdb.detect_relocalization_candidates(m, desc, fvalid)
        for c in cands:
            res = matching_mod.match_nn(
                jnp.asarray(desc), jnp.asarray(fvalid),
                jnp.asarray(m.kf_feat_desc[c]),
                jnp.asarray(m.kf_feat_valid[c] & (m.kf_feat_point[c] >= 0)),
                max_dist=75, ratio=0.9, mutual=True)
            valid = np.asarray(res.valid)
            if valid.sum() < 15:
                continue
            fidx = np.where(valid)[0]
            pids = m.kf_feat_point[c][np.asarray(res.idx)[fidx]]
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
            return np.asarray(sol.R), np.asarray(sol.t), match_pt, c
        return None

    def shutdown(self):
        pass

    # ------------------------------------------------------------------
    def trajectory_tum(self) -> list:
        """Frame trajectory in TUM format rows (t tx ty tz qx qy qz qw),
        replaying relative poses against (possibly BA-corrected) reference
        keyframes (reference: System::SaveTrajectoryEuRoC, System.cc:721)."""
        import jax.numpy as jnp
        rows = []
        for ts, ref_kf, epoch, R_cr, t_cr, state in self.tracker.trajectory:
            resolved = self.map.resolve_kf_pose(ref_kf, epoch)
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
            for ts, ref_kf, epoch, R_cr, t_cr, state in self.tracker.trajectory:
                resolved = self.map.resolve_kf_pose(ref_kf, epoch)
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

    def save_atlas(self, path: str):
        """Checkpoint the map (reference: System::SaveAtlas, System.cc:1466).
        Note: single-map System; the Atlas class covers multi-map."""
        from ..mapping.atlas import Atlas
        from ..utils import serialization
        a = Atlas(self.map.cfg)
        a.maps = [self.map]
        serialization.save_atlas(a, path)

    def load_atlas(self, path: str):
        from ..utils import serialization
        a = serialization.load_atlas(path)
        self.map = a.maps[a.active_id]
        self.tracker.map = self.map
        self.local_mapper.map = self.map
        if self.loop_closer is not None:
            self.loop_closer.map = self.map

    @property
    def n_keyframes(self):
        return self.map.n_kf

    @property
    def n_map_points(self):
        return self.map.n_points
