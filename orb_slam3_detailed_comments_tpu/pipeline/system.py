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
                 mapping_cfg: Optional[LocalMappingConfig] = None):
        if sensor != MONOCULAR:
            raise NotImplementedError(
                "round-1 build supports MONOCULAR; stereo/RGBD/IMU land next")
        self.cam = cam
        self.sensor = sensor
        self.map = MapStore(map_cfg or MapConfig())
        self.tracker = Tracker(cam, self.map, tracking_cfg or TrackingConfig())
        self.local_mapper = LocalMapper(self.map, cam,
                                        mapping_cfg or LocalMappingConfig())

    def track_monocular(self, img: np.ndarray, ts: float) -> Optional[np.ndarray]:
        """Feed one grayscale frame; returns 4x4 T_cw or None
        (reference: System::TrackMonocular, System.cc:441)."""
        pose = self.tracker.track_monocular(img, ts)
        while self.tracker.new_keyframes:
            k = self.tracker.new_keyframes.pop(0)
            if self.map.kf_valid[k] and self.map.n_kf > 2:
                self.local_mapper.process_keyframe(k)
        return pose

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
        with open(path, "w") as f:
            for row in self.trajectory_tum():
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")

    @property
    def n_keyframes(self):
        return self.map.n_kf

    @property
    def n_map_points(self):
        return self.map.n_points
