"""Tensor map store: the SLAM map as fixed-capacity SoA arrays.

Replaces the reference's pointer-graph data model — KeyFrame/MapPoint/Map
objects behind per-object mutexes (reference: src/KeyFrame.cc, src/MapPoint.cc,
src/Map.cc) — with padded arrays + validity masks + a version counter. Device
kernels (matching, BA) consume slices of these arrays directly; host-side
bookkeeping (slot allocation, covisibility queries, window selection) runs on
the numpy mirrors. There are no locks: the pipeline stages exchange immutable
snapshots, which is the tensorized form of the reference's
Map::GetMapChangeIndex handshake (reference: include/Map.h:110-113).

Observation structure: `kf_feat_point[k, i]` = map-point id observed by
feature i of keyframe k (or -1). This single array plays the role of both
KeyFrame::mvpMapPoints and MapPoint::mObservations; the [K, P] incidence
matrix and the covisibility graph are derived from it by scatter/matmul.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

NO_POINT = -1

_DELTA_FN = None


def _delta_update(dev: dict, idx, new_rows: dict) -> dict:
    """All per-array row scatters of a device-cache delta in ONE jitted
    dispatch (module-level cache: a fresh closure per call would re-trace)."""
    global _DELTA_FN
    if _DELTA_FN is None:
        import jax

        @jax.jit
        def f(dev, idx, new_rows):
            return {k: v.at[idx].set(new_rows[k]) for k, v in dev.items()}

        _DELTA_FN = f
    return _DELTA_FN(dev, idx, new_rows)


def pack_point_bits(fp_rows: np.ndarray, max_pt: int) -> np.ndarray:
    """[R, N] feature->point rows -> [R, max_pt/32] membership bitsets
    (bit p&31 of word p>>5 set iff point p is observed by the row's KF).
    The fused tracking step ANDs/ORs these on-chip instead of scattering
    or gathering K*N point ids (scatter/gather of 262k ids serialized to
    ~2 ms each per frame on TPU; the bitset forms are ~0)."""
    R, _ = fp_rows.shape
    bits = np.zeros((R, max_pt // 32), np.uint32)
    # mask both ends: a corrupted observation table (entry >= max_pt) must
    # degrade to "point not in bitset", not crash the host upload path
    r, c = np.nonzero((fp_rows >= 0) & (fp_rows < max_pt))
    p = fp_rows[r, c]
    np.bitwise_or.at(bits, (r, p >> 5),
                     (np.uint32(1) << (p & 31).astype(np.uint32)))
    return bits


@dataclass
class MapConfig:
    max_kf: int = 256
    max_pt: int = 16384
    n_feat: int = 1024        # per-KF feature capacity (extractor budget)
    n_levels: int = 8
    scale: float = 1.2

    def __post_init__(self):
        # the point-membership bitsets (_pack_point_bits, kernels' P//32
        # reshapes) require a whole number of 32-bit words; round up
        self.max_pt = (self.max_pt + 31) & ~31


class MapStore:
    """One map of the Atlas. Host-side numpy SoA; jnp views taken on demand."""

    def __init__(self, cfg: MapConfig):
        self.cfg = cfg
        self.map_id = 0   # index within the Atlas (reference: Map::GetId)
        K, P, N = cfg.max_kf, cfg.max_pt, cfg.n_feat
        # keyframes
        self.kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        self.kf_t = np.zeros((K, 3), np.float32)
        self.kf_valid = np.zeros(K, bool)
        self.kf_ts = np.zeros(K, np.float64)
        self.kf_frame_id = np.full(K, -1, np.int64)
        # slot-reuse bookkeeping: epoch increments on reuse; tombstones let
        # trajectory rows logged against a culled KF be re-anchored (the
        # tensor-store analog of the reference's spanning-tree parent chain
        # used by SaveTrajectoryEuRoC, System.cc:721)
        self.kf_epoch = np.zeros(K, np.int64)
        self.tombstones: dict = {}   # (slot, epoch) -> (slot', epoch', R_rel, t_rel)
        # per-KF features
        self.kf_feat_xy = np.zeros((K, N, 2), np.float32)    # undistorted px
        self.kf_feat_xyn = np.zeros((K, N, 2), np.float32)   # normalized coords
        self.kf_feat_level = np.zeros((K, N), np.int32)
        self.kf_feat_angle = np.zeros((K, N), np.float32)
        self.kf_feat_desc = np.zeros((K, N, 8), np.uint32)
        self.kf_feat_valid = np.zeros((K, N), bool)
        self.kf_feat_point = np.full((K, N), NO_POINT, np.int32)
        # per-KF inertial state (reference: KeyFrame's mVw/mImuBias/mpImuPreintegrated
        # + mPrevKF/mNextKF chain, include/KeyFrame.h): velocity, biases, the
        # preintegrated window from the PREVIOUS keyframe, temporal link
        self.kf_vel = np.zeros((K, 3), np.float32)
        self.kf_bg = np.zeros((K, 3), np.float32)
        self.kf_ba = np.zeros((K, 3), np.float32)
        self.kf_prev = np.full(K, -1, np.int32)
        self.kf_pre_dT = np.zeros(K, np.float32)
        self.kf_pre_dR = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        self.kf_pre_dV = np.zeros((K, 3), np.float32)
        self.kf_pre_dP = np.zeros((K, 3), np.float32)
        self.kf_pre_C = np.zeros((K, 15, 15), np.float32)
        self.kf_pre_JRg = np.zeros((K, 3, 3), np.float32)
        self.kf_pre_JVg = np.zeros((K, 3, 3), np.float32)
        self.kf_pre_JVa = np.zeros((K, 3, 3), np.float32)
        self.kf_pre_JPg = np.zeros((K, 3, 3), np.float32)
        self.kf_pre_JPa = np.zeros((K, 3, 3), np.float32)
        # bias the window was integrated at (first-order corrections in the
        # delta getters must reference THIS bias, not the later estimate)
        self.kf_pre_bg0 = np.zeros((K, 3), np.float32)
        self.kf_pre_ba0 = np.zeros((K, 3), np.float32)
        # map-level IMU flags (reference: Map::SetIniertialBA1/2, isImuInitialized)
        self.imu_initialized = False
        self.imu_ba1 = False
        self.imu_ba2 = False
        # map points
        self.pt_xyz = np.zeros((P, 3), np.float32)
        self.pt_valid = np.zeros(P, bool)
        self.pt_desc = np.zeros((P, 8), np.uint32)
        self.pt_normal = np.zeros((P, 3), np.float32)
        self.pt_min_dist = np.zeros(P, np.float32)
        self.pt_max_dist = np.zeros(P, np.float32)
        self.pt_ref_kf = np.full(P, -1, np.int32)
        self.pt_first_kf = np.full(P, -1, np.int32)
        self.pt_found = np.zeros(P, np.int32)     # matched-in-tracking count
        self.pt_visible = np.zeros(P, np.int32)   # predicted-visible count
        # forwarding pointer set by replace_point, so id lists captured
        # before a fuse can be re-resolved (reference: MapPoint::GetReplaced,
        # MapPoint.cc mpReplaced)
        self.pt_replaced_by = np.full(P, -1, np.int32)
        self.version = 0
        # bumped only on "big" corrections — loop closure, applied GBA,
        # map merge (reference: Map::IncreaseChangeIndex consumers via
        # System::MapChanged, Map.h:110-113)
        self.big_change_idx = 0
        self._scale_factors = cfg.scale ** np.arange(cfg.n_levels)

    # ---- allocation ------------------------------------------------------

    def alloc_kf(self) -> int:
        free = np.where(~self.kf_valid)[0]
        if len(free) == 0:
            self.grow(grow_kf=True)
            free = np.where(~self.kf_valid)[0]
        return int(free[0])

    def alloc_points(self, n: int) -> np.ndarray:
        free = np.where(~self.pt_valid)[0]
        while len(free) < n:
            self.grow(grow_pt=True)
            free = np.where(~self.pt_valid)[0]
        return free[:n]

    def grow(self, grow_kf: bool = False, grow_pt: bool = False):
        """Double keyframe and/or point capacity in place. The reference's
        pointer graph grows unboundedly; our SoA arrays instead re-allocate
        geometrically, so long sequences never hit a hard capacity wall.
        Shape-keyed jit caches recompile once per doubling (log2 times over
        a run); version-keyed caches invalidate via the version bump."""
        from dataclasses import replace
        cfg2 = replace(
            self.cfg,
            max_kf=self.cfg.max_kf * 2 if grow_kf else self.cfg.max_kf,
            max_pt=self.cfg.max_pt * 2 if grow_pt else self.cfg.max_pt)
        fresh = MapStore(cfg2)
        for name, arr in list(vars(self).items()):
            if not isinstance(arr, np.ndarray):
                continue
            new = getattr(fresh, name, None)
            # only the freshly-initialized SoA arrays (same trailing shape,
            # first dim grown or equal); private caches are left to the
            # version-bump invalidation
            if (isinstance(new, np.ndarray) and new.dtype == arr.dtype
                    and new.shape[1:] == arr.shape[1:]
                    and len(new) >= len(arr)):
                new[:len(arr)] = arr
                setattr(self, name, new)
        self.cfg = cfg2
        self.version += 1

    @property
    def n_kf(self) -> int:
        return int(self.kf_valid.sum())

    @property
    def n_points(self) -> int:
        return int(self.pt_valid.sum())

    def kf_ids(self) -> np.ndarray:
        return np.where(self.kf_valid)[0]

    # ---- device-resident view -------------------------------------------

    def device_points(self):
        """Device copies of the point arrays, cached per map version.

        The hot per-frame path must not re-upload host map slices each frame
        (over a network-attached chip that upload dominates the frame time);
        points change only when local mapping/BA bumps `version`, so one
        upload then serves every tracking step until the next keyframe.
        """
        import jax.numpy as jnp
        if getattr(self, "_dev_pts_v", -1) == self.version:
            return self._dev_pts
        names = [("xyz", "pt_xyz"), ("desc", "pt_desc"),
                 ("normal", "pt_normal"), ("min_dist", "pt_min_dist"),
                 ("max_dist", "pt_max_dist"), ("valid", "pt_valid")]
        snap = getattr(self, "_dev_pts_snap", None)
        P = len(self.pt_valid)
        if snap is None or len(snap["valid"]) != P:
            # first upload, or capacity grew: ship everything
            self._dev_pts = {k: jnp.asarray(getattr(self, a))
                             for k, a in names}
        else:
            # a keyframe event typically touches a few hundred of the 16k+
            # rows; transfer only those (the tunnel's upload bandwidth is
            # the scarce resource, ~1 MB for a full point-array refresh)
            changed = np.zeros(P, bool)
            for k, a in names:
                diff = getattr(self, a) != snap[k]
                changed |= diff.reshape(P, -1).any(axis=1)
            rows = np.where(changed)[0]
            if len(rows) > 0.3 * P:
                self._dev_pts = {k: jnp.asarray(getattr(self, a))
                                 for k, a in names}
            elif len(rows):
                # pad the row list to a bucket so the scatter compiles once
                # per bucket, not once per distinct row count; duplicated
                # indices carry identical values, so the set is well-defined
                B = 256 * int(np.ceil(len(rows) / 256))
                rows_p = np.concatenate(
                    [rows, np.full(B - len(rows), rows[0], rows.dtype)])
                new_rows = {k: jnp.asarray(getattr(self, a)[rows_p])
                            for k, a in names}
                base = {k: self._dev_pts[k] for k, _ in names}
                self._dev_pts = _delta_update(
                    base, jnp.asarray(rows_p, jnp.int32), new_rows)
            # else: nothing changed, keep the device arrays as they are
        # derived packed projection rows [P, 8] = (xyz, normal, min, max):
        # the fused tracking step's candidate gathers pull ONE row instead
        # of four per-array gathers (XLA splits row gathers per column;
        # measured 69 -> 29 us for the 4096-candidate gather set). Rebuilt
        # on-device per map version — one 512 KB fused concat per KF event.
        import jax.numpy as jnp2
        dpd = self._dev_pts
        self._dev_pts = dict(dpd)
        self._dev_pts["proj8"] = jnp2.concatenate(
            [dpd["xyz"], dpd["normal"], dpd["min_dist"][:, None],
             dpd["max_dist"][:, None]], axis=1)
        self._dev_pts_snap = {k: getattr(self, a).copy() for k, a in names}
        self._dev_pts_v = self.version
        return self._dev_pts

    def _pack_point_bits(self, fp_rows: np.ndarray) -> np.ndarray:
        return pack_point_bits(fp_rows, self.cfg.max_pt)

    def device_kf_obs(self):
        """Device copies of the observation structure needed for on-chip
        local-keyframe selection (the fused tracking step): kf_feat_point
        [K, N], the point-membership bitsets point_bits [K, max_pt/32],
        kf_valid [K], and the covisibility matrix [K, K]. Cached per
        map version like device_points; kf rows are delta-uploaded (a
        keyframe event touches the new KF's row plus the handful of fuse-
        modified neighbors, not the whole 1 MB array)."""
        import jax.numpy as jnp
        if getattr(self, "_dev_kf_v", -1) == self.version:
            return self._dev_kf
        K = self.cfg.max_kf
        snap = getattr(self, "_dev_kf_snap", None)
        covis = self.covisibility_matrix()
        if (snap is None or snap.shape != self.kf_feat_point.shape
                or self._dev_kf["point_bits"].shape[1] != self.cfg.max_pt // 32):
            self._dev_kf = {
                "feat_point": jnp.asarray(self.kf_feat_point),
                "point_bits": jnp.asarray(
                    self._pack_point_bits(self.kf_feat_point)),
                "valid": jnp.asarray(self.kf_valid),
                "covis": jnp.asarray(covis),
            }
        else:
            rows = np.where((self.kf_feat_point != snap).any(axis=1))[0]
            base = {"valid": jnp.asarray(self.kf_valid),
                    "covis": jnp.asarray(covis)}
            if len(rows) > 0.5 * K:
                base["feat_point"] = jnp.asarray(self.kf_feat_point)
                base["point_bits"] = jnp.asarray(
                    self._pack_point_bits(self.kf_feat_point))
            elif len(rows):
                B = 8 * int(np.ceil(len(rows) / 8))
                rows_p = np.concatenate(
                    [rows, np.full(B - len(rows), rows[0], rows.dtype)])
                upd = _delta_update(
                    {"feat_point": self._dev_kf["feat_point"],
                     "point_bits": self._dev_kf["point_bits"]},
                    jnp.asarray(rows_p, jnp.int32),
                    {"feat_point": jnp.asarray(self.kf_feat_point[rows_p]),
                     "point_bits": jnp.asarray(self._pack_point_bits(
                         self.kf_feat_point[rows_p]))},
                )
                base["feat_point"] = upd["feat_point"]
                base["point_bits"] = upd["point_bits"]
            else:
                base["feat_point"] = self._dev_kf["feat_point"]
                base["point_bits"] = self._dev_kf["point_bits"]
            self._dev_kf = base
        self._dev_kf_snap = self.kf_feat_point.copy()
        self._dev_kf_v = self.version
        return self._dev_kf

    # ---- keyframe insertion ---------------------------------------------

    def add_keyframe(self, R, t, ts, frame_id, feat_xy, feat_xyn, feat_level,
                     feat_angle, feat_desc, feat_valid, feat_point) -> int:
        k = self.alloc_kf()
        self.kf_R[k] = R
        self.kf_t[k] = t
        self.kf_ts[k] = ts
        self.kf_frame_id[k] = frame_id
        self.kf_feat_xy[k] = feat_xy
        self.kf_feat_xyn[k] = feat_xyn
        self.kf_feat_level[k] = feat_level
        self.kf_feat_angle[k] = feat_angle
        self.kf_feat_desc[k] = feat_desc
        self.kf_feat_valid[k] = feat_valid
        # follow fuse forwarding for links whose point was replaced since the
        # frame was matched, and drop links to culled points (the reference
        # filters with MapPoint::isBad / GetReplaced when building KeyFrame
        # observations)
        fp = np.asarray(feat_point).copy()
        for _ in range(4):
            dead = (fp >= 0) & ~self.pt_valid[np.clip(fp, 0, None)]
            if not dead.any():
                break
            fp = np.where(dead, self.pt_replaced_by[np.clip(fp, 0, None)], fp)
        fp = np.where((fp >= 0) & self.pt_valid[np.clip(fp, 0, None)],
                      fp, NO_POINT)
        # forwarding can collide two features onto one point: keep the first
        idx = np.where(fp >= 0)[0]
        if len(idx):
            _, first = np.unique(fp[idx], return_index=True)
            dup = np.ones(len(idx), bool)
            dup[first] = False
            fp[idx[dup]] = NO_POINT
        self.kf_feat_point[k] = fp
        self.kf_valid[k] = True
        self.kf_epoch[k] += 1
        self.version += 1
        return k

    def remove_keyframe(self, k: int):
        """Cull a keyframe (reference: KeyFrame::SetBadFlag). Records a
        tombstone so trajectory rows anchored to it can be replayed through
        the most-covisible surviving keyframe."""
        succ_ids, _ = self.covisibility(k, min_weight=1)
        if len(succ_ids) == 0:
            ids = self.kf_ids()
            succ_ids = ids[ids != k]
        if len(succ_ids) > 0:
            s = int(succ_ids[0])
            # T_k ∘ T_s^-1 at cull time
            R_rel = self.kf_R[k] @ self.kf_R[s].T
            t_rel = self.kf_t[k] - R_rel @ self.kf_t[s]
            self.tombstones[(k, int(self.kf_epoch[k]))] = (
                s, int(self.kf_epoch[s]), R_rel.copy(), t_rel.copy())
        self._merge_preintegration_chain(k)
        owned = self.kf_feat_point[k]
        owned = np.unique(owned[owned >= 0])
        self.kf_valid[k] = False
        self.kf_feat_point[k] = NO_POINT
        self.kf_feat_valid[k] = False
        # points that referenced or were solely observed by k: re-anchor
        # pt_ref_kf on a surviving observer; kill the now-unobserved
        # (reference: KeyFrame::SetBadFlag erases its observations, and
        # MapPoint::EraseObservation culls points that lose their backing)
        refd = np.where(self.pt_valid & (self.pt_ref_kf == k))[0]
        targets = np.union1d(owned[self.pt_valid[owned]], refd)
        if len(targets):
            ki, fi = np.nonzero((self.kf_feat_point >= 0)
                                & self.kf_valid[:, None])
            pids = self.kf_feat_point[ki, fi]
            if len(pids) == 0:
                self.remove_points(targets)
            else:
                order = np.argsort(pids, kind="stable")
                ps, ks = pids[order], ki[order]
                idx = np.searchsorted(ps, targets)
                safe = np.minimum(idx, len(ps) - 1)
                has = (idx < len(ps)) & (ps[safe] == targets)
                self.remove_points(targets[~has])
                re = np.isin(targets, refd) & has
                self.pt_ref_kf[targets[re]] = ks[safe[re]]
        self.version += 1

    def _merge_preintegration_chain(self, k: int):
        """Keep the temporal IMU chain connected across a cull: merge k's
        preintegrated window into its successor's (reference:
        Preintegrated::MergePrevious on KeyFrame culling,
        LocalMapping.cc:1230-1250, ImuTypes.cc:330)."""
        nxt = np.where(self.kf_prev == k)[0]
        if len(nxt) == 0 or self.kf_pre_dT[k] <= 0:
            # nothing downstream, or k had no window: just unlink
            for n in nxt:
                self.kf_prev[n] = int(self.kf_prev[k])
            return
        from ..imu import preintegration as pre_mod
        n = int(nxt[0])
        if self.kf_pre_dT[n] > 0:
            a = self._single_pre(k)
            b = self._single_pre(n)
            merged = pre_mod.merge(a, b)
            self.set_kf_preintegration(n, merged, int(self.kf_prev[k]))
        else:
            self.kf_prev[n] = int(self.kf_prev[k])

    def _single_pre(self, k: int):
        """One KF's stored Preintegrated window (unbatched pytree)."""
        import jax.numpy as jnp
        from ..imu.preintegration import Preintegrated
        return Preintegrated(
            dT=jnp.asarray(self.kf_pre_dT[k]),
            dR=jnp.asarray(self.kf_pre_dR[k]),
            dV=jnp.asarray(self.kf_pre_dV[k]),
            dP=jnp.asarray(self.kf_pre_dP[k]),
            C=jnp.asarray(self.kf_pre_C[k]),
            JRg=jnp.asarray(self.kf_pre_JRg[k]),
            JVg=jnp.asarray(self.kf_pre_JVg[k]),
            JVa=jnp.asarray(self.kf_pre_JVa[k]),
            JPg=jnp.asarray(self.kf_pre_JPg[k]),
            JPa=jnp.asarray(self.kf_pre_JPa[k]),
            bg0=jnp.asarray(self.kf_pre_bg0[k]),
            ba0=jnp.asarray(self.kf_pre_ba0[k]))

    def resolve_kf_pose(self, slot: int, epoch: int):
        """World->camera pose of a (possibly culled) keyframe incarnation.
        Follows tombstone chains of any depth (visited-set cycle guard —
        long heavily-culled runs chain anchors dozens deep); on success the
        chain is compressed to point straight at the live anchor, so replay
        stays O(1) amortized. Returns (R, t) or None if unresolvable."""
        key0 = (slot, epoch)
        R_acc = np.eye(3, dtype=np.float32)
        t_acc = np.zeros(3, np.float32)
        seen = set()
        while True:
            if self.kf_valid[slot] and self.kf_epoch[slot] == epoch:
                if (slot, epoch) != key0 and key0 in self.tombstones:
                    # path compression: re-anchor the original tombstone
                    # directly on the live keyframe (equivalent composed
                    # relative pose; scales correctly under
                    # apply_scaled_rotation since t_acc is a sum of
                    # rotated t_rel links, each of which scales)
                    self.tombstones[key0] = (slot, epoch,
                                             R_acc.copy(), t_acc.copy())
                R = R_acc @ self.kf_R[slot]
                t = R_acc @ self.kf_t[slot] + t_acc
                return R, t
            key = (slot, epoch)
            if key in seen:
                return None
            seen.add(key)
            tomb = self.tombstones.get(key)
            if tomb is None:
                return None
            s, e, R_rel, t_rel = tomb
            t_acc = R_acc @ t_rel + t_acc
            R_acc = R_acc @ R_rel
            slot, epoch = s, e

    # ---- points ----------------------------------------------------------

    def add_points(self, xyz, desc, ref_kf: int, normals=None,
                   min_dist=None, max_dist=None) -> np.ndarray:
        ids = self.alloc_points(len(xyz))
        self.pt_xyz[ids] = xyz
        self.pt_desc[ids] = desc
        self.pt_valid[ids] = True
        self.pt_replaced_by[ids] = -1    # slots may be reused after culling
        self.pt_ref_kf[ids] = ref_kf
        self.pt_first_kf[ids] = ref_kf
        self.pt_found[ids] = 1
        self.pt_visible[ids] = 1
        if normals is not None:
            self.pt_normal[ids] = normals
        if min_dist is not None:
            self.pt_min_dist[ids] = min_dist
            self.pt_max_dist[ids] = max_dist
        self.version += 1
        return ids

    def remove_points(self, ids: np.ndarray):
        if len(ids) == 0:
            return
        self.pt_valid[ids] = False
        # detach from all keyframes
        mask = np.isin(self.kf_feat_point, ids)
        self.kf_feat_point[mask] = NO_POINT
        self.version += 1

    def replace_point(self, old_id: int, new_id: int):
        """Fuse old into new (reference: MapPoint::Replace)."""
        from .. import native
        if native.available:
            native.replace_point(self.kf_valid, self.kf_feat_point,
                                 old_id, new_id)
        else:
            mask = self.kf_feat_point == old_id
            # avoid duplicate observation of new_id in the same KF
            for k in np.where(mask.any(axis=1))[0]:
                if (self.kf_feat_point[k] == new_id).any():
                    self.kf_feat_point[k][self.kf_feat_point[k] == old_id] = NO_POINT
                else:
                    self.kf_feat_point[k][self.kf_feat_point[k] == old_id] = new_id
        self.pt_found[new_id] += self.pt_found[old_id]
        self.pt_visible[new_id] += self.pt_visible[old_id]
        self.pt_valid[old_id] = False
        self.pt_replaced_by[old_id] = new_id
        self.version += 1

    def fuse_observations(self, kf: int, pids, feats) -> int:
        """Apply fuse matches into keyframe `kf`: each candidate point
        pids[i], matched at feature feats[i], either replaces the weaker
        duplicate already at that feature (keep the more-observed point,
        reference ORBmatcher::Fuse, ORBmatcher.cc:1325) or becomes a new
        observation. Keeps the one-observation-per-point-per-keyframe
        invariant, follows replace forwarding chains, and bumps `version`
        when links changed. Returns the number of changes. This is THE
        apply loop for all fuse paths (SearchInNeighbors both directions,
        LoopClosing::SearchAndFuse)."""
        obs = self.observation_counts().copy()
        row = self.kf_feat_point[kf]
        kf_pts = set(int(x) for x in row[row >= 0])
        changed = 0
        for pid, f in zip(pids, feats):
            pid = self.resolve_pid(int(pid))
            if pid < 0:
                continue
            f = int(f)
            existing = int(self.kf_feat_point[kf, f])
            if existing >= 0:
                if existing == pid or not self.pt_valid[existing]:
                    continue
                keep, kill = ((pid, existing) if obs[pid] >= obs[existing]
                              else (existing, pid))
                self.replace_point(kill, keep)
                obs[keep] += obs[kill]
                obs[kill] = 0
                row = self.kf_feat_point[kf]      # links were rewritten
                kf_pts = set(int(x) for x in row[row >= 0])
                changed += 1
            elif pid not in kf_pts:
                self.kf_feat_point[kf, f] = pid
                kf_pts.add(pid)
                obs[pid] += 1
                changed += 1
        if changed:
            self.version += 1
        return changed

    def resolve_pid(self, pid: int) -> int:
        """Follow replace_point forwarding to the surviving point; -1 if the
        chain ends at a dead/unreplaced point (reference: the
        MapPoint::GetReplaced loop in LoopClosing::SearchAndFuse)."""
        hops = 0
        while pid >= 0 and not self.pt_valid[pid] and hops < 32:
            pid = int(self.pt_replaced_by[pid])
            hops += 1
        return pid if pid >= 0 and self.pt_valid[pid] else -1

    # ---- derived structures ----------------------------------------------

    def observation_counts(self) -> np.ndarray:
        """[P] number of keyframes observing each point."""
        from .. import native
        if native.available:
            return native.observation_counts(self.kf_valid, self.kf_feat_point,
                                             self.cfg.max_pt)
        P = self.cfg.max_pt
        flat = self.kf_feat_point[self.kf_valid].ravel()
        flat = flat[flat >= 0]
        return np.bincount(flat, minlength=P)

    def incidence(self) -> np.ndarray:
        """[K, P] bool: KF k observes point p. Cached per map version."""
        if getattr(self, "_inc_cache_v", -1) == self.version:
            return self._inc_cache
        K, P = self.cfg.max_kf, self.cfg.max_pt
        inc = np.zeros((K, P), bool)
        kk, ff = np.where(self.kf_feat_point >= 0)
        inc[kk, self.kf_feat_point[kk, ff]] = True
        inc &= self.kf_valid[:, None]
        self._inc_cache = inc
        self._inc_cache_v = self.version
        return inc

    def incidence_bits(self) -> np.ndarray:
        """[K, ceil(P/64)] uint64 incidence bitsets (native; cached per map
        version). AND+popcount over these replaces the [K,P] incidence
        matmuls — ~20x less host time per covisibility query."""
        if getattr(self, "_bits_cache_v", -1) == self.version:
            return self._bits_cache
        from .. import native
        self._bits_cache = native.build_incidence_bits(
            self.kf_valid, self.kf_feat_point, self.cfg.max_pt)
        self._bits_cache_v = self.version
        return self._bits_cache

    def _covis_weights(self, ks) -> np.ndarray:
        """[len(ks), K] shared-point counts (native bitsets when available,
        numpy incidence matmul otherwise)."""
        from .. import native
        if native.available:
            return native.covis_counts(self.incidence_bits(), self.kf_valid,
                                       np.asarray(ks, np.int64))
        inc = self.incidence()
        return (inc[np.asarray(ks, np.int64)].astype(np.int32)
                @ inc.astype(np.int32).T)

    def covisibility(self, k: int, min_weight: int = 15) -> tuple:
        """Keyframes sharing >= min_weight points with KF k, sorted by weight
        (reference: KeyFrame::UpdateConnections threshold 15)."""
        w = self._covis_weights([k])[0]
        w[k] = 0
        ids = np.where(w >= min_weight)[0]
        order = np.argsort(-w[ids])
        return ids[order], w[ids][order]

    def covisibility_batch(self, ks: np.ndarray, min_weight: int = 15
                           ) -> list:
        """covisibility() for several keyframes in one native pass (or one
        [K,P]@[P,n] product). Returns [(ids, weights), ...]."""
        W = self._covis_weights(ks)
        out = []
        for j, k in enumerate(ks):
            w = W[j]
            w[int(k)] = 0
            ids = np.where(w >= min_weight)[0]
            order = np.argsort(-w[ids])
            out.append((ids[order], w[ids][order]))
        return out

    def observers_of_points(self, pt_ids) -> np.ndarray:
        """[K] bool: live KFs observing ANY of pt_ids (the local-BA
        frontier query)."""
        from .. import native
        if native.available and len(pt_ids):
            return native.observers_of(self.incidence_bits(), self.kf_valid,
                                       pt_ids, self.cfg.max_pt)
        return self.incidence()[:, np.asarray(pt_ids, np.int64)].any(axis=1)

    def covisibility_matrix(self) -> np.ndarray:
        """[K, K] shared-point counts (int32). Cached per map version; the
        [K, P] @ [P, K] product only spans the live keyframes."""
        if getattr(self, "_cov_cache_v", -1) == self.version:
            return self._cov_cache
        K = self.cfg.max_kf
        ids = self.kf_ids()
        cov = np.zeros((K, K), np.int32)
        if len(ids):
            cov[ids] = self._covis_weights(ids)
        self._cov_cache = cov
        self._cov_cache_v = self.version
        return cov

    def point_observers(self, pid: int) -> np.ndarray:
        return np.where((self.kf_feat_point == pid).any(axis=1) & self.kf_valid)[0]

    def check_invariants(self) -> list:
        """Debug self-check of the tensor map's graph consistency — the
        SoA analog of the reference's Map::CheckEssentialGraph (Map.h:128),
        which walks the spanning tree validating parent links. Returns a
        list of violation strings; empty means consistent."""
        errs = []
        inc = self.incidence()
        # live feature->point links must target live points
        fp = self.kf_feat_point[self.kf_valid]
        live = fp[fp >= 0]
        if live.size:
            n_dead = int((~self.pt_valid[live]).sum())
            if n_dead:
                errs.append(f"{n_dead} feature links target dead points")
        # no keyframe may observe the same point through two features
        for k in self.kf_ids():
            row = self.kf_feat_point[k]
            row = row[row >= 0]
            if len(row) != len(np.unique(row)):
                errs.append(f"KF {k} has duplicate point observations")
        # every live point must be observed by >=1 live keyframe
        n_orphan = int((self.pt_valid & ~inc.any(axis=0)).sum())
        if n_orphan:
            errs.append(f"{n_orphan} live points have no observers")
        # reference keyframes of live points must be live
        ref = self.pt_ref_kf[self.pt_valid]
        bad_ref = int(((ref < 0) | ~self.kf_valid[np.clip(ref, 0, None)]).sum())
        if bad_ref:
            errs.append(f"{bad_ref} live points have dead/absent ref KF")
        # inertial chain: prev links live, strictly back in time
        for k in self.kf_ids():
            p = int(self.kf_prev[k])
            if p >= 0:
                if not self.kf_valid[p]:
                    errs.append(f"KF {k} prev link -> dead KF {p}")
                elif self.kf_ts[p] >= self.kf_ts[k]:
                    errs.append(f"KF {k} prev link not back in time")
        # tombstone chains (culled-KF re-anchoring) must resolve acyclically
        for (slot, epoch) in self.tombstones:
            if self.resolve_kf_pose(slot, epoch) is None:
                errs.append(f"tombstone ({slot},{epoch}) does not resolve")
        return errs

    def local_point_ids(self, kf_ids) -> np.ndarray:
        """Union of points observed by the given keyframes."""
        ids = self.kf_feat_point[kf_ids]
        ids = ids[ids >= 0]
        ids = np.unique(ids)
        return ids[self.pt_valid[ids]]

    # ---- maintenance -----------------------------------------------------

    def update_point_stats(self, pids: np.ndarray):
        """Recompute representative descriptor + normal + scale range
        (reference: MapPoint::ComputeDistinctiveDescriptors /
        UpdateNormalAndDepth)."""
        if len(pids) == 0:
            return
        from .. import native
        if native.available:
            native.update_point_stats(
                self.kf_valid, self.kf_feat_point, self.kf_feat_desc,
                self.kf_feat_level, self.kf_R, self.kf_t, self.pt_xyz,
                self.pt_ref_kf, np.asarray(pids, np.int64),
                self._scale_factors.astype(np.float32),
                self.pt_desc, self.pt_normal, self.pt_min_dist,
                self.pt_max_dist)
            return
        inc_kf = {p: [] for p in pids}
        kk, ff = np.where(np.isin(self.kf_feat_point, pids) & (self.kf_feat_point >= 0))
        for k, f in zip(kk, ff):
            inc_kf[self.kf_feat_point[k, f]].append((k, f))
        for p, obs in inc_kf.items():
            if not obs:
                continue
            ks = np.array([o[0] for o in obs])
            fs = np.array([o[1] for o in obs])
            descs = self.kf_feat_desc[ks, fs]           # [M, 8]
            if len(descs) > 1:
                x = descs[:, None, :] ^ descs[None, :, :]
                d = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
                self.pt_desc[p] = descs[np.argmin(np.median(d, axis=1))]
            else:
                self.pt_desc[p] = descs[0]
            # normal: mean of unit vectors from camera centers to point
            centers = -np.einsum("kij,ki->kj", self.kf_R[ks], self.kf_t[ks])
            vecs = self.pt_xyz[p] - centers
            norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
            self.pt_normal[p] = (vecs / np.maximum(norms, 1e-9)).mean(0)
            n = np.linalg.norm(self.pt_normal[p])
            if n > 1e-9:
                self.pt_normal[p] /= n
            # scale-invariance range from the reference KF's observation level
            ref = self.pt_ref_kf[p]
            if ref in ks:
                i = list(ks).index(ref)
            else:
                i = 0
                self.pt_ref_kf[p] = ks[0]
            lvl = self.kf_feat_level[ks[i], fs[i]]
            dist = float(np.linalg.norm(vecs[i]))
            sf = self._scale_factors
            self.pt_max_dist[p] = dist * sf[lvl]
            self.pt_min_dist[p] = self.pt_max_dist[p] / sf[-1]

    # ---- inertial helpers -------------------------------------------------

    def set_kf_preintegration(self, k: int, pre, prev_kf: int):
        """Store a Preintegrated window (jax pytree) from prev_kf to k."""
        self.kf_prev[k] = prev_kf
        self.kf_pre_dT[k] = float(pre.dT)
        self.kf_pre_dR[k] = np.asarray(pre.dR)
        self.kf_pre_dV[k] = np.asarray(pre.dV)
        self.kf_pre_dP[k] = np.asarray(pre.dP)
        self.kf_pre_C[k] = np.asarray(pre.C)
        self.kf_pre_JRg[k] = np.asarray(pre.JRg)
        self.kf_pre_JVg[k] = np.asarray(pre.JVg)
        self.kf_pre_JVa[k] = np.asarray(pre.JVa)
        self.kf_pre_JPg[k] = np.asarray(pre.JPg)
        self.kf_pre_JPa[k] = np.asarray(pre.JPa)
        self.kf_pre_bg0[k] = np.asarray(pre.bg0)
        self.kf_pre_ba0[k] = np.asarray(pre.ba0)

    def get_kf_preintegration(self, ks):
        """Stacked Preintegrated pytree for keyframes ks (bias0 = the bias
        each window was integrated at)."""
        import jax.numpy as jnp
        from ..imu.preintegration import Preintegrated
        ks = np.asarray(ks)
        return Preintegrated(
            dT=jnp.asarray(self.kf_pre_dT[ks]),
            dR=jnp.asarray(self.kf_pre_dR[ks]),
            dV=jnp.asarray(self.kf_pre_dV[ks]),
            dP=jnp.asarray(self.kf_pre_dP[ks]),
            C=jnp.asarray(self.kf_pre_C[ks]),
            JRg=jnp.asarray(self.kf_pre_JRg[ks]),
            JVg=jnp.asarray(self.kf_pre_JVg[ks]),
            JVa=jnp.asarray(self.kf_pre_JVa[ks]),
            JPg=jnp.asarray(self.kf_pre_JPg[ks]),
            JPa=jnp.asarray(self.kf_pre_JPa[ks]),
            bg0=jnp.asarray(self.kf_pre_bg0[ks]),
            ba0=jnp.asarray(self.kf_pre_ba0[ks]))

    def temporal_chain(self) -> np.ndarray:
        """Keyframes ordered by the prev-link chain (ts order of live KFs)."""
        ids = self.kf_ids()
        return ids[np.argsort(self.kf_ts[ids])]

    def predict_level(self, dists: np.ndarray, pids: np.ndarray) -> np.ndarray:
        """Predict observation pyramid level from distance
        (reference: MapPoint::PredictScale)."""
        ratio = self.pt_max_dist[pids] / np.maximum(dists, 1e-9)
        lv = np.ceil(np.log(np.maximum(ratio, 1e-9)) / np.log(self.cfg.scale))
        return np.clip(lv, 0, self.cfg.n_levels - 1).astype(np.int32)
