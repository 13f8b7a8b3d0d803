"""Local mapping: map growth + refinement per new keyframe.

Replaces the reference's LocalMapping thread (src/LocalMapping.cc:94 Run()):
ProcessNewKeyFrame -> MapPointCulling -> CreateNewMapPoints ->
SearchInNeighbors (fuse) -> LocalBundleAdjustment -> KeyFrameCulling.
Host code selects windows/neighbors from the tensor map; triangulation,
fusing and BA are the jitted kernels.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import SE3
from ..models import cameras
from ..ops import matching
from ..optim import ba
from ..mapping.mapstore import MapStore, NO_POINT
from . import kernels


@dataclass
class LocalMappingConfig:
    n_covis_triangulate: int = 20   # mono: 30 in reference, stereo 10
    min_parallax_cos: float = 0.9998
    cull_found_ratio: float = 0.25  # reference: LocalMapping.cc:463
    cull_min_obs: int = 2           # cnThObs for mono (ref: 2 mono / 3 stereo)
    kf_cull_redundancy: float = 0.9  # reference: LocalMapping.cc:1177
    ba_window: int = 20
    ba_iters: int = 9
    max_ba_points: int = 4096
    max_ba_obs: int = 16384


class LocalMapper:
    def __init__(self, mapstore: MapStore, cam: cameras.CameraParams,
                 cfg: LocalMappingConfig = LocalMappingConfig()):
        self.map = mapstore
        self.cam = cam
        self.cfg = cfg
        self.recent_points: dict = {}   # pid -> kf id at creation
        # set by System in inertial mode: () -> None, runs LocalInertialBA
        self.inertial_ba = None

    def process_keyframe(self, k: int):
        """One LocalMapping iteration for keyframe k
        (reference: LocalMapping::Run body, LocalMapping.cc:94-355)."""
        from ..utils import timing
        m = self.map
        with timing.span("KF insertion"):
            obs_pts = m.kf_feat_point[k][m.kf_feat_point[k] >= 0]
            m.update_point_stats(np.unique(obs_pts))
        with timing.span("MP culling"):
            self._map_point_culling(k)
        with timing.span("MP creation"):
            self._create_new_map_points(k)
            self._fuse_neighbors(k)
        covis_ids, _ = m.covisibility(k)
        window = [k] + [int(x) for x in covis_ids[: self.cfg.ba_window]]
        if m.n_kf > 2 and len(window) > 1:
            with timing.span("local BA"):
                if self.inertial_ba is not None and m.imu_initialized:
                    # reference: LocalInertialBA replaces LocalBundleAdjustment
                    # once the IMU is initialized (LocalMapping.cc:197-208)
                    self.inertial_ba()
                else:
                    run_local_ba(m, window, fixed=None, cam=self.cam,
                                 iters=self.cfg.ba_iters,
                                 max_points=self.cfg.max_ba_points,
                                 max_obs=self.cfg.max_ba_obs)
        with timing.span("KF culling"):
            self._keyframe_culling(k)

    # ------------------------------------------------------------------
    def _map_point_culling(self, k: int):
        """(reference: LocalMapping::MapPointCulling, LocalMapping.cc:451)"""
        m = self.map
        drop = []
        done = []
        obs = m.observation_counts()
        for pid, created_kf in self.recent_points.items():
            if not m.pt_valid[pid]:
                done.append(pid)
                continue
            age = m.n_kf - int(np.searchsorted(np.sort(m.kf_ids()), created_kf))
            found_ratio = m.pt_found[pid] / max(m.pt_visible[pid], 1)
            if found_ratio < self.cfg.cull_found_ratio:
                drop.append(pid)
                done.append(pid)
            elif age >= 2 and obs[pid] <= self.cfg.cull_min_obs:
                drop.append(pid)
                done.append(pid)
            elif age >= 3:
                done.append(pid)   # survived probation
        m.remove_points(np.asarray(drop, np.int64))
        for pid in done:
            self.recent_points.pop(pid, None)

    # ------------------------------------------------------------------
    def _create_new_map_points(self, k: int):
        """(reference: LocalMapping::CreateNewMapPoints, LocalMapping.cc:506)"""
        m = self.map
        covis_ids, _ = m.covisibility(k, min_weight=10)
        neighbors = covis_ids[: self.cfg.n_covis_triangulate]
        if len(neighbors) == 0:
            return
        T_a = SE3(jnp.asarray(m.kf_R[k]), jnp.asarray(m.kf_t[k]))
        _, inv_s2 = kernels.level_weights(m.cfg.n_levels, m.cfg.scale)
        free_a = m.kf_feat_valid[k] & (m.kf_feat_point[k] == NO_POINT)
        ca = -m.kf_R[k].T @ m.kf_t[k]

        # host-side baseline/parallax precheck per neighbor
        keep = []
        for b in neighbors:
            b = int(b)
            cb = -m.kf_R[b].T @ m.kf_t[b]
            baseline = np.linalg.norm(ca - cb)
            pts_b = m.kf_feat_point[b][m.kf_feat_point[b] >= 0]
            if len(pts_b) == 0:
                continue
            depths = np.einsum("ij,pj->pi", m.kf_R[b],
                               m.pt_xyz[pts_b])[:, 2] + m.kf_t[b][2]
            med_depth = float(np.median(depths[depths > 0])) if (depths > 0).any() else 1.0
            if baseline / max(med_depth, 1e-6) >= 0.01:
                keep.append(b)
        if not keep:
            return
        # one vmapped device program for ALL neighbors (bucket B so it
        # compiles once per bucket); the feature-claiming pass below stays
        # sequential in neighbor order, as the reference's loop is
        B = 8 * int(np.ceil(len(keep) / 8))
        padded = keep + [keep[0]] * (B - len(keep))
        bi = np.asarray(padded)
        free_b_all = (m.kf_feat_valid[bi]
                      & (m.kf_feat_point[bi] == NO_POINT))
        free_b_all[len(keep):] = False   # padding slots match nothing
        res = kernels.search_and_triangulate_batch(
            T_a, SE3(jnp.asarray(m.kf_R[bi]), jnp.asarray(m.kf_t[bi])),
            jnp.asarray(m.kf_feat_desc[k]), jnp.asarray(m.kf_feat_xyn[k]),
            jnp.asarray(m.kf_feat_level[k]), jnp.asarray(free_a),
            jnp.asarray(m.kf_feat_desc[bi]), jnp.asarray(m.kf_feat_xyn[bi]),
            jnp.asarray(m.kf_feat_level[bi]), jnp.asarray(free_b_all),
            inv_s2[m.kf_feat_level[k]], inv_s2[m.kf_feat_level[bi]],
            focal=float(self.cam.fx))
        # one packed transfer for the whole triangulation result (each
        # separate np.asarray is its own device round trip)
        ok_all, X_all, idx_b_all = jax.device_get((res.ok, res.xyz, res.idx_b))
        ok_all = ok_all & np.isfinite(X_all).all(axis=2)

        claimed_a = ~free_a
        for j, b in enumerate(keep):
            fa = np.where(ok_all[j] & ~claimed_a)[0]
            if len(fa) == 0:
                continue
            # drop pairs whose b-feature got claimed by an earlier neighbor
            fb = idx_b_all[j][fa]
            still_free = m.kf_feat_point[b][fb] == NO_POINT
            fa, fb = fa[still_free], fb[still_free]
            if len(fa) == 0:
                continue
            try:
                pids = m.add_points(X_all[j][fa], m.kf_feat_desc[k][fa],
                                    ref_kf=k)
            except RuntimeError:
                break  # point capacity full; BA/culling will free slots later
            m.kf_feat_point[k, fa] = pids
            m.kf_feat_point[b, fb] = pids
            claimed_a[fa] = True
            for pid in pids:
                self.recent_points[int(pid)] = k
            m.update_point_stats(pids)

    # ------------------------------------------------------------------
    def _fuse_neighbors(self, k: int):
        """Project each neighbor's points into k and fuse duplicates
        (reference: LocalMapping::SearchInNeighbors + ORBmatcher::Fuse,
        LocalMapping.cc:917, ORBmatcher.cc:1325)."""
        m = self.map
        covis_ids, _ = m.covisibility(k, min_weight=15)
        neighbors = [int(b) for b in covis_ids[:10]]
        if not neighbors:
            return
        # second-level neighbors (5 covisibles of each first-level target)
        # + temporal prev/next for inertial maps, as the reference's extended
        # fuse window (LocalMapping.cc:923-960)
        seen = set(neighbors) | {k}
        for sec, _ in m.covisibility_batch(np.asarray(neighbors),
                                           min_weight=15):
            for s in (int(x) for x in sec[:5]):
                if s not in seen:
                    neighbors.append(s)
                    seen.add(s)
            if len(neighbors) >= 25:
                break
        if m.imu_initialized:
            p = int(m.kf_prev[k])
            if p >= 0 and p not in seen:
                neighbors.append(p)
        cand = m.local_point_ids(np.asarray(neighbors))
        own = set(m.kf_feat_point[k][m.kf_feat_point[k] >= 0].tolist())
        cand = np.asarray([p for p in cand if p not in own], np.int64)
        if len(cand) == 0:
            return
        T_k = SE3(jnp.asarray(m.kf_R[k]), jnp.asarray(m.kf_t[k]))
        cap = 4096
        cand = cand[:cap]
        pad = cap - len(cand)
        ids = np.concatenate([cand, np.full(pad, -1, np.int64)])
        safe = np.where(ids >= 0, ids, 0)
        proj = kernels.project_points(
            T_k, jnp.asarray(m.pt_xyz[safe]), jnp.asarray(m.pt_normal[safe]),
            jnp.asarray(m.pt_min_dist[safe]), jnp.asarray(m.pt_max_dist[safe]),
            jnp.asarray((ids >= 0) & m.pt_valid[safe]), self.cam,
            m.cfg.scale, m.cfg.n_levels)
        radius_scale, _ = kernels.level_weights(m.cfg.n_levels, m.cfg.scale)
        feat = kernels.PreparedFrame(
            feat=_kf_features(m, k), xy_ud=jnp.asarray(m.kf_feat_xy[k]),
            xyn=jnp.asarray(m.kf_feat_xyn[k]))
        res = matching.search_by_projection(
            proj.uv, proj.visible & (jnp.asarray(ids) >= 0),
            jnp.asarray(m.pt_desc[safe]), proj.level,
            feat.feat._replace(xy=feat.xy_ud),
            3.0 * jnp.asarray(radius_scale)[proj.level],
            max_dist=matching.TH_LOW, ratio=1.0)
        valid, fidx = jax.device_get((res.valid, res.idx))
        sel = np.where(valid)[0]
        m.fuse_observations(k, ids[sel], fidx[sel])

        # reverse direction: k's own points projected into the first-level
        # neighbors (the reference fuses both ways, LocalMapping.cc:930-960)
        self._fuse_into_neighbors(k, neighbors[:10])

    def _fuse_into_neighbors(self, k: int, nb: list):
        m = self.map
        own_f = np.where(m.kf_feat_point[k] >= 0)[0]
        if len(nb) == 0 or len(own_f) == 0:
            return
        pids_f = m.kf_feat_point[k][own_f]          # per-feature point id
        P = m.cfg.n_feat
        ids = np.full(P, -1, np.int64)
        ids[: len(pids_f)] = pids_f
        safe = np.where(ids >= 0, ids, 0)
        B = 8 * int(np.ceil(len(nb) / 8))
        nbp = np.asarray(list(nb) + [nb[0]] * (B - len(nb)))
        f_valid_b = m.kf_feat_valid[nbp].copy()
        f_valid_b[len(nb):] = False                 # padding matches nothing
        radius_scale, _ = kernels.level_weights(m.cfg.n_levels, m.cfg.scale)
        valid_b, fidx_b = jax.device_get(_fuse_reverse_batch(
            jnp.asarray(m.kf_R[nbp]), jnp.asarray(m.kf_t[nbp]),
            jnp.asarray(m.pt_xyz[safe]), jnp.asarray(m.pt_normal[safe]),
            jnp.asarray(m.pt_min_dist[safe]), jnp.asarray(m.pt_max_dist[safe]),
            jnp.asarray((ids >= 0) & m.pt_valid[safe]),
            jnp.asarray(m.pt_desc[safe]),
            jnp.asarray(m.kf_feat_xy[nbp]), jnp.asarray(m.kf_feat_level[nbp]),
            jnp.asarray(m.kf_feat_desc[nbp]), jnp.asarray(f_valid_b),
            jnp.asarray(radius_scale), self.cam,
            float(m.cfg.scale), int(m.cfg.n_levels)))
        for j, b in enumerate(nb):
            sel = np.where(valid_b[j])[0]
            m.fuse_observations(b, ids[sel], fidx_b[j][sel])

    # ------------------------------------------------------------------
    def _keyframe_culling(self, k: int):
        """Cull covisible KFs where ~90% of points are seen by >=3 OTHER
        keyframes at the same or finer pyramid level
        (reference: LocalMapping::KeyFrameCulling, LocalMapping.cc:1177).
        The scale condition matters: without it, densely-tracked maps mark
        nearly every keyframe redundant. Never culls k itself or the newest
        keyframes (the tracker's reference must survive)."""
        m = self.map
        covis_ids, _ = m.covisibility(k)
        recent = set(int(x) for x in np.argsort(-m.kf_frame_id)[:3])
        # observation histogram over (point, level) across all valid KFs
        nl = m.cfg.n_levels
        P = m.cfg.max_pt
        kk = np.where(m.kf_valid)[0]
        fp = m.kf_feat_point[kk]
        lv = m.kf_feat_level[kk]
        sel = fp >= 0
        hist = np.zeros((P, nl), np.int32)
        np.add.at(hist, (fp[sel], lv[sel]), 1)
        cum = hist.cumsum(axis=1)                  # obs at level <= l
        for b in covis_ids:
            b = int(b)
            if b <= 1 or b == k or b in recent:
                continue
            # inertial spacing rule: culling b merges its preintegration
            # window into its successor's; never let the merged gap exceed
            # 0.5 s (3 s once fully inertial-optimized) or the chain becomes
            # useless for inertial BA (reference: LocalMapping.cc:1230-1260)
            if m.imu_initialized and m.kf_pre_dT[b] > 0:
                nxt = np.where(m.kf_prev == b)[0]
                p = int(m.kf_prev[b])
                if p >= 0 and len(nxt):
                    gap = float(m.kf_ts[int(nxt[0])] - m.kf_ts[p])
                    if gap > (3.0 if m.imu_ba2 else 0.5):
                        continue
            feats = np.where(m.kf_feat_point[b] >= 0)[0]
            pts = m.kf_feat_point[b][feats]
            ok = m.pt_valid[pts]
            feats, pts = feats[ok], pts[ok]
            if len(pts) < 20:
                continue
            lv_b = np.minimum(m.kf_feat_level[b, feats] + 1, nl - 1)
            # subtract b's own observation (always within its own level gate)
            redundant = (cum[pts, lv_b] - 1 >= 3).sum()
            if redundant > self.cfg.kf_cull_redundancy * len(pts):
                m.remove_keyframe(b)
                # keep the histogram consistent after removal
                fsel = m.kf_feat_level[b, feats]
                np.subtract.at(hist, (pts, fsel), 1)
                cum = hist.cumsum(axis=1)


def _kf_features(m: MapStore, k: int):
    from ..ops.extractor import FrameFeatures
    return FrameFeatures(
        xy=jnp.asarray(m.kf_feat_xy[k]),
        level=jnp.asarray(m.kf_feat_level[k]),
        angle=jnp.asarray(m.kf_feat_angle[k]),
        score=jnp.zeros(m.cfg.n_feat, jnp.float32),
        desc=jnp.asarray(m.kf_feat_desc[k]),
        valid=jnp.asarray(m.kf_feat_valid[k]))


def full_obs_cap(m: MapStore) -> int:
    """Observation capacity covering the map's FULL observation set,
    bucketed to a power of two (>=32768) for compile reuse. Full-map
    solves (global BA, FullInertialBA) must not silently subsample the
    observation graph: a fixed 32768 cap dropped ~25% of a long sequence's
    observations and cost ~1 cm of final KF ATE (measured, r4)."""
    n_obs = int((m.kf_feat_point[m.kf_valid] >= 0).sum())
    cap = 32768
    while cap < n_obs:
        cap *= 2
    return cap


def run_local_ba(m: MapStore, window: list, fixed, cam, iters: int = 10,
                 max_points: int = 4096, max_obs: int = 16384):
    """Build a BAProblem from a keyframe window and write results back
    (reference: Optimizer::LocalBundleAdjustment, Optimizer.cc:1740).

    window: keyframe ids to optimize. fixed: ids held constant (defaults to
    the frontier — observers of window points that are not in the window —
    plus the two oldest window KFs if no frontier exists).
    """
    built = build_ba_problem(m, window, fixed,
                             max_points=max_points, max_obs=max_obs)
    if built is None:
        return
    prob, meta = built
    res = ba.ba_solve(prob, cam, iters=iters,
                      table_depth=meta["table_depth"])
    apply_ba_result(m, meta, res)


def build_ba_problem(m: MapStore, window: list, fixed,
                     max_points: int = 4096, max_obs: int = 16384):
    """Snapshot a keyframe window into a device BAProblem + host metadata.

    Split from run_local_ba so the solve can run OFF the map lock (the
    async global-BA path): build under the lock (cheap host gathers), solve
    lock-free, apply_ba_result under the lock again.
    """
    window = [int(k) for k in window if m.kf_valid[k]]
    pt_ids = m.local_point_ids(np.asarray(window))[:max_points]
    if len(pt_ids) == 0 or len(window) == 0:
        return
    pt_slot = {int(p): i for i, p in enumerate(pt_ids)}

    # frontier: other observers of these points
    observers = np.where(m.observers_of_points(pt_ids))[0]
    frontier = [int(x) for x in observers if int(x) not in set(window)]
    if fixed is None:
        fixed_set = set(frontier)
        if not fixed_set:
            fixed_set = set(window[:1]) if len(window) < 3 else set(sorted(window)[:2])
    else:
        fixed_set = set(int(x) for x in fixed)
    cams = window + [f for f in frontier if f not in set(window)]
    cams = cams[: max(len(window) + 12, 24)]   # cap frontier size
    cam_slot = {int(c): i for i, c in enumerate(cams)}
    # bucket the camera count so XLA compiles one ba_solve per bucket, not
    # one per window size (dummy cameras are fixed and observation-free)
    n_real = len(cams)
    C = ((n_real + 7) // 8) * 8

    # observations from kf_feat_point (vectorized over the whole window)
    sf2 = (m.cfg.scale ** np.arange(m.cfg.n_levels)) ** 2
    lut = np.full(m.cfg.max_pt, -1, np.int32)
    lut[pt_ids] = np.arange(len(pt_ids), dtype=np.int32)
    fp_all = m.kf_feat_point[cams]                     # [C, N]
    slot_of = lut[np.maximum(fp_all, 0)]
    sel = (fp_all >= 0) & (slot_of >= 0)
    ci, fi = np.nonzero(sel)
    oc = ci.astype(np.int32)                           # window slot == row
    op = slot_of[ci, fi]
    ouv = m.kf_feat_xy[cams][ci, fi]
    ow = (1.0 / sf2[m.kf_feat_level[cams][ci, fi]]).astype(np.float32)
    O = len(oc)
    if O < 20:
        return
    if O > max_obs:
        keep = np.random.default_rng(0).choice(O, max_obs, replace=False)
    else:
        keep = np.arange(O)
    pad = max_obs - len(keep)

    def pad_arr(a, fill=0):
        a = np.asarray(a)[keep]
        return np.concatenate([a, np.full((pad, *a.shape[1:]), fill, a.dtype)])

    P = max_points
    pt_xyz = np.zeros((P, 3), np.float32)
    pt_xyz[: len(pt_ids)] = m.pt_xyz[pt_ids]
    pt_mask = np.zeros(P, bool)
    pt_mask[: len(pt_ids)] = True

    fixed_mask = np.asarray([c in fixed_set for c in cams]
                            + [True] * (C - n_real))
    kf_R_in = np.concatenate(
        [m.kf_R[cams], np.tile(np.eye(3, dtype=np.float32), (C - n_real, 1, 1))])
    kf_t_in = np.concatenate([m.kf_t[cams], np.zeros((C - n_real, 3), np.float32)])
    prob = ba.BAProblem(
        kf_R=jnp.asarray(kf_R_in), kf_t=jnp.asarray(kf_t_in),
        points=jnp.asarray(pt_xyz),
        obs_cam=jnp.asarray(pad_arr(oc), jnp.int32),
        obs_pt=jnp.asarray(pad_arr(op), jnp.int32),
        obs_uv=jnp.asarray(pad_arr(ouv.astype(np.float32))),
        obs_w=jnp.asarray(pad_arr(ow), jnp.float32),
        obs_valid=jnp.asarray(np.concatenate(
            [np.ones(len(keep), bool), np.zeros(pad, bool)])),
        fixed_cam=jnp.asarray(fixed_mask),
        point_valid=jnp.asarray(pt_mask))
    # true max observations per point, bucketed to a power of two: the
    # static depth of ba_solve's dense observation table (d << C shrinks
    # every per-iteration tensor by the same factor)
    d_max = int(np.bincount(np.asarray(op)[keep], minlength=1).max())
    table_depth = 1 << max(int(np.ceil(np.log2(max(d_max, 4)))), 2)
    meta = dict(cams=cams, n_real=n_real, pt_ids=pt_ids, keep=keep,
                oc=np.asarray(oc)[keep], op=np.asarray(op)[keep],
                cam_slot=cam_slot, pt_slot=pt_slot, table_depth=table_depth)
    return prob, meta


def apply_ba_result(m: MapStore, meta: dict, res):
    """Write a BAResult back into the map (poses, points, outlier edges).
    Runs under the map lock; `meta` is build_ba_problem's host snapshot."""
    cams, n_real, pt_ids = meta["cams"], meta["n_real"], meta["pt_ids"]
    # one packed transfer for the whole BA result
    bR, bt, bp, binl = jax.device_get(
        (res.kf_R, res.kf_t, res.points, res.obs_inlier))
    m.kf_R[cams] = bR[:n_real]
    m.kf_t[cams] = bt[:n_real]
    m.pt_xyz[pt_ids] = bp[: len(pt_ids)]

    # detach outlier observations (reference: Optimizer.cc:2040-2100)
    inl = binl[: len(meta["keep"])]
    oc_np, op_np = meta["oc"], meta["op"]
    bad = np.where(~inl)[0]
    inv_cam = {i: c for c, i in meta["cam_slot"].items()}
    inv_pt = {i: p for p, i in meta["pt_slot"].items()}
    touched = set()
    for o in bad:
        c = inv_cam[int(oc_np[o])]
        pid = inv_pt[int(op_np[o])]
        feats = np.where(m.kf_feat_point[c] == pid)[0]
        m.kf_feat_point[c, feats] = NO_POINT
        touched.add(pid)
    # a point whose observations all got detached must die with them
    # (reference: MapPoint::EraseObservation -> SetBadFlag when the
    # observation count collapses, MapPoint.cc)
    if touched:
        tl = np.asarray(sorted(touched))
        tl = tl[m.pt_valid[tl]]
        if len(tl):
            obs = m.observation_counts()
            m.remove_points(tl[obs[tl] == 0])
    m.version += 1


@partial(jax.jit, static_argnames=("cam", "scale", "n_levels"))
def _fuse_reverse_batch(kf_R_b, kf_t_b, pts, normals, min_d, max_d, pvalid,
                        pdesc, f_xy_b, f_level_b, f_desc_b, f_valid_b,
                        radius_scale, cam, scale: float, n_levels: int):
    """Project ONE keyframe's points into B neighbor keyframes and match —
    the forward half of LocalMapping::SearchInNeighbors
    (ORBmatcher::Fuse(pKFi, vpMapPointMatches), LocalMapping.cc:930-940),
    vmapped over neighbors so the whole fuse is a single device program."""
    from ..ops.extractor import FrameFeatures

    def one(R, t, f_xy, f_level, f_desc, f_valid):
        proj = kernels.project_points(SE3(R, t), pts, normals, min_d, max_d,
                                      pvalid, cam, scale, n_levels)
        feat = FrameFeatures(xy=f_xy, level=f_level,
                             angle=jnp.zeros_like(f_xy[:, 0]),
                             score=jnp.zeros_like(f_xy[:, 0]),
                             desc=f_desc, valid=f_valid)
        res = matching.search_by_projection(
            proj.uv, proj.visible, pdesc, proj.level, feat,
            3.0 * radius_scale[proj.level],
            max_dist=matching.TH_LOW, ratio=1.0)
        return res.valid, res.idx

    return jax.vmap(one)(kf_R_b, kf_t_b, f_xy_b, f_level_b, f_desc_b,
                         f_valid_b)
