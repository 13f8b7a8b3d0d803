"""Atlas: multi-map management + map merging.

Replaces the reference's Atlas (src/Atlas.cc) and the merge half of
LoopClosing (MergeLocal, src/LoopClosing.cc:1590): when tracking is
irrecoverably lost, a fresh map is spawned (reference:
Tracking::CreateMapInAtlas, Tracking.cc:3093); when place recognition later
finds the active map overlapping a stored map, the stored map is welded into
the active one through the verified Sim3 and duplicates are fused.

Each map is a MapStore with its own keyframe database; merge detection
queries the stored maps' databases with the current keyframe.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..lie import SE3, Sim3
from .mapstore import MapConfig, MapStore, NO_POINT


class Atlas:
    def __init__(self, map_cfg: MapConfig):
        self.map_cfg = map_cfg
        self.maps: list = [MapStore(map_cfg)]
        self.active_id: int = 0
        # replay redirects for keyframes of merged maps:
        # (map_id, slot, epoch) -> (map_id', slot', epoch', R_rel, t_rel)
        self.kf_redirect: dict = {}
        self.n_merges = 0

    @property
    def active(self) -> MapStore:
        return self.maps[self.active_id]

    def create_new_map(self) -> MapStore:
        """(reference: Atlas::CreateNewMap, Atlas.cc:62)"""
        self.maps.append(MapStore(self.map_cfg))
        self.active_id = len(self.maps) - 1
        self.active.map_id = self.active_id
        return self.active

    def remove_bad_maps(self, min_kf: int = 3):
        """Drop failed mini-maps (reference: Atlas::RemoveBadMaps)."""
        for i, m in enumerate(self.maps):
            if i != self.active_id and 0 < m.n_kf < min_kf:
                self.maps[i] = MapStore(self.map_cfg)  # clear
                # keep max(big_change_idx) monotone for System.map_changed
                self.maps[i].big_change_idx = m.big_change_idx

    def resolve_kf_pose(self, map_id: int, slot: int, epoch: int):
        """Trajectory replay across merges: follow atlas redirects, then the
        per-map tombstones."""
        R_acc = np.eye(3, dtype=np.float32)
        t_acc = np.zeros(3, np.float32)
        for _ in range(8):
            key = (map_id, slot, epoch)
            if key in self.kf_redirect:
                map_id2, slot2, epoch2, R_rel, t_rel = self.kf_redirect[key]
                t_acc = R_acc @ t_rel + t_acc
                R_acc = R_acc @ R_rel
                map_id, slot, epoch = map_id2, slot2, epoch2
                continue
            out = self.maps[map_id].resolve_kf_pose(slot, epoch)
            if out is None:
                return None
            R, t = out
            return R_acc @ R, R_acc @ t + t_acc
        return None

    # ------------------------------------------------------------------
    def merge_map_into_active(self, other_id: int, S_ao: Sim3,
                              cam=None) -> dict:
        """Weld map `other_id` into the active map: active-world coords of an
        other-world point are x_a = S_ao(x_o). Returns {other_slot: new_slot}.

        (reference: LoopClosing::MergeLocal welding, LoopClosing.cc:1590)
        """
        act = self.active
        oth = self.maps[other_id]
        R_s = np.asarray(S_ao.R)
        t_s = np.asarray(S_ao.t)
        s_s = float(S_ao.s)
        S_inv = S_ao.inverse()

        # ---- copy keyframes (poses: T_j,wa = T_j,wo ∘ S_ao^-1) ----------
        slot_map = {}
        for j in oth.kf_ids():
            T_j = Sim3(jnp.asarray(oth.kf_R[j]), jnp.asarray(oth.kf_t[j]),
                       jnp.asarray(1.0))
            T_new = T_j.compose(S_inv)
            R_new = np.asarray(T_new.R)
            # fold the scale into translation (SE3 store; points scale too)
            t_new = np.asarray(T_new.t) / max(float(T_new.s), 1e-9)
            k_new = act.add_keyframe(
                R_new, t_new, oth.kf_ts[j], oth.kf_frame_id[j],
                oth.kf_feat_xy[j], oth.kf_feat_xyn[j], oth.kf_feat_level[j],
                oth.kf_feat_angle[j], oth.kf_feat_desc[j],
                oth.kf_feat_valid[j], np.full(act.cfg.n_feat, NO_POINT, np.int32))
            slot_map[int(j)] = k_new
            # replay redirect: old pose -> new pose is identity in camera
            # frame (the KF is the same camera), so R_rel = I after welding
            self.kf_redirect[(other_id, int(j), int(oth.kf_epoch[j]))] = (
                self.active_id, k_new, int(act.kf_epoch[k_new]),
                np.eye(3, dtype=np.float32), np.zeros(3, np.float32))

        # ---- copy points (x_a = S_ao x_o) -------------------------------
        opts = np.where(oth.pt_valid)[0]
        if len(opts):
            X = oth.pt_xyz[opts]
            X_a = s_s * X @ R_s.T + t_s
            pid_map = {}
            new_ids = act.alloc_points(len(opts))
            act.pt_xyz[new_ids] = X_a
            act.pt_desc[new_ids] = oth.pt_desc[opts]
            act.pt_valid[new_ids] = True
            for o, nw in zip(opts, new_ids):
                pid_map[int(o)] = int(nw)
            # observations
            for j, k_new in slot_map.items():
                fp = oth.kf_feat_point[j]
                sel = fp >= 0
                act.kf_feat_point[k_new][sel] = [
                    pid_map.get(int(p), NO_POINT) for p in fp[sel]]
            act.pt_ref_kf[new_ids] = [
                slot_map.get(int(r), list(slot_map.values())[0])
                for r in oth.pt_ref_kf[opts]]
            act.pt_first_kf[new_ids] = act.pt_ref_kf[new_ids]
            act.update_point_stats(new_ids)

        # ---- carry per-KF inertial state through the weld ---------------
        # (reference: MergeLocal2 transforms the welded keyframes' velocities
        # with the weld rotation/scale and keeps biases + preintegrated
        # windows, LoopClosing.cc:2310+; a world velocity maps as
        # v_a = d/dt (s R x_o + t) = s R v_o. Preintegration and biases are
        # body-frame, invariant to the weld.)
        _PRE = ("kf_pre_dT", "kf_pre_dR", "kf_pre_dV", "kf_pre_dP",
                "kf_pre_C", "kf_pre_JRg", "kf_pre_JVg", "kf_pre_JVa",
                "kf_pre_JPg", "kf_pre_JPa", "kf_pre_bg0", "kf_pre_ba0")
        for j, k_new in slot_map.items():
            act.kf_vel[k_new] = s_s * oth.kf_vel[j] @ R_s.T
            act.kf_bg[k_new] = oth.kf_bg[j]
            act.kf_ba[k_new] = oth.kf_ba[j]
            for name in _PRE:
                getattr(act, name)[k_new] = getattr(oth, name)[j]
            # IMU temporal chain, remapped within the welded set (the gap
            # between the two maps has no preintegration; chains stay
            # internal, as the reference's mPrevKF links do across a merge)
            p = int(oth.kf_prev[j])
            if p >= 0 and p in slot_map:
                act.kf_prev[k_new] = slot_map[p]

        # retire the other map; fold its big-change history into the
        # active map so System.map_changed's max never regresses
        act.big_change_idx += self.maps[other_id].big_change_idx
        self.maps[other_id] = MapStore(self.map_cfg)
        self.n_merges += 1
        act.version += 1
        act.big_change_idx += 1
        return slot_map
