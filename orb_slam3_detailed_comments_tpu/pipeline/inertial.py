"""Visual-inertial pipeline pieces: per-frame IMU handling, state
prediction, the IMU initialization schedule, and local inertial BA glue.

Replaces the inertial halves of Tracking (PreintegrateIMU Tracking.cc:1739,
PredictStateIMU 1892, UpdateFrameIMU 4769) and LocalMapping (InitializeIMU
LocalMapping.cc:1516, the VIBA1/VIBA2 schedule at 236-310), built on
imu/preintegration.py, imu/inertial_init.py and optim/vi_ba.py.

Frames: the map stores CAMERA poses (T_cw); inertial quantities live on the
BODY. calib.R_bc/t_bc is the camera-in-body extrinsic (x_b = R_bc x_c + t_bc,
the reference's Tbc); helpers below convert both ways.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..imu import inertial_init, preintegration as pre_mod
from ..imu.preintegration import ImuCalib, Preintegrated
from ..lie import SE3, so3
from ..mapping.mapstore import MapStore

MAX_SAMPLES_PER_FRAME = 64
GRAVITY_MAG = 9.81


@dataclass
class ImuFrameState:
    """Tracker-side inertial bookkeeping."""
    calib: ImuCalib
    pre_since_kf: Optional[Preintegrated] = None   # accumulated since last KF
    pre_last_frame: Optional[Preintegrated] = None  # last frame's window
    bg: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    ba: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    v_w: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    t_first_kf: float = 0.0


def integrate_frame_window(calib: ImuCalib, gyro: np.ndarray, acc: np.ndarray,
                           dts: np.ndarray, bg, ba) -> Preintegrated:
    """Preintegrate one frame gap (padded scan; reference: PreintegrateIMU)."""
    n = len(dts)
    cap = MAX_SAMPLES_PER_FRAME
    if n > cap:  # extremely long gap: merge chunks
        out = None
        for s in range(0, n, cap):
            p = integrate_frame_window(calib, gyro[s:s + cap], acc[s:s + cap],
                                       dts[s:s + cap], bg, ba)
            out = p if out is None else pre_mod.merge(out, p)
        return out
    pad = cap - n
    g = np.concatenate([gyro, np.zeros((pad, 3))]).astype(np.float32)
    a = np.concatenate([acc, np.zeros((pad, 3))]).astype(np.float32)
    d = np.concatenate([dts, np.zeros(pad)]).astype(np.float32)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return pre_mod.integrate(jnp.asarray(a), jnp.asarray(g), jnp.asarray(d),
                             calib, bg0=jnp.asarray(bg), ba0=jnp.asarray(ba),
                             valid=jnp.asarray(valid))


def _extr(calib: ImuCalib):
    """(R_bc, t_bc) as numpy; identity when unset."""
    R_bc = np.asarray(calib.R_bc) if calib.R_bc is not None else np.eye(3)
    t_bc = np.asarray(calib.t_bc) if calib.t_bc is not None else np.zeros(3)
    return R_bc.astype(np.float32), t_bc.astype(np.float32)


def body_from_camera(R_cw, t_cw, R_bc, t_bc):
    """T_cw (camera pose, world->cam) -> body state (R_wb, p_wb).
    R_bw = R_bc R_cw; p_wb = c_w - R_wc R_bc^T t_bc + ... derived from
    t_cw = t_cb - R_cw p_wb with T_cb = T_bc^{-1}."""
    R_cb = R_bc.T
    t_cb = -R_cb @ t_bc
    R_cw = np.asarray(R_cw)
    t_cw = np.asarray(t_cw)
    R_bw = R_bc @ R_cw
    R_wb = R_bw.T
    p_wb = R_cw.T @ (t_cb - t_cw)
    return R_wb.astype(np.float32), p_wb.astype(np.float32)


def camera_from_body(R_wb, p_wb, R_bc, t_bc):
    """Body state -> T_cw (R_cw, t_cw)."""
    R_cb = R_bc.T
    t_cb = -R_cb @ t_bc
    R_cw = R_cb @ np.asarray(R_wb).T
    t_cw = t_cb - R_cw @ np.asarray(p_wb)
    return R_cw.astype(np.float32), t_cw.astype(np.float32)


@jax.jit
def _predict_pose_jit(R_cw, t_cw, v_w, pre, bg, ba, R_bc, t_bc, g):
    """body_from_camera -> predict_state -> camera_from_body fused into ONE
    device program (the eager version cost ~25 dispatches + two host
    round-trips per IMU-predicted frame)."""
    R_cb = R_bc.T
    t_cb = -R_cb @ t_bc
    R_wb = (R_bc @ R_cw).T
    p_wb = R_cw.T @ (t_cb - t_cw)
    R2, v2, p2 = pre_mod.predict_state(R_wb, v_w, p_wb, pre, bg, ba,
                                       gravity=g)
    R_cw2 = R_cb @ R2.T
    t_cw2 = t_cb - R_cw2 @ p2
    return R_cw2, t_cw2, v2


def predict_pose_imu(m: MapStore, imu: ImuFrameState,
                     last_T_cw: SE3, pre: Preintegrated):
    """Dead-reckoned T_cw prediction from the last frame's state
    (reference: Tracking::PredictStateIMU)."""
    R_bc, t_bc = _extr(imu.calib)
    g = np.array([0.0, 0.0, -GRAVITY_MAG], np.float32)
    R_cw, t_cw, v2 = _predict_pose_jit(
        jnp.asarray(last_T_cw.R), jnp.asarray(last_T_cw.t),
        jnp.asarray(imu.v_w), pre, jnp.asarray(imu.bg),
        jnp.asarray(imu.ba), jnp.asarray(R_bc), jnp.asarray(t_bc),
        jnp.asarray(g))
    # v2 stays on device: the steady path never reads it on the host (the
    # velocity is re-derived from the optimized poses); only the
    # RECENTLY_LOST dead-reckoning path fetches it, at its call site
    return SE3(R_cw, t_cw), v2


def try_initialize_imu(m: MapStore, min_kf: int = 8, min_time: float = 1.0,
                       prior_gyro: float = 1e2, prior_acc: float = 1e6,
                       fix_scale: bool = False,
                       calib: Optional[ImuCalib] = None):
    """IMU initialization: gravity/scale/bias/velocity solve + map re-scaling
    (reference: LocalMapping::InitializeIMU + Map::ApplyScaledRotation).

    Returns (R_wg, scale) of the applied world transform, or None.
    """
    chain = m.temporal_chain()
    if len(chain) < min_kf:
        return None
    if m.kf_ts[chain[-1]] - m.kf_ts[chain[0]] < min_time:
        return None
    # require a connected preintegration chain
    for a, b in zip(chain[:-1], chain[1:]):
        if m.kf_prev[b] != a or m.kf_pre_dT[b] <= 0:
            return None

    pres = m.get_kf_preintegration(chain[1:])
    R_bc, t_bc = _extr(calib) if calib is not None else (np.eye(3, dtype=np.float32),
                                                         np.zeros(3, np.float32))
    t_cb = -R_bc.T @ t_bc
    R_wb_np = np.transpose(
        np.einsum("ij,kjl->kil", R_bc, m.kf_R[chain]), (0, 2, 1))
    centers = -np.einsum("kij,ki->kj", m.kf_R[chain], m.kf_t[chain])
    p_body = centers + np.einsum("kji,j->ki", m.kf_R[chain], t_cb)

    # bucket the chain length so the growing map reuses one compiled solver
    # per bucket instead of recompiling at every keyframe count
    K = len(chain)
    Kb = max(8, 8 * int(np.ceil(K / 8.0)))
    pad = Kb - K
    edge_valid = jnp.asarray(
        np.concatenate([np.ones(K - 1, np.float32), np.zeros(pad, np.float32)]))
    if pad:
        R_wb_np = np.concatenate([R_wb_np, np.repeat(R_wb_np[-1:], pad, 0)])
        p_body = np.concatenate([p_body, np.repeat(p_body[-1:], pad, 0)])
        pres = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)]), pres)
    R_wb = jnp.asarray(R_wb_np)
    p_w = jnp.asarray(p_body)

    R_wg0 = inertial_init.initial_gravity_estimate(R_wb, pres,
                                                   edge_valid=edge_valid)
    res = inertial_init.inertial_optimization(
        R_wb, p_w, pres, R_wg0, prior_gyro=prior_gyro, prior_acc=prior_acc,
        iters=25, fix_scale=fix_scale, edge_valid=edge_valid)
    # one packed transfer of the init solve's outputs
    s, R_wg, vels, bg, ba = jax.device_get(
        (res.scale, res.R_wg, res.velocities, res.bg, res.ba))
    s = float(s)
    if not np.isfinite(s) or s < 0.02 or s > 50.0:
        return None

    apply_scaled_rotation(m, R_wg, s)
    # velocities: rotate into the gravity-aligned world (drop bucket padding)
    v_new = np.einsum("ji,kj->ki", R_wg, vels[:K])
    m.kf_vel[chain] = v_new
    m.kf_bg[chain] = bg
    m.kf_ba[chain] = ba
    m.imu_initialized = True
    m.version += 1
    return R_wg, s


def apply_scaled_rotation(m: MapStore, R_wg: np.ndarray, s: float):
    """World transform x' = s * R_wg^T x applied to the whole map
    (reference: Map::ApplyScaledRotation): keyframes R_cw' = R_cw R_wg,
    t_cw' = s t_cw; points transformed; camera-frame geometry scales by s."""
    ids = m.kf_ids()
    m.kf_R[ids] = np.einsum("kij,jl->kil", m.kf_R[ids], R_wg)
    m.kf_t[ids] = s * m.kf_t[ids]
    m.kf_vel[ids] = s * m.kf_vel[ids] @ R_wg   # v' = s R_wg^T v
    pv = m.pt_valid
    m.pt_xyz[pv] = s * m.pt_xyz[pv] @ R_wg  # == s * (R_wg^T x)^T rows
    m.pt_min_dist[pv] *= s
    m.pt_max_dist[pv] *= s
    m.pt_normal[pv] = m.pt_normal[pv] @ R_wg
    # culled-KF tombstones hold relative poses: rotation invariant, t scales
    m.tombstones = {key: (sid, ep, R_rel, s * t_rel)
                    for key, (sid, ep, R_rel, t_rel) in m.tombstones.items()}
    m.version += 1


def build_viba_problem(m: MapStore, kfs: list, fix: set,
                       calib: Optional[ImuCalib],
                       max_points: int = 2048, max_obs: int = 8192,
                       e_cap: int = 24):
    """Snapshot a keyframe set into a device VIBAProblem + host metadata.

    kfs: temporally ordered keyframe ids; fix: ids held fixed. Build/solve/
    apply are split exactly like the visual build_ba_problem so the inertial
    global BA can race tracking off the map lock."""
    from ..optim import vi_ba
    n_real = len(kfs)
    C = ((n_real + 7) // 8) * 8

    slot = {int(k): i for i, k in enumerate(kfs)}
    pt_ids = m.local_point_ids(np.asarray(kfs))[:max_points]
    if len(pt_ids) < 30:
        return None
    pt_slot = {int(p): i for i, p in enumerate(pt_ids)}

    sf2 = (m.cfg.scale ** np.arange(m.cfg.n_levels)) ** 2
    lut = np.full(m.cfg.max_pt, -1, np.int32)
    lut[pt_ids] = np.arange(len(pt_ids), dtype=np.int32)
    fp_all = m.kf_feat_point[kfs]
    slot_of = lut[np.maximum(fp_all, 0)]
    sel = (fp_all >= 0) & (slot_of >= 0)
    ci, fi = np.nonzero(sel)
    oc = ci.astype(np.int32)
    op = slot_of[ci, fi]
    ouv = m.kf_feat_xy[kfs][ci, fi].astype(np.float32)
    ow = (1.0 / sf2[m.kf_feat_level[kfs][ci, fi]]).astype(np.float32)
    O = len(oc)
    if O < 50:
        return None
    keep = (np.random.default_rng(0).choice(O, max_obs, replace=False)
            if O > max_obs else np.arange(O))
    pad_o = max_obs - len(keep)

    def pad_arr(a, fill=0):
        a = np.asarray(a)[keep]
        return np.concatenate([a, np.full((pad_o, *a.shape[1:]), fill, a.dtype)])

    # inertial edges: consecutive chain pairs with live preintegration
    ei, ej = [], []
    pre_list = []
    for a, b in zip(kfs[:-1], kfs[1:]):
        if m.kf_prev[b] == a and m.kf_pre_dT[b] > 0:
            ei.append(slot[int(a)])
            ej.append(slot[int(b)])
            pre_list.append(int(b))
    if not pre_list:
        return None
    nE = len(ei)
    if nE > e_cap:
        ei, ej, pre_list = ei[-e_cap:], ej[-e_cap:], pre_list[-e_cap:]
        nE = e_cap
    pres = m.get_kf_preintegration(np.asarray(pre_list))
    padE = e_cap - nE

    def pad_pre(x):
        pad_shape = (padE, *x.shape[1:])
        fill = np.zeros(pad_shape, np.float32)
        if x.ndim == 3 and x.shape[1:] == (3, 3):
            fill[:] = np.eye(3)
        return jnp.asarray(np.concatenate([np.asarray(x), fill]))

    pres_p = jax.tree.map(pad_pre, pres)
    # padded edges must keep dT > 0 to avoid degenerate information matrices
    dTp = np.concatenate([np.asarray(pres.dT), np.ones(padE, np.float32)])
    Cp = np.concatenate([np.asarray(pres.C),
                         np.tile(np.eye(15, dtype=np.float32)[None] * 1e-4,
                                 (padE, 1, 1))])
    pres_p = pres_p._replace(dT=jnp.asarray(dTp), C=jnp.asarray(Cp))

    padC = C - n_real
    R_bc, t_bc = _extr(calib) if calib is not None else (np.eye(3, dtype=np.float32),
                                                         np.zeros(3, np.float32))
    t_cb = (-R_bc.T @ t_bc).astype(np.float32)
    R_wb_real = np.transpose(np.einsum("ij,kjl->kil", R_bc, m.kf_R[kfs]),
                             (0, 2, 1))
    R_wb = np.concatenate([R_wb_real,
                           np.tile(np.eye(3, dtype=np.float32), (padC, 1, 1))])
    centers = -np.einsum("kij,ki->kj", m.kf_R[kfs], m.kf_t[kfs])
    centers = centers + np.einsum("kji,j->ki", m.kf_R[kfs], t_cb)
    p_w = np.concatenate([centers, np.zeros((padC, 3), np.float32)])
    v_w = np.concatenate([m.kf_vel[kfs], np.zeros((padC, 3), np.float32)])
    bg = np.concatenate([m.kf_bg[kfs], np.zeros((padC, 3), np.float32)])
    ba = np.concatenate([m.kf_ba[kfs], np.zeros((padC, 3), np.float32)])
    fixed = np.zeros(C, bool)
    fix = set(int(x) for x in fix)
    for i, k in enumerate(kfs):
        if int(k) in fix:
            fixed[i] = True
    fixed[n_real:] = True

    P = max_points
    pt_xyz = np.zeros((P, 3), np.float32)
    pt_xyz[:len(pt_ids)] = m.pt_xyz[pt_ids]
    pt_mask = np.zeros(P, bool)
    pt_mask[:len(pt_ids)] = True

    prob = vi_ba.VIBAProblem(
        R_wb=jnp.asarray(R_wb), p_w=jnp.asarray(p_w), v_w=jnp.asarray(v_w),
        bg=jnp.asarray(bg), ba=jnp.asarray(ba),
        points=jnp.asarray(pt_xyz), point_valid=jnp.asarray(pt_mask),
        obs_cam=jnp.asarray(pad_arr(oc), jnp.int32),
        obs_pt=jnp.asarray(pad_arr(op), jnp.int32),
        obs_uv=jnp.asarray(pad_arr(ouv)),
        obs_w=jnp.asarray(pad_arr(ow), jnp.float32),
        obs_valid=jnp.asarray(np.concatenate(
            [np.ones(len(keep), bool), np.zeros(pad_o, bool)])),
        edge_i=jnp.asarray(np.concatenate([ei, np.zeros(padE)]), jnp.int32),
        edge_j=jnp.asarray(np.concatenate([ej, np.zeros(padE)]), jnp.int32),
        edge_pre=pres_p,
        edge_valid=jnp.asarray(np.concatenate(
            [np.ones(nE, bool), np.zeros(padE, bool)])),
        fixed_cam=jnp.asarray(fixed))
    # cams/oc/op/cam_slot/pt_slot keys match build_ba_problem's meta so
    # apply_gba_with_propagation can consume a converted inertial result
    meta = dict(cams=[int(k) for k in kfs], n_real=n_real, pt_ids=pt_ids,
                keep=keep, oc=np.asarray(oc)[keep], op=np.asarray(op)[keep],
                cam_slot=slot, pt_slot=pt_slot, fixed=fixed,
                R_bc=R_bc, t_bc=t_bc, t_cb=t_cb)
    return prob, meta


def apply_viba_result(m: MapStore, meta: dict, res) -> bool:
    """Write a VIBAResult back into the map (body states -> camera poses,
    velocities, biases, points). Returns False on a non-finite solve."""
    kfs, n_real, pt_ids = meta["cams"], meta["n_real"], meta["pt_ids"]
    fixed, R_bc, t_bc = meta["fixed"], meta["R_bc"], meta["t_bc"]
    p_all, R_wb_all, v_all, bg_all, ba_all, pts_all = jax.device_get(
        (res.p_w, res.R_wb, res.v_w, res.bg, res.ba, res.points))
    if not np.isfinite(p_all[:n_real]).all():
        return False
    for i, k in enumerate(kfs):
        if fixed[i]:
            continue
        R_cw, t_cw = camera_from_body(R_wb_all[i], p_all[i], R_bc, t_bc)
        m.kf_R[k] = R_cw
        m.kf_t[k] = t_cw
    m.kf_vel[kfs] = v_all[:n_real]
    m.kf_bg[kfs] = bg_all[:n_real]
    m.kf_ba[kfs] = ba_all[:n_real]
    m.pt_xyz[pt_ids] = pts_all[:len(pt_ids)]
    m.version += 1
    return True


def run_local_inertial_ba(m: MapStore, cam, window: int = 10,
                          iters: int = 8, max_points: int = 2048,
                          max_obs: int = 8192,
                          prior_gyro: float = 1.0, prior_acc: float = 1e4,
                          calib: Optional[ImuCalib] = None):
    """Temporal-window visual-inertial BA
    (reference: Optimizer::LocalInertialBA, Optimizer.cc:2203: Nd=10
    optimizable recent KFs, older frontier fixed)."""
    from ..optim import vi_ba
    chain = m.temporal_chain()
    if len(chain) < 3 or not m.imu_initialized:
        return
    opt = chain[-window:]
    fixed_n = min(4, len(chain) - len(opt))
    fix = chain[-window - fixed_n:-window] if fixed_n > 0 else chain[:1]
    kfs = list(fix) + list(opt)
    built = build_viba_problem(m, kfs, set(int(x) for x in fix), calib,
                               max_points=max_points, max_obs=max_obs)
    if built is None:
        return
    prob, meta = built
    g = np.array([0.0, 0.0, -GRAVITY_MAG], np.float32)
    res = vi_ba.vi_ba_solve(prob, cam, jnp.asarray(meta["R_bc"].T),
                            jnp.asarray(meta["t_cb"]),
                            gravity=jnp.asarray(g),
                            prior_gyro=prior_gyro, prior_acc=prior_acc,
                            iters=iters)
    apply_viba_result(m, meta, res)


# full-map bucketing: the camera count is rounded up to a multiple of this
# so XLA compiles one full-inertial-BA program per bucket as the map grows
_FULL_C_BUCKET = 16


def run_full_inertial_ba(m: MapStore, cam, iters: int = 10,
                         max_points: int = 4096, max_obs: int = 16384,
                         prior_gyro: float = 1.0, prior_acc: float = 1e4,
                         calib: Optional[ImuCalib] = None):
    """Full-map visual-inertial bundle adjustment: EVERY keyframe of the
    temporal chain optimizes 15-dof states with preintegration + bias
    random-walk edges, landmarks Schur-eliminated (reference:
    Optimizer::FullInertialBA, Optimizer.cc:3237 — run at the end of each
    IMU-init stage, LocalMapping.cc:1760-1800, and as the post-loop global
    BA on inertial maps, LoopClosing.cc:2886-2890)."""
    chain = m.temporal_chain()
    if len(chain) < 3 or not m.imu_initialized:
        return
    kfs = [int(k) for k in chain]
    built = build_full_viba_problem(m, kfs, calib, max_points, max_obs)
    if built is None:
        return
    prob, meta = built
    from ..optim import vi_ba
    g = np.array([0.0, 0.0, -GRAVITY_MAG], np.float32)
    res = vi_ba.vi_ba_solve(prob, cam, jnp.asarray(meta["R_bc"].T),
                            jnp.asarray(meta["t_cb"]),
                            gravity=jnp.asarray(g),
                            prior_gyro=prior_gyro, prior_acc=prior_acc,
                            iters=iters)
    apply_viba_result(m, meta, res)


def run_merge_inertial_ba(m: MapStore, cam, k: int, c: int,
                          calib: Optional[ImuCalib], nd: int = 6,
                          iters: int = 8, max_points: int = 2048,
                          max_obs: int = 8192):
    """Visual-inertial weld refinement after a map merge (reference:
    Optimizer::MergeInertialBA, Optimizer.cc:6017, called from MergeLocal /
    MergeLocal2, LoopClosing.cc:2127,2618): an Nd-keyframe temporal window
    ending at the current keyframe k and a 2*Nd-bounded temporal window
    around the welded match c optimize full 15-dof body states with
    preintegration edges inside each sub-chain (the weld junction itself has
    no preintegration, so no cross-chain edge forms); the temporal
    predecessor of each window is held fixed.

    Returns the list of keyframe ids that were optimized or fixed (the weld
    window handed to run_merge_essential_graph as its fixed set), or None
    when no inertial problem could be built (caller falls back to the
    visual weld BA)."""
    if not m.imu_initialized:
        return None

    def back_chain(start: int, count: int):
        out = [int(start)]
        while len(out) < count:
            p = int(m.kf_prev[out[-1]])
            if p < 0 or not m.kf_valid[p]:
                break
            out.append(p)
        return out

    # successor links derived from kf_prev (the store keeps prev only)
    next_of = {}
    for b in m.kf_ids():
        p = int(m.kf_prev[b])
        if p >= 0:
            next_of[p] = int(b)

    # current-side window: k and its Nd-1 temporal predecessors, anchored
    # by one more fixed predecessor (reference steps 1.1-1.2)
    win_k = back_chain(k, nd)
    p = int(m.kf_prev[win_k[-1]])
    if p >= 0 and m.kf_valid[p]:
        fix_k = [p]
    else:
        fix_k = [win_k.pop()]
        if not win_k:
            return None
    # merge-side window: c, Nd/2-1 predecessors (reference 2.2's loop runs
    # i=1..Nd/2-1), then successors until the COMBINED optimizable set
    # reaches 2*Nd (reference 2.5 bounds vpOptimizableKFs — both windows
    # together — at 2*Nd), anchored likewise (reference steps 2.1-2.5)
    win_c = back_chain(c, nd // 2)
    p = int(m.kf_prev[win_c[-1]])
    if p >= 0 and m.kf_valid[p]:
        fix_c = [p]
    else:
        fix_c = [win_c.pop()]
        if not win_c:
            return None
    nxt = next_of.get(int(c), -1)
    while len(win_c) + len(win_k) < 2 * nd and nxt >= 0 and nxt not in win_k:
        win_c.append(int(nxt))
        nxt = next_of.get(int(nxt), -1)

    # temporally ordered per sub-chain (oldest first) so build_viba_problem
    # links consecutive prev-connected pairs; the c-chain precedes the
    # k-chain, and the junction pair fails the prev check -> no edge
    chain_c = sorted(set(fix_c + win_c), key=lambda x: m.kf_ts[x])
    chain_k = sorted(set(fix_k + win_k), key=lambda x: m.kf_ts[x])
    if set(chain_c) & set(chain_k):
        return None   # overlapping windows: fall back to the visual BA
    kfs = chain_c + chain_k
    fix = {chain_c[0], chain_k[0]} | set(fix_c) | set(fix_k)
    built = build_viba_problem(m, kfs, fix, calib,
                               max_points=max_points, max_obs=max_obs,
                               e_cap=2 * nd + 8)
    if built is None:
        return None
    prob, meta = built
    from ..optim import vi_ba
    g = np.array([0.0, 0.0, -GRAVITY_MAG], np.float32)
    res = vi_ba.vi_ba_solve(prob, cam, jnp.asarray(meta["R_bc"].T),
                            jnp.asarray(meta["t_cb"]),
                            gravity=jnp.asarray(g), iters=iters)
    if not apply_viba_result(m, meta, res):
        return None
    return kfs


def build_full_viba_problem(m: MapStore, kfs: list,
                            calib: Optional[ImuCalib],
                            max_points: int = 4096, max_obs: int = 16384):
    """Full-chain VIBA problem: gauge fixed at the oldest keyframe, edge
    capacity bucketed with the chain length (one compile per bucket)."""
    e_cap = max(_FULL_C_BUCKET * int(np.ceil(len(kfs) / _FULL_C_BUCKET)), 8)
    return build_viba_problem(m, kfs, {int(kfs[0])}, calib,
                              max_points=max_points, max_obs=max_obs,
                              e_cap=e_cap)
