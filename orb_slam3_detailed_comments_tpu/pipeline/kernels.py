"""Jitted device kernels used by the pipeline stages.

These are the fused per-frame / per-keyframe device programs that the host
orchestration (tracking.py / local_mapping.py) launches. Each corresponds to
a hot loop of the reference (file:line cited per function).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import SE3
from ..models import cameras
from ..ops import extractor, matching, triangulate
from ..optim import pose_opt

# Epipolar SAD sub-pixel refinement of KB8 fisheye stereo matches (see
# prepare_frame_stereo_fisheye) — an improvement beyond the reference
# (its KB8 matches stay at integer keypoints). Per-match depth accuracy
# DOUBLES (measured: fraction within 5% of ground truth 0.32 -> 0.64 on
# the stress box, ~0.5 -> 0.75 on the gentle world, per-band bias at or
# below the integer path's). System-level Horn scale on the 45-frame
# gentle stereo-inertial arc, measured across world seeds: subpixel
# 0.966 / 1.000 vs integer ~1.00 / 0.986 — the short-arc scale estimator
# itself has a +-2-3% cross-realization spread, and subpixel sits inside
# it while winning on ATE; the corresponding test gate reflects the
# measured spread. Flag kept for A/B and bisection (read at trace time).
KB8_SUBPIXEL = True


class PreparedFrame(NamedTuple):
    """Per-frame feature data in all coordinate systems the pipeline needs."""

    feat: extractor.FrameFeatures
    xy_ud: jnp.ndarray   # [N, 2] undistorted pixel coords
    xyn: jnp.ndarray     # [N, 2] normalized camera-plane coords


@partial(jax.jit, static_argnames=("cam", "cfg"))
def prepare_frame(img: jnp.ndarray, cam: cameras.CameraParams,
                  cfg: extractor.OrbConfig) -> PreparedFrame:
    """ORB extraction + undistortion (reference: Frame ctor, Frame.cc:513,1003)."""
    feat = extractor.extract(img, cfg)
    rays = cameras.unproject(cam, feat.xy)
    xyn = rays[:, :2]
    xy_ud = cameras.undistort_points(cam, feat.xy)
    return PreparedFrame(feat, xy_ud, xyn)


@partial(jax.jit, static_argnames=("cam", "cfg", "n_levels", "scale", "bf"))
def prepare_frame_stereo(img_l: jnp.ndarray, img_r: jnp.ndarray,
                         cam: cameras.CameraParams, bf: float,
                         cfg: extractor.OrbConfig,
                         n_levels: int = 8, scale: float = 1.2):
    """Stereo frame prep: extract both images, row-match, attach depth
    (reference: Frame stereo ctor + ComputeStereoMatches, Frame.cc:1102).
    Returns (PreparedFrame of the left image, depth [N], u_right [N])."""
    from . import kernels as _self  # for clarity; same module
    from ..ops import stereo as stereo_mod
    prep = prepare_frame(img_l, cam, cfg)
    feat_r = extractor.extract(img_r, cfg)
    sm = stereo_mod.stereo_match(
        prep.xy_ud, prep.feat.level, prep.feat.desc, prep.feat.valid,
        feat_r.xy, feat_r.level, feat_r.desc, feat_r.valid,
        img_l, img_r, bf, min_z=max(bf / cam.fx * 2.0, 0.3),
        n_levels=n_levels, scale=scale)
    return prep, sm.depth, sm.u_right


@partial(jax.jit, static_argnames=("cam_l", "cam_r", "cfg"))
def prepare_frame_stereo_fisheye(img_l: jnp.ndarray, img_r: jnp.ndarray,
                                 cam_l: cameras.CameraParams,
                                 cam_r: cameras.CameraParams,
                                 R_rl: jnp.ndarray, t_rl: jnp.ndarray,
                                 cfg: extractor.OrbConfig):
    """Non-rectified (fisheye) stereo prep: brute-force descriptor matching
    gated by the epipolar constraint of the known extrinsic, then two-view
    triangulation for a per-feature depth (reference:
    Frame::ComputeStereoFishEyeMatches, Frame.cc:1530 +
    KannalaBrandt8::TriangulateMatches, KannalaBrandt8.cpp:327).

    R_rl/t_rl: right <- left extrinsic. Returns (PreparedFrame left,
    depth [N] (0 where no match), idx_r [N]).
    """
    from ..lie import so3 as _so3
    prep_l = prepare_frame(img_l, cam_l, cfg)
    feat_r = extractor.extract(img_r, cfg)
    xyn_r = cameras.unproject(cam_r, feat_r.xy)[:, :2]

    # epipolar gate: l_r = E x_l with E = [t]x R (lines in right cam)
    E = _so3.hat(t_rl) @ R_rl
    ones_l = jnp.ones_like(prep_l.xyn[:, :1])
    Xl = jnp.concatenate([prep_l.xyn, ones_l], axis=-1)
    Xr = jnp.concatenate([xyn_r, jnp.ones_like(xyn_r[:, :1])], axis=-1)
    l_r = Xl @ E.T
    num = jnp.einsum("ai,bi->ab", l_r, Xr)
    d2 = num * num / jnp.maximum(
        (l_r[:, 0] ** 2 + l_r[:, 1] ** 2)[:, None], 1e-12)
    epi_ok = d2 * float(cam_l.fx) ** 2 < 3.84 * 4.0   # ~2 sigma of 2px

    res = matching.match_nn(prep_l.feat.desc, prep_l.feat.valid,
                            feat_r.desc, feat_r.valid,
                            max_dist=matching.TH_LOW, ratio=0.8, mutual=True,
                            extra_mask=epi_ok)
    T_l = SE3(jnp.eye(3), jnp.zeros(3))
    T_r = SE3(R_rl, t_rl)
    X, tri_ok = triangulate.triangulate(T_l, prep_l.xyn, T_r, xyn_r[res.idx])

    # --- epipolar SAD sub-pixel (BEYOND the reference: its KB8 matches
    # stay at integer keypoints, leaving a z^2/(b·f)-per-px depth-noise
    # floor ~0.2 m/px at z=3 m for an 11 cm rig). Slide an 11x11 SAD
    # window along the epipolar tangent at the matched right feature —
    # the direction its projection moves as the point slides along the
    # left ray — parabola-fit, and re-triangulate at the refined pixel.
    xy_r0 = feat_r.xy[res.idx]
    xy_r_chk = xy_r0
    if KB8_SUBPIXEL:
        from ..ops import stereo as stereo_mod
        uvr0 = cameras.project(cam_r, T_r.apply(X))
        dtan = cameras.project(cam_r, T_r.apply(X * 1.05)) - uvr0
        e_dir = dtan / jnp.maximum(
            jnp.linalg.norm(dtan, axis=-1, keepdims=True), 1e-6)
        # only refine matches with real depth information: past ~60x the
        # baseline one pixel of slide moves depth by z^2/(b f) >> the
        # SAD minimum's reliability, and slanted-patch appearance bias
        # systematically drags far points (measured: gentle-sequence
        # Horn scale 1.00 -> 0.96 with unrestricted refinement)
        near = X[:, 2] < 60.0 * jnp.linalg.norm(t_rl)
        delta, ok_ref = stereo_mod.epipolar_sad_refine(
            img_l, img_r, prep_l.feat.xy, xy_r0, e_dir,
            res.valid & tri_ok & near)
        # wander guards: the descriptor match already localized the
        # feature to ~1 px, so a trustworthy SAD minimum is SMALL; a
        # large slide means SAD and the descriptor disagree (repeated
        # texture / slanted-patch appearance bias) and at far range the
        # noisy initial depth lets such slides drag points meters
        # (measured: +1.5% far-band bias without these guards)
        ok_ref = ok_ref & (jnp.abs(delta) <= 2.5)
        xy_r_use = xy_r0 + jnp.where(ok_ref, delta, 0.0)[:, None] * e_dir
        xyn_r_use = cameras.unproject(cam_r, xy_r_use)[:, :2]
        X2, tri_ok2 = triangulate.triangulate(T_l, prep_l.xyn, T_r,
                                              xyn_r_use)
        dz = X2[:, 2] / jnp.maximum(X[:, 2], 1e-6)
        use = ok_ref & tri_ok2 & (dz > 0.8) & (dz < 1.25)
        X = jnp.where(use[:, None], X2, X)
        tri_ok = jnp.where(use, tri_ok2, tri_ok)
        xy_r_chk = jnp.where(use[:, None], xy_r_use, xy_r0)

    z_l = X[:, 2]
    z_r = T_r.apply(X)[:, 2]
    # reprojection checks in both views (chi2 < 5.991, sigma 1px)
    uv_l = cameras.project(cam_l, X)
    uv_r = cameras.project(cam_r, T_r.apply(X))
    e_l = jnp.sum((uv_l - prep_l.feat.xy) ** 2, axis=-1)
    e_r = jnp.sum((uv_r - xy_r_chk) ** 2, axis=-1)
    baseline = jnp.linalg.norm(t_rl)
    good = (res.valid & tri_ok & (z_l > baseline * 2) & (z_r > baseline * 2)
            & (e_l < 5.991) & (e_r < 5.991))
    depth = jnp.where(good, z_l, 0.0)
    return prep_l, depth, res.idx


@partial(jax.jit, static_argnames=("cam", "cfg", "bf"))
def prepare_frame_rgbd(img: jnp.ndarray, depth_img: jnp.ndarray,
                       cam: cameras.CameraParams, bf: float,
                       cfg: extractor.OrbConfig):
    """RGB-D frame prep: sample the registered depth map at each keypoint
    (reference: Frame RGB-D ctor ComputeStereoFromRGBD, Frame.cc:1487).
    Returns (PreparedFrame, depth [N], virtual u_right [N])."""
    prep = prepare_frame(img, cam, cfg)
    u = jnp.clip(prep.feat.xy[:, 0].astype(jnp.int32), 0, depth_img.shape[1] - 1)
    v = jnp.clip(prep.feat.xy[:, 1].astype(jnp.int32), 0, depth_img.shape[0] - 1)
    z = depth_img[v, u]
    z = jnp.where(z > 0.05, z, 0.0)
    u_r = jnp.where(z > 0, prep.xy_ud[:, 0] - bf / jnp.maximum(z, 1e-6), -1.0)
    return prep, z, u_r


class ProjectedPoints(NamedTuple):
    uv: jnp.ndarray        # [P, 2] predicted pixel (undistorted frame)
    dist: jnp.ndarray      # [P] distance to camera center
    level: jnp.ndarray     # [P] predicted pyramid level
    visible: jnp.ndarray   # [P] frustum + scale + view-angle gate


@jax.jit
def gather_matched_rows(pt_xyz: jnp.ndarray, safe_ids: jnp.ndarray,
                        inv_sigma2: jnp.ndarray, level: jnp.ndarray):
    """(pt_xyz[safe_ids], inv_sigma2[level]) in one dispatch — feeds the
    inertial pose refinement without per-frame eager gathers."""
    return pt_xyz[safe_ids], inv_sigma2[level]


@partial(jax.jit, static_argnames=("cam", "scale", "n_levels"))
def gather_and_project(T_cw: SE3, ids: jnp.ndarray,
                       pt_xyz: jnp.ndarray, pt_normal: jnp.ndarray,
                       pt_min_dist: jnp.ndarray, pt_max_dist: jnp.ndarray,
                       pt_valid: jnp.ndarray, cam: cameras.CameraParams,
                       scale: float = 1.2, n_levels: int = 8,
                       pt_proj8: jnp.ndarray = None) -> ProjectedPoints:
    """project_points with the candidate-row gathers fused into the same
    program: takes the FULL device-resident map arrays plus the padded id
    list [C] (-1 padding) and gathers on-chip. One dispatch per frame
    instead of one eager dispatch per gathered array (the per-frame hot
    path; eager dispatch latency dominates over a TPU tunnel).

    pt_proj8: optional packed [P, 8] (xyz, normal, min, max) rows
    (MapStore.device_points()["proj8"]): one row gather instead of four
    per-array gathers — XLA splits the latter per column (69 -> 29 us at
    4096 candidates, measured)."""
    safe = jnp.maximum(ids, 0)
    valid = (ids >= 0) & pt_valid[safe]
    if pt_proj8 is not None:
        rows = pt_proj8[safe]
        return project_points(T_cw, rows[:, 0:3], rows[:, 3:6],
                              rows[:, 6], rows[:, 7], valid,
                              cam, scale, n_levels)
    return project_points(T_cw, pt_xyz[safe], pt_normal[safe],
                          pt_min_dist[safe], pt_max_dist[safe], valid,
                          cam, scale, n_levels)


@partial(jax.jit, static_argnames=("cam", "scale", "n_levels"))
def project_points(T_cw: SE3, pts: jnp.ndarray, normals: jnp.ndarray,
                   min_dist: jnp.ndarray, max_dist: jnp.ndarray,
                   valid: jnp.ndarray, cam: cameras.CameraParams,
                   scale: float = 1.2, n_levels: int = 8) -> ProjectedPoints:
    """Frustum/scale/view-angle visibility + level prediction
    (reference: Frame::isInFrustum, Frame.cc:667)."""
    pc = T_cw.apply(pts)
    z = pc[..., 2]
    uv = cameras.project(cam, pc)
    cw = T_cw.inverse().t
    vec = pts - cw
    dist = jnp.linalg.norm(vec, axis=-1)
    cos_view = jnp.sum(vec * normals, axis=-1) / jnp.maximum(dist, 1e-9)
    ratio = max_dist / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / np.log(scale))
    level = jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)
    visible = (valid & (z > 0.05)
               & cameras.in_image(cam, uv)
               & (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)
               & (cos_view > 0.5))
    return ProjectedPoints(uv, dist, level, visible)


class TrackResult(NamedTuple):
    T_cw_R: jnp.ndarray
    T_cw_t: jnp.ndarray
    match_pt: jnp.ndarray   # [N] map-point id per feature (-1 = none)
    n_inliers: jnp.ndarray


def _match_optimize_core(T_cw0: SE3, frame: PreparedFrame,
                         pt_ids: jnp.ndarray, proj: ProjectedPoints,
                         pt_desc: jnp.ndarray, pt_xyz: jnp.ndarray,
                         radius_per_level: jnp.ndarray,
                         inv_sigma2_per_level: jnp.ndarray,
                         prior_match_pt: jnp.ndarray,
                         cam: cameras.CameraParams,
                         proj_angle: jnp.ndarray | None = None) -> TrackResult:
    """Traceable body of match_and_optimize (see its docstring); shared by
    the standalone jit below and the fused full-frame program
    track_step_visual."""
    feat = frame.feat
    radius = radius_per_level[proj.level]
    taken = prior_match_pt >= 0
    desc_c = pt_desc[jnp.maximum(pt_ids, 0)]
    res = matching.search_by_projection(
        proj.uv, proj.visible & (pt_ids >= 0), desc_c, proj.level,
        feat._replace(xy=frame.xy_ud), radius,
        level_lo=-1, level_hi=1, max_dist=matching.TH_HIGH, ratio=0.8,
        taken=taken)
    if proj_angle is not None:
        dang = proj_angle - feat.angle[res.idx]
        res = res._replace(
            valid=matching.rotation_consistency_mask(dang, res.valid))

    # invert: feature -> point (first projected point wins via scatter-min)
    N = feat.xy.shape[0]
    match_pt = jnp.full((N,), -1, jnp.int32)
    upd = jnp.where(res.valid, pt_ids, -1)
    tgt = jnp.where(res.valid, res.idx, N)  # N = dump slot
    match_pt = jnp.zeros((N + 1,), jnp.int32).at[:].set(-1).at[tgt].set(upd)[:N]
    match_pt = jnp.where(taken, prior_match_pt, match_pt)

    # gather 3D for matched features
    has = match_pt >= 0
    safe_ids = jnp.where(has, match_pt, 0)
    X = pt_xyz[safe_ids]
    uv = frame.xy_ud
    w = inv_sigma2_per_level[feat.level]
    opt = pose_opt.pose_optimization(T_cw0, X, uv, w, has & feat.valid, cam)
    match_pt = jnp.where(opt.inlier | ~has, match_pt, -1)
    return TrackResult(opt.T_cw.R, opt.T_cw.t, match_pt,
                       jnp.sum((match_pt >= 0).astype(jnp.int32)))


@partial(jax.jit, static_argnames=("cam",))
def match_and_optimize(T_cw0: SE3, frame: PreparedFrame,
                       pt_ids: jnp.ndarray, proj: ProjectedPoints,
                       pt_desc: jnp.ndarray, pt_xyz: jnp.ndarray,
                       radius_per_level: jnp.ndarray,
                       inv_sigma2_per_level: jnp.ndarray,
                       prior_match_pt: jnp.ndarray,
                       cam: cameras.CameraParams,
                       proj_angle: jnp.ndarray | None = None) -> TrackResult:
    """Projection search + motion-only pose optimization, fused.

    Covers both TrackWithMotionModel and TrackLocalMap's hot loops
    (reference: ORBmatcher.cc:1950/45 + Optimizer::PoseOptimization).

    pt_ids [P]: global point ids of the candidate set (-1 padding).
    pt_desc/pt_xyz are the FULL map arrays; candidate rows are gathered
    on-chip from pt_ids (keeps the per-frame host->device dispatch count
    at one for this whole stage).
    prior_match_pt [N]: existing feature->point assignments to keep
    (features with a prior match are excluded from the new search).
    proj_angle [P] (optional): source-observation keypoint angle per
    candidate point; when given, matches must fall in the dominant
    rotation-histogram bins (reference: the mbCheckOrientation pass of
    the last-frame SearchByProjection, ORBmatcher.cc:1950,2038-2058).
    """
    return _match_optimize_core(T_cw0, frame, pt_ids, proj, pt_desc, pt_xyz,
                                radius_per_level, inv_sigma2_per_level,
                                prior_match_pt, cam, proj_angle)


class TrackStepResult(NamedTuple):
    """Everything the host needs from one steady-state visual tracking step,
    fetched in a single packed device_get."""
    n1: jnp.ndarray         # stage-1 (motion-model) inlier count
    ref_kf: jnp.ndarray     # argmax-observation local keyframe
    match_pt: jnp.ndarray   # [N] final feature->point matches
    T_cw_R: jnp.ndarray
    T_cw_t: jnp.ndarray
    ids2: jnp.ndarray       # [C2] local-map candidate point ids (-1 pad)
    visible2: jnp.ndarray   # [C2] frustum-visible mask (pt_visible counters)
    angle: jnp.ndarray      # [N] current frame keypoint angles (host cache)
    valid: jnp.ndarray      # [N] current frame validity (host cache)


@partial(jax.jit, static_argnames=("cam", "scale", "n_levels", "min_covis_w",
                                   "local_cap"))
def track_step_visual(T_pred: SE3, frame: PreparedFrame,
                      ids1: jnp.ndarray, ang1: jnp.ndarray,
                      pt_xyz, pt_desc, pt_normal, pt_min_dist, pt_max_dist,
                      pt_valid,
                      kf_feat_point: jnp.ndarray, kf_valid: jnp.ndarray,
                      covis: jnp.ndarray, kf_point_bits: jnp.ndarray,
                      radius1_per_level: jnp.ndarray,
                      radius2_per_level: jnp.ndarray,
                      inv_sigma2_per_level: jnp.ndarray,
                      cam: cameras.CameraParams,
                      scale: float = 1.2, n_levels: int = 8,
                      min_covis_w: int = 15,
                      local_cap: int = 4096,
                      pt_proj8: jnp.ndarray = None) -> TrackStepResult:
    """The WHOLE steady-state visual tracking step as ONE device program:

      motion-model projection search + pose GN      (Tracking.cc:3352)
      -> on-chip local-keyframe selection            (Tracking.cc:4132)
      -> local-point union + projection at the       (Tracking.cc:3979)
         stage-1 optimized pose
      -> local-map projection search + pose GN       (Tracking.cc:3474)

    The reference runs these as host stages sharing the map behind mutexes;
    here the intermediate pose/matches never leave the chip, so a frame
    costs one dispatch + one packed fetch instead of two round trips (the
    round trip, not compute, bounds per-frame latency on a network-attached
    TPU — and removing a host sync helps pipelining on local chips too).

    ids1 [C1]: stage-1 candidate point ids (last frame's matches, -1 pad).
    ang1 [C1]: rotation-consistency reference angle per stage-1 candidate.
    kf_feat_point [K, N] / kf_valid [K] / covis [K, K] / kf_point_bits
    [K, P/32]: observation structure + covisibility weights + per-KF
    point-membership bitsets (device cache, per map version).
    """
    res1, ref_kf, ids2, proj2, res2 = _track_step_visual_core(
        T_pred, frame, ids1, ang1, pt_xyz, pt_desc, pt_normal, pt_min_dist,
        pt_max_dist, pt_valid, kf_feat_point, kf_valid, covis, kf_point_bits,
        radius1_per_level, radius2_per_level, inv_sigma2_per_level, cam,
        scale, n_levels, min_covis_w, local_cap, pt_proj8=pt_proj8)
    return TrackStepResult(res1.n_inliers, ref_kf, res2.match_pt,
                           res2.T_cw_R, res2.T_cw_t, ids2, proj2.visible,
                           frame.feat.angle, frame.feat.valid)


def _track_step_visual_core(T_pred: SE3, frame: PreparedFrame,
                            ids1, ang1,
                            pt_xyz, pt_desc, pt_normal, pt_min_dist,
                            pt_max_dist, pt_valid,
                            kf_feat_point, kf_valid, covis, kf_point_bits,
                            radius1_per_level, radius2_per_level,
                            inv_sigma2_per_level,
                            cam: cameras.CameraParams,
                            scale: float, n_levels: int,
                            min_covis_w: int, local_cap: int,
                            pt_proj8=None):
    """Traceable body of track_step_visual (also the front half of the
    fused inertial step kernels below).

    The selection stage works on the [K, P/32] point-membership bitsets:
    per-KF observation counts are AND+popcount against the matched-point
    bitset, and the local point union is a log2(K) OR-reduction — both pure
    vector ops. The direct forms (gather / scatter of the K*N point-id
    table) serialize on TPU and cost ~2 ms each at K=256, N=1024 (measured
    v5e; the bitset forms measure ~0)."""
    P = pt_xyz.shape[0]
    K = kf_feat_point.shape[0]

    # ---- stage 1: track with motion model --------------------------------
    proj1 = gather_and_project(T_pred, ids1, pt_xyz, pt_normal, pt_min_dist,
                               pt_max_dist, pt_valid, cam, scale, n_levels,
                               pt_proj8=pt_proj8)
    no_prior = jnp.full((frame.feat.xy.shape[0],), -1, jnp.int32)
    res1 = _match_optimize_core(T_pred, frame, ids1, proj1, pt_desc, pt_xyz,
                                radius1_per_level, inv_sigma2_per_level,
                                no_prior, cam, proj_angle=ang1)
    match1 = res1.match_pt
    T1 = SE3(res1.T_cw_R, res1.T_cw_t)

    # ---- local-keyframe selection on-chip ---------------------------------
    # observers of the stage-1 matched points, ranked (UpdateLocalKeyFrames)
    m = jnp.zeros((P,), bool).at[
        jnp.where(match1 >= 0, match1, P)].set(True, mode="drop")
    shifts = jnp.arange(32, dtype=jnp.uint32)
    # pack the matched-point mask into a bitset (sum of disjoint bits == OR)
    matched_bits = jnp.sum(
        m.reshape(P // 32, 32).astype(jnp.uint32) << shifts[None, :],
        axis=1, dtype=jnp.uint32)
    obs = jnp.sum(jax.lax.population_count(
        kf_point_bits & matched_bits[None, :]).astype(jnp.int32), axis=1)
    obs = jnp.where(kf_valid, obs, 0)
    cnt10, top10 = jax.lax.top_k(obs, 10)
    sel10 = cnt10 > 0
    ref_kf = top10[0]
    # extend by each selected KF's top covisible neighbors (weight >= 15)
    w10 = covis[top10]                                   # [10, K]
    w10 = jnp.where(w10 >= min_covis_w, w10, 0)
    nb_w, nb = jax.lax.top_k(w10, 10)                    # [10, 10]
    local_k = jnp.zeros((K,), bool).at[
        jnp.where(sel10, top10, K)].set(True, mode="drop")
    nb_flat = jnp.where(sel10[:, None] & (nb_w > 0), nb, K).ravel()
    local_k = local_k.at[nb_flat].set(True, mode="drop")

    # ---- local point union -> padded candidate list -----------------------
    x = jnp.where((local_k & kf_valid)[:, None], kf_point_bits,
                  jnp.uint32(0))
    if x.shape[0] & (x.shape[0] - 1):               # pad K to a power of two
        K2 = 1 << (x.shape[0] - 1).bit_length()
        x = jnp.concatenate(
            [x, jnp.zeros((K2 - x.shape[0], x.shape[1]), jnp.uint32)])
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = x[:h] | x[h:]
    union = x[0]                                    # [P/32] u32
    pmask = (((union[:, None] >> shifts[None, :]) & jnp.uint32(1)) > 0
             ).reshape(P)
    pmask = pmask & pt_valid
    C2 = min(P, local_cap)
    # compact the first C2 set bits (ascending id) via cumsum+scatter: the
    # same result as top_k over the 0/1 mask, without the sort-based top_k
    # lowering (a full 16k sort on the VPU dominated the fused frame program)
    pos = jnp.cumsum(pmask.astype(jnp.int32)) - 1
    tgt = jnp.where(pmask & (pos < C2), pos, C2)
    ids2 = jnp.full((C2 + 1,), -1, jnp.int32).at[tgt].set(
        jnp.arange(P, dtype=jnp.int32))[:C2]

    # ---- stage 2: track local map at the stage-1 pose ----------------------
    proj2 = gather_and_project(T1, ids2, pt_xyz, pt_normal, pt_min_dist,
                               pt_max_dist, pt_valid, cam, scale, n_levels,
                               pt_proj8=pt_proj8)
    res2 = _match_optimize_core(T1, frame, ids2, proj2, pt_desc, pt_xyz,
                                radius2_per_level, inv_sigma2_per_level,
                                match1, cam, proj_angle=None)
    return res1, ref_kf, ids2, proj2, res2


class TrackStepInertialResult(NamedTuple):
    """track_step_visual outputs + the visual-inertial refine appended
    (reference: the PoseInertialOptimization call at the end of
    TrackLocalMap, Tracking.cc:3502-3528). `prior` (the next frame's
    marginalization prior) is NOT part of the host fetch — it stays on
    device and feeds the next frame's last-frame variant directly."""
    n1: jnp.ndarray
    ref_kf: jnp.ndarray
    match_pt: jnp.ndarray
    T_cw_R: jnp.ndarray
    T_cw_t: jnp.ndarray
    ids2: jnp.ndarray
    visible2: jnp.ndarray
    angle: jnp.ndarray
    valid: jnp.ndarray
    ni: jnp.ndarray        # refine inlier count
    inl_i: jnp.ndarray     # [N] refine inlier mask (over features)
    v_w: jnp.ndarray       # [3] refined world velocity
    Ri_cw: jnp.ndarray
    ti_cw: jnp.ndarray
    prior: object          # PriorPoseImu (device-resident)


def _refine_inputs(frame, res2, pt_xyz, inv_sigma2_per_level):
    match = res2.match_pt
    has = match >= 0
    safe = jnp.where(has, match, 0)
    X = pt_xyz[safe]
    w = inv_sigma2_per_level[frame.feat.level]
    vmask = has & frame.feat.valid
    return SE3(res2.T_cw_R, res2.T_cw_t), X, w, vmask


@partial(jax.jit, static_argnames=("cam", "scale", "n_levels", "min_covis_w",
                                   "local_cap"))
def track_step_inertial_anchor(T_pred: SE3, frame: PreparedFrame,
                               ids1, ang1,
                               pt_xyz, pt_desc, pt_normal, pt_min_dist,
                               pt_max_dist, pt_valid,
                               kf_feat_point, kf_valid, covis, kf_point_bits,
                               radius1_per_level, radius2_per_level,
                               inv_sigma2_per_level,
                               v0, R_wb_a, p_a, v_a, bg, ba, pre,
                               gravity, R_cb, t_cb,
                               cam: cameras.CameraParams,
                               scale: float = 1.2, n_levels: int = 8,
                               min_covis_w: int = 15,
                               local_cap: int = 4096,
                               pt_proj8: jnp.ndarray = None
                               ) -> TrackStepInertialResult:
    """The fused steady-state step for inertial sensors, last-KEYFRAME
    anchored (map changed since the last frame, so the running prior is
    stale — reference: the mbMapUpdated branch of Tracking.cc:3502-3528).
    Appends pose_inertial_optimization + the prior seed to the visual core:
    the whole frame is still one dispatch + one packed fetch."""
    from ..optim import pose_opt
    res1, ref_kf, ids2, proj2, res2 = _track_step_visual_core(
        T_pred, frame, ids1, ang1, pt_xyz, pt_desc, pt_normal, pt_min_dist,
        pt_max_dist, pt_valid, kf_feat_point, kf_valid, covis, kf_point_bits,
        radius1_per_level, radius2_per_level, inv_sigma2_per_level, cam,
        scale, n_levels, min_covis_w, local_cap, pt_proj8=pt_proj8)
    T2, X, w, vmask = _refine_inputs(frame, res2, pt_xyz,
                                     inv_sigma2_per_level)
    ri = pose_opt.pose_inertial_optimization(
        T2, v0, R_wb_a, p_a, v_a, bg, ba, pre, X, frame.xy_ud, w, vmask,
        cam, gravity=gravity, R_cb=R_cb, t_cb=t_cb)
    prior = pose_opt.build_frame_prior(
        ri.T_cw, ri.v_w, bg, ba, R_wb_a, p_a, v_a, pre, X, frame.xy_ud, w,
        ri.inlier, cam, gravity, R_cb=R_cb, t_cb=t_cb)
    return TrackStepInertialResult(
        res1.n_inliers, ref_kf, res2.match_pt, res2.T_cw_R, res2.T_cw_t,
        ids2, proj2.visible, frame.feat.angle, frame.feat.valid,
        ri.n_inliers, ri.inlier, ri.v_w, ri.T_cw.R, ri.T_cw.t, prior)


@partial(jax.jit, static_argnames=("cam", "scale", "n_levels", "min_covis_w",
                                   "local_cap"))
def track_step_inertial_lf(T_pred: SE3, frame: PreparedFrame,
                           ids1, ang1,
                           pt_xyz, pt_desc, pt_normal, pt_min_dist,
                           pt_max_dist, pt_valid,
                           kf_feat_point, kf_valid, covis, kf_point_bits,
                           radius1_per_level, radius2_per_level,
                           inv_sigma2_per_level,
                           v0, prior_in, pre,
                           gravity, R_cb, t_cb,
                           cam: cameras.CameraParams,
                           scale: float = 1.2, n_levels: int = 8,
                           min_covis_w: int = 15,
                           local_cap: int = 4096,
                           pt_proj8: jnp.ndarray = None
                           ) -> TrackStepInertialResult:
    """The fused steady-state step for inertial sensors, last-FRAME variant:
    joint 30-dof optimization with the last frame's nav state under the
    running marginalization prior, Schur-marginalizing it out for the next
    prior (reference: PoseInertialOptimizationLastFrame + Marginalize,
    Optimizer.cc:983/1644). One dispatch + one packed fetch per frame; the
    emitted prior never leaves the device."""
    from ..optim import pose_opt
    res1, ref_kf, ids2, proj2, res2 = _track_step_visual_core(
        T_pred, frame, ids1, ang1, pt_xyz, pt_desc, pt_normal, pt_min_dist,
        pt_max_dist, pt_valid, kf_feat_point, kf_valid, covis, kf_point_bits,
        radius1_per_level, radius2_per_level, inv_sigma2_per_level, cam,
        scale, n_levels, min_covis_w, local_cap, pt_proj8=pt_proj8)
    T2, X, w, vmask = _refine_inputs(frame, res2, pt_xyz,
                                     inv_sigma2_per_level)
    ri = pose_opt.pose_inertial_optimization_last_frame(
        T2, v0, prior_in, pre, X, frame.xy_ud, w, vmask, cam,
        gravity=gravity, R_cb=R_cb, t_cb=t_cb)
    return TrackStepInertialResult(
        res1.n_inliers, ref_kf, res2.match_pt, res2.T_cw_R, res2.T_cw_t,
        ids2, proj2.visible, frame.feat.angle, frame.feat.valid,
        ri.n_inliers, ri.inlier, ri.v_w, ri.T_cw.R, ri.T_cw.t, ri.prior)


class TriangulationResult(NamedTuple):
    idx_b: jnp.ndarray     # [N] matched feature in KF b per feature of a
    ok: jnp.ndarray        # [N] accepted new point
    xyz: jnp.ndarray       # [N, 3] world coords


@partial(jax.jit, static_argnames=("focal",))
def search_and_triangulate_batch(T_a: SE3, T_bs: SE3,
                                 desc_a, xyn_a, level_a, free_a,
                                 desc_bs, xyn_bs, level_bs, free_bs,
                                 inv_sigma2_a, inv_sigma2_bs,
                                 focal: float = 460.0) -> TriangulationResult:
    """search_and_triangulate against B neighbor keyframes in ONE program:
    T_bs/desc_bs/... carry a leading [B] axis (pad unused slots with
    free_bs = all-False). Replaces one device dispatch per covisible
    neighbor (10-20 per keyframe event) with a single vmapped dispatch;
    the host still claims features in neighbor order afterwards."""
    def one(T_b, desc_b, xyn_b, level_b, free_b, inv_s2_b):
        return search_and_triangulate(
            T_a, T_b, desc_a, xyn_a, level_a, free_a,
            desc_b, xyn_b, level_b, free_b,
            inv_sigma2_a, inv_s2_b, focal=focal)
    return jax.vmap(one)(T_bs, desc_bs, xyn_bs, level_bs, free_bs,
                         inv_sigma2_bs)


@partial(jax.jit, static_argnames=("focal",))
def search_and_triangulate(T_a: SE3, T_b: SE3,
                           desc_a, xyn_a, level_a, free_a,
                           desc_b, xyn_b, level_b, free_b,
                           inv_sigma2_a, inv_sigma2_b,
                           focal: float = 460.0) -> TriangulationResult:
    """Epipolar-constrained matching + triangulation between two keyframes
    (reference: ORBmatcher::SearchForTriangulation, ORBmatcher.cc:1045 +
    LocalMapping::CreateNewMapPoints, LocalMapping.cc:506).

    free_*: features not yet associated to a map point.
    """
    # relative pose b <- a ... epipolar geometry in normalized coords
    T_ba = T_b.compose(T_a.inverse())
    # E maps a-rays to epipolar lines in b: l_b = E x_a, E = [t]x R
    from ..lie import so3 as _so3
    E = _so3.hat(T_ba.t) @ T_ba.R

    ones = jnp.ones_like(xyn_a[:, :1])
    Xa = jnp.concatenate([xyn_a, ones], axis=-1)
    Xb = jnp.concatenate([xyn_b, ones], axis=-1)
    l_b = Xa @ E.T                                        # [Na, 3]
    num = jnp.einsum("ai,bi->ab", l_b, Xb)                # [Na, Nb]
    d2 = num * num / jnp.maximum(
        (l_b[:, 0] ** 2 + l_b[:, 1] ** 2)[:, None], 1e-12)
    # pixel-scaled epipolar gate, per-level sigma of the b feature
    # (reference uses 3.84 * sigma2 of the matched keypoint's level)
    epi_ok = d2 * focal * focal < 3.84 / inv_sigma2_b[None, :]

    res = matching.match_nn(desc_a, free_a, desc_b, free_b,
                            max_dist=matching.TH_LOW, ratio=0.9, mutual=True,
                            extra_mask=epi_ok)
    xn_b_matched = xyn_b[res.idx]
    X, tri_ok = triangulate.triangulate(T_a, xyn_a, T_b, xn_b_matched)
    # acceptance: cheirality, parallax, reprojection both views
    za = T_a.apply(X)[:, 2]
    zb = T_b.apply(X)[:, 2]
    cosp = triangulate.parallax_cos(T_a, T_b, X)
    pa = T_a.apply(X)
    pb = T_b.apply(X)
    ra = pa[:, :2] / jnp.maximum(pa[:, 2:3], 1e-9) - xyn_a
    rb = pb[:, :2] / jnp.maximum(pb[:, 2:3], 1e-9) - xn_b_matched
    ea = jnp.sum(ra * ra, -1) * focal * focal * inv_sigma2_a
    eb = jnp.sum(rb * rb, -1) * focal * focal * inv_sigma2_b[res.idx]
    ok = (res.valid & tri_ok & (za > 0) & (zb > 0) & (cosp < 0.9998)
          & (ea < 5.991) & (eb < 5.991))
    return TriangulationResult(res.idx, ok, X)


def level_weights(n_levels: int = 8, scale: float = 1.2):
    """(radius_scale[l], inv_sigma2[l]) arrays used by matching/optimization."""
    sf = scale ** np.arange(n_levels, dtype=np.float32)
    return jnp.asarray(sf), jnp.asarray(1.0 / (sf * sf))
