"""Map-merge parity tests: the merge essential graph and the
visual-inertial weld refinement (MergeInertialBA).

Covers the reference's merge tail beyond the weld window: the merge
overload of Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:5667,
driven from LoopClosing::MergeLocal at LoopClosing.cc:2234) must spread a
weld-window refinement through the REST of the absorbed map, and
Optimizer::MergeInertialBA (src/Optimizer.cc:6017, driven from
MergeLocal/MergeLocal2 at LoopClosing.cc:2127,2618) must refine the weld
on inertial merges with full 15-dof states.
"""
import numpy as np
import jax.numpy as jnp

from orb_slam3_detailed_comments_tpu.lie import so3
from orb_slam3_detailed_comments_tpu.pipeline.loop_closing import (
    run_merge_essential_graph)
from orb_slam3_detailed_comments_tpu.pipeline.inertial import (
    run_merge_inertial_ba)

from synthetic import CAM
from test_imu import CAL
from test_full_inertial_ba import (build_inertial_map,
                                   chain_preintegration_residuals)


def _pose_err(m, k, R_true, t_true):
    """Camera-center distance + rotation angle of keyframe k vs truth."""
    c_est = -m.kf_R[k].T @ m.kf_t[k]
    c_true = -R_true.T @ t_true
    dR = m.kf_R[k] @ R_true.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return np.linalg.norm(c_est - c_true), ang


class TestMergeEssentialGraph:
    def test_weld_refinement_propagates_to_far_end(self, rng):
        """Simulated merge aftermath: the whole absorbed map sits at a
        rigidly-perturbed pose (internally consistent — a weld with a
        slightly wrong Sim3), the weld BA snapped a window of keyframes
        back to truth, and the essential graph must drag the FAR END of
        the absorbed map to truth too (reference: LoopClosing.cc:2234)."""
        m, truth = build_inertial_map(rng, n_kf=24, pose_noise=0.0,
                                      vel_noise=0.0)
        m.imu_initialized = False   # visual map: Sim3 graph path
        kf_ids = [int(k) for k in truth["kf_ids"]]
        R_true = {k: m.kf_R[k].copy() for k in kf_ids}
        t_true = {k: m.kf_t[k].copy() for k in kf_ids}
        pt_true = m.pt_xyz.copy()

        # rigid world-frame perturbation of every KF + point (the weld err):
        # T_cw' = T_cw ∘ D^-1 with D = (R_d, t_d), points x' = D x
        R_d = np.asarray(so3.exp(jnp.asarray([0.02, -0.03, 0.08],
                                             jnp.float32)))
        t_d = np.array([0.25, -0.15, 0.1], np.float32)
        # world re-labeling x' = R_d x + t_d: R' = R Rd^T, t' = t - R' td
        for k in kf_ids:
            m.kf_R[k] = R_true[k] @ R_d.T
            m.kf_t[k] = t_true[k] - m.kf_R[k] @ t_d
        pv = m.pt_valid
        m.pt_xyz[pv] = m.pt_xyz[pv] @ R_d.T + t_d
        # anchor points to keyframes OUTSIDE the weld window (the fixture
        # pins every ref to KF 0; real merged-map points reference the
        # absorbed map's own keyframes, which the graph moves)
        pts = np.where(pv)[0]
        m.pt_ref_kf[pts] = rng.choice(kf_ids[6:], size=len(pts))

        # snapshot = post-weld, pre-refinement geometry
        snap_R, snap_t = m.kf_R.copy(), m.kf_t.copy()

        # "weld BA": the first 6 keyframes snap to truth
        window = kf_ids[:6]
        for k in window:
            m.kf_R[k] = R_true[k]
            m.kf_t[k] = t_true[k]

        far = kf_ids[-1]
        err_before, ang_before = _pose_err(m, far, R_true[far], t_true[far])
        assert err_before > 0.15, "perturbation too small to be a test"

        run_merge_essential_graph(m, snap_R, snap_t, set(window),
                                  inertial=False, fix_scale=False)

        # the far end must land near truth (the correction propagated)
        err_after, ang_after = _pose_err(m, far, R_true[far], t_true[far])
        assert err_after < 0.15 * err_before, (err_before, err_after)
        assert ang_after < 0.02, ang_after
        # every keyframe, not just the far end
        for k in kf_ids:
            e, a = _pose_err(m, k, R_true[k], t_true[k])
            assert e < 0.05, (k, e)
        # points rode their reference keyframes back
        pt_err = np.linalg.norm(m.pt_xyz[pv] - pt_true[pv], axis=1)
        assert np.median(pt_err) < 0.05, np.median(pt_err)

    def test_noop_when_nothing_moved(self, rng):
        """If the weld BA did not move the window, the graph's residuals
        are zero and every pose stays put."""
        m, truth = build_inertial_map(rng, n_kf=10, pose_noise=0.0,
                                      vel_noise=0.0)
        m.imu_initialized = False
        kf_ids = [int(k) for k in truth["kf_ids"]]
        snap_R, snap_t = m.kf_R.copy(), m.kf_t.copy()
        R_bef, t_bef = m.kf_R.copy(), m.kf_t.copy()
        run_merge_essential_graph(m, snap_R, snap_t, set(kf_ids[:4]))
        np.testing.assert_allclose(m.kf_R, R_bef, atol=1e-4)
        np.testing.assert_allclose(m.kf_t, t_bef, atol=1e-4)

    def test_inertial_4dof_path_rotates_velocities(self, rng):
        """On an inertial (gravity-aligned) merged map the graph is 4DoF:
        a yaw-only weld error is corrected and keyframe velocities rotate
        with their pose correction (reference: OptimizeEssentialGraph4DoF
        + the Rcor velocity updates)."""
        m, truth = build_inertial_map(rng, n_kf=16, pose_noise=0.0,
                                      vel_noise=0.0)
        kf_ids = [int(k) for k in truth["kf_ids"]]
        R_true = {k: m.kf_R[k].copy() for k in kf_ids}
        t_true = {k: m.kf_t[k].copy() for k in kf_ids}
        v_true = {k: m.kf_vel[k].copy() for k in kf_ids}

        yaw = 0.1
        R_d = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, yaw], jnp.float32)))
        t_d = np.array([0.2, -0.1, 0.0], np.float32)
        for k in kf_ids:
            m.kf_R[k] = R_true[k] @ R_d.T
            m.kf_t[k] = t_true[k] - m.kf_R[k] @ t_d
            m.kf_vel[k] = R_d @ v_true[k]
        pv = m.pt_valid
        m.pt_xyz[pv] = m.pt_xyz[pv] @ R_d.T + t_d

        snap_R, snap_t = m.kf_R.copy(), m.kf_t.copy()
        window = kf_ids[:5]
        for k in window:
            m.kf_R[k] = R_true[k]
            m.kf_t[k] = t_true[k]
            m.kf_vel[k] = v_true[k]

        run_merge_essential_graph(m, snap_R, snap_t, set(window),
                                  inertial=True, fix_scale=True)

        far = kf_ids[-1]
        err, ang = _pose_err(m, far, R_true[far], t_true[far])
        assert err < 0.04, err
        assert ang < 0.02, ang
        # velocity rotated back with the yaw correction
        v_err = np.linalg.norm(m.kf_vel[far] - v_true[far])
        assert v_err < 0.05 * max(np.linalg.norm(v_true[far]), 1.0), v_err


class TestMergeInertialBA:
    def _severed_map(self, rng, n_kf=16, cut=8, **kw):
        """An inertial map whose prev-chain is severed at `cut` — the shape
        of a freshly merged map: two internally-connected temporal chains
        with no preintegration across the weld junction."""
        m, truth = build_inertial_map(rng, n_kf=n_kf, **kw)
        kf_ids = [int(k) for k in truth["kf_ids"]]
        j = kf_ids[cut]
        m.kf_prev[j] = -1
        m.kf_pre_dT[j] = 0.0
        return m, truth, kf_ids

    def test_refines_weld_windows(self, rng):
        """run_merge_inertial_ba over the two sub-chains must shrink the
        preintegration residuals (pose/velocity/bias consistency) on both
        sides of the junction (reference: Optimizer::MergeInertialBA)."""
        m, truth, kf_ids = self._severed_map(rng, pose_noise=0.03,
                                             vel_noise=0.3)
        k = kf_ids[-1]        # "current" keyframe: end of the active chain
        c = kf_ids[4]         # welded match inside the absorbed chain

        def window_residuals(win):
            """Worst preintegration residual over edges INSIDE win (edges
            touching keyframes outside the weld windows stay unoptimized,
            exactly like the reference's local problem)."""
            from orb_slam3_detailed_comments_tpu.imu import factors
            import jax
            g = jnp.asarray(np.array([0.0, 0.0, -9.81], np.float32))
            worst = 0.0
            for a, b in zip(kf_ids[:-1], kf_ids[1:]):
                if (a not in win or b not in win or m.kf_prev[b] != a
                        or m.kf_pre_dT[b] <= 0):
                    continue
                P = jax.tree.map(lambda x: x[0], m.get_kf_preintegration([b]))
                r = factors.inertial_residual(
                    jnp.asarray(m.kf_R[a].T),
                    jnp.asarray(-m.kf_R[a].T @ m.kf_t[a]),
                    jnp.asarray(m.kf_vel[a]),
                    jnp.asarray(m.kf_R[b].T),
                    jnp.asarray(-m.kf_R[b].T @ m.kf_t[b]),
                    jnp.asarray(m.kf_vel[b]),
                    jnp.asarray(m.kf_bg[a]), jnp.asarray(m.kf_ba[a]), P, g)
                worst = max(worst, float(jnp.abs(r).max()))
            return worst

        res0_all = chain_preintegration_residuals(m)
        out = run_merge_inertial_ba(m, CAM, k, c, CAL)
        assert out is not None
        # both windows participated
        assert any(x in out for x in kf_ids[9:])
        assert any(x in out for x in kf_ids[:8])
        res1 = window_residuals(set(out))
        assert res1 < 0.5 * res0_all, (res0_all, res1)
        assert res1 < 0.1, res1

    def test_disjoint_windows_guard(self, rng):
        """Overlapping current/merge windows (no junction between them)
        fall back to None instead of double-optimizing keyframes."""
        m, truth = build_inertial_map(rng, n_kf=10)
        kf_ids = [int(k) for k in truth["kf_ids"]]
        out = run_merge_inertial_ba(m, CAM, kf_ids[-1], kf_ids[-3], CAL)
        assert out is None
