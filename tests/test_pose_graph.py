"""Pose-graph tests: loop-closure drift correction over Sim3 and 4DoF."""
import numpy as np
import jax.numpy as jnp

from orb_slam3_detailed_comments_tpu.lie import SE3, Sim3, se3, sim3, so3
from orb_slam3_detailed_comments_tpu.optim import pose_graph


def make_loop_problem(rng, K=30, drift_rot=0.004, drift_t=0.01, drift_s=1.004):
    """Ground truth: KFs on a circle in the x-y plane (yaw about z, the
    4DoF-correctable axis); estimates accumulate odometry drift.
    Edges: consecutive odometry (from drifted estimates = consistent),
    plus one loop edge K-1 -> 0 with the TRUE relative transform."""
    Rg, tg = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        R_wc = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, a], jnp.float32)))
        c = np.array([4 * np.sin(a), 4 - 4 * np.cos(a), 0.0], np.float32)
        R_cw = R_wc.T
        Rg.append(R_cw)
        tg.append(-R_cw @ c)
    Rg, tg = np.stack(Rg), np.stack(tg)

    # drifted estimates: integrate true odometry corrupted by constant drift
    Re = [Rg[0]]
    te = [tg[0]]
    se_ = [1.0]
    dR = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, drift_rot], jnp.float32)))
    for k in range(1, K):
        m = Sim3(jnp.asarray(Rg[k] @ Rg[k - 1].T),
                 jnp.asarray(tg[k] - Rg[k] @ Rg[k - 1].T @ tg[k - 1]),
                 jnp.asarray(1.0))
        # corrupt: extra rotation + scale
        m = Sim3(jnp.asarray(dR) @ m.R, m.t * drift_s, m.s * drift_s)
        prev = Sim3(jnp.asarray(Re[-1]), jnp.asarray(te[-1]), jnp.asarray(se_[-1]))
        cur = m.compose(prev)
        Re.append(np.asarray(cur.R)); te.append(np.asarray(cur.t)); se_.append(float(cur.s))
    Re, te, se_ = np.stack(Re), np.stack(te), np.asarray(se_, np.float32)

    # edges: odometry measured from the DRIFTED estimates (self-consistent),
    # loop edge with the TRUE relative similarity
    ei, ej, eR, et, es = [], [], [], [], []
    for k in range(1, K):
        Si = Sim3(jnp.asarray(Re[k]), jnp.asarray(te[k]), jnp.asarray(se_[k]))
        Sj = Sim3(jnp.asarray(Re[k - 1]), jnp.asarray(te[k - 1]), jnp.asarray(se_[k - 1]))
        m = Si.compose(Sj.inverse())
        ei.append(k); ej.append(k - 1)
        eR.append(np.asarray(m.R)); et.append(np.asarray(m.t)); es.append(float(m.s))
    Si = Sim3(jnp.asarray(Rg[K - 1]), jnp.asarray(tg[K - 1]), jnp.asarray(1.0))
    Sj = Sim3(jnp.asarray(Rg[0]), jnp.asarray(tg[0]), jnp.asarray(1.0))
    m = Si.compose(Sj.inverse())
    ei.append(K - 1); ej.append(0)
    eR.append(np.asarray(m.R)); et.append(np.asarray(m.t)); es.append(1.0)

    fixed = np.zeros(K, bool); fixed[0] = True
    return dict(Rg=Rg, tg=tg, Re=Re, te=te, se=se_,
                ei=np.asarray(ei, np.int32), ej=np.asarray(ej, np.int32),
                eR=np.stack(eR).astype(np.float32), et=np.stack(et).astype(np.float32),
                es=np.asarray(es, np.float32), fixed=fixed)


def centers(R, t, s=None):
    c = -np.einsum("kij,ki->kj", np.transpose(R, (0, 2, 1)), t)
    if s is not None:
        c = c / s[:, None]
    return c


class TestSim3Graph:
    def test_corrects_loop_drift(self, rng):
        p = make_loop_problem(rng)
        K = len(p["Rg"])
        pre_err = np.linalg.norm(centers(p["Re"], p["te"], p["se"])
                                 - centers(p["Rg"], p["tg"]), axis=1)
        res = pose_graph.optimize_sim3_graph(
            jnp.asarray(p["Re"]), jnp.asarray(p["te"]), jnp.asarray(p["se"]),
            jnp.asarray(p["ei"]), jnp.asarray(p["ej"]),
            jnp.asarray(p["eR"]), jnp.asarray(p["et"]), jnp.asarray(p["es"]),
            jnp.ones(len(p["ei"]), jnp.float32) * 1.0,
            jnp.asarray(p["fixed"]), iters=20)
        post = centers(np.asarray(res.R), np.asarray(res.t), np.asarray(res.s))
        post_err = np.linalg.norm(post - centers(p["Rg"], p["tg"]), axis=1)
        assert pre_err.max() > 0.3          # drift was significant
        assert post_err.max() < 0.25 * pre_err.max(), (pre_err.max(), post_err.max())
        # scale drift removed
        assert abs(np.asarray(res.s)[-1] - 1.0) < 0.05

    def test_consistent_graph_unchanged(self, rng):
        p = make_loop_problem(rng, drift_rot=0.0, drift_t=0.0, drift_s=1.0)
        res = pose_graph.optimize_sim3_graph(
            jnp.asarray(p["Re"]), jnp.asarray(p["te"]), jnp.asarray(p["se"]),
            jnp.asarray(p["ei"]), jnp.asarray(p["ej"]),
            jnp.asarray(p["eR"]), jnp.asarray(p["et"]), jnp.asarray(p["es"]),
            jnp.ones(len(p["ei"]), jnp.float32), jnp.asarray(p["fixed"]), iters=5)
        np.testing.assert_allclose(np.asarray(res.t), p["te"], atol=2e-2)

    def test_fix_scale_holds_metric_scale(self, rng):
        """Metric (stereo/RGB-D) maps must close loops without touching
        scale (reference: OptimizeEssentialGraph bFixScale)."""
        p = make_loop_problem(rng, drift_s=1.0)   # pure rigid drift
        res = pose_graph.optimize_sim3_graph(
            jnp.asarray(p["Re"]), jnp.asarray(p["te"]), jnp.asarray(p["se"]),
            jnp.asarray(p["ei"]), jnp.asarray(p["ej"]),
            jnp.asarray(p["eR"]), jnp.asarray(p["et"]), jnp.asarray(p["es"]),
            jnp.ones(len(p["ei"]), jnp.float32),
            jnp.asarray(p["fixed"]), iters=20, fix_scale=True)
        # every scale EXACTLY at its input value
        np.testing.assert_array_equal(np.asarray(res.s), p["se"])
        pre_err = np.linalg.norm(centers(p["Re"], p["te"], p["se"])
                                 - centers(p["Rg"], p["tg"]), axis=1)
        post = centers(np.asarray(res.R), np.asarray(res.t), np.asarray(res.s))
        post_err = np.linalg.norm(post - centers(p["Rg"], p["tg"]), axis=1)
        assert post_err.max() < 0.3 * pre_err.max(), (pre_err.max(),
                                                      post_err.max())


class Test4DoFGraph:
    def test_corrects_yaw_drift(self, rng):
        p = make_loop_problem(rng, drift_s=1.0)   # no scale drift for 4dof
        res = pose_graph.optimize_4dof_graph(
            jnp.asarray(p["Re"]), jnp.asarray(p["te"]),
            jnp.asarray(p["ei"]), jnp.asarray(p["ej"]),
            jnp.asarray(p["eR"]), jnp.asarray(p["et"]),
            jnp.ones(len(p["ei"]), jnp.float32), jnp.asarray(p["fixed"]),
            iters=20)
        pre_err = np.linalg.norm(centers(p["Re"], p["te"])
                                 - centers(p["Rg"], p["tg"]), axis=1)
        post = centers(np.asarray(res.R), np.asarray(res.t))
        post_err = np.linalg.norm(post - centers(p["Rg"], p["tg"]), axis=1)
        assert post_err.max() < 0.35 * pre_err.max(), (pre_err.max(), post_err.max())
