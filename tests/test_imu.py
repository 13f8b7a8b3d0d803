"""IMU tests: preintegration vs numerical integration, bias Jacobians vs
finite differences, dead-reckoning prediction, inertial-only init recovery
(SURVEY.md §4: 'preintegration vs numerical integration')."""
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_tpu.imu import factors, inertial_init
from orb_slam3_detailed_comments_tpu.imu import preintegration as pre
from orb_slam3_detailed_comments_tpu.lie import so3

CAL = pre.ImuCalib.default()


def simulate_imu(rng, n=100, dt=0.005, g=np.array([0, 0, -9.81])):
    """Ground-truth body trajectory + perfect IMU measurements.

    Body angular rate and world acceleration are smooth sinusoids.
    Returns dict with R_wb [n+1], v_w, p_w and measurements acc/gyro [n].
    """
    w_freq = rng.uniform(0.5, 1.5, 3)
    a_freq = rng.uniform(0.5, 1.5, 3)
    R = np.eye(3)
    v = rng.normal(0, 0.3, 3)
    p = np.zeros(3)
    Rs, vs, ps = [R.copy()], [v.copy()], [p.copy()]
    accs, gyros = [], []
    for k in range(n):
        t = k * dt
        w_b = 0.8 * np.sin(w_freq * t * 2 * np.pi + [0, 1, 2])
        a_w = 1.5 * np.sin(a_freq * t * 2 * np.pi + [1, 2, 0])
        # measured specific force in body frame
        a_b = R.T @ (a_w - g)
        accs.append(a_b)
        gyros.append(w_b)
        # integrate (first-order, matching preintegration's model exactly)
        p = p + v * dt + 0.5 * (R @ a_b + g) * dt * dt
        v = v + (R @ a_b + g) * dt
        R = R @ np.asarray(so3.exp(jnp.asarray(w_b * dt, jnp.float32)))
        Rs.append(R.copy()); vs.append(v.copy()); ps.append(p.copy())
    return dict(R=np.stack(Rs), v=np.stack(vs), p=np.stack(ps),
                acc=np.stack(accs).astype(np.float32),
                gyro=np.stack(gyros).astype(np.float32),
                dt=np.full(n, dt, np.float32), g=g)


class TestPreintegration:
    def test_matches_numerical_integration(self, rng):
        sim = simulate_imu(rng)
        P = pre.integrate(jnp.asarray(sim["acc"]), jnp.asarray(sim["gyro"]),
                          jnp.asarray(sim["dt"]), CAL)
        n = len(sim["acc"])
        T = n * sim["dt"][0]
        g = sim["g"]
        # invert the preintegration relations to predict final state
        R_end = sim["R"][0] @ np.asarray(P.dR)
        v_end = sim["v"][0] + g * T + sim["R"][0] @ np.asarray(P.dV)
        p_end = (sim["p"][0] + sim["v"][0] * T + 0.5 * g * T * T
                 + sim["R"][0] @ np.asarray(P.dP))
        np.testing.assert_allclose(R_end, sim["R"][-1], atol=1e-4)
        np.testing.assert_allclose(v_end, sim["v"][-1], atol=1e-3)
        np.testing.assert_allclose(p_end, sim["p"][-1], atol=1e-3)

    def test_bias_jacobians_finite_diff(self, rng):
        sim = simulate_imu(rng, n=40)
        acc, gyro, dts = map(jnp.asarray, (sim["acc"], sim["gyro"], sim["dt"]))
        P0 = pre.integrate(acc, gyro, dts, CAL)
        eps = 1e-3
        for k in range(3):
            db = np.zeros(3, np.float32); db[k] = eps
            Pg = pre.integrate(acc, gyro, dts, CAL, bg0=jnp.asarray(db))
            # dR: Log(dR0^T dR_perturbed) ~= JRg @ (-db)... sign: bias0 shifts
            dphi = np.asarray(so3.log(jnp.asarray(
                np.asarray(P0.dR).T @ np.asarray(Pg.dR))))
            np.testing.assert_allclose(dphi / eps, np.asarray(P0.JRg)[:, k],
                                       atol=2e-2)
            dV = (np.asarray(Pg.dV) - np.asarray(P0.dV)) / eps
            np.testing.assert_allclose(dV, np.asarray(P0.JVg)[:, k], atol=2e-2)
            dP = (np.asarray(Pg.dP) - np.asarray(P0.dP)) / eps
            np.testing.assert_allclose(dP, np.asarray(P0.JPg)[:, k], atol=2e-2)
            Pa = pre.integrate(acc, gyro, dts, CAL, ba0=jnp.asarray(db))
            dVa = (np.asarray(Pa.dV) - np.asarray(P0.dV)) / eps
            np.testing.assert_allclose(dVa, np.asarray(P0.JVa)[:, k], atol=2e-2)
            dPa = (np.asarray(Pa.dP) - np.asarray(P0.dP)) / eps
            np.testing.assert_allclose(dPa, np.asarray(P0.JPa)[:, k], atol=2e-2)

    def test_bias_corrected_getters(self, rng):
        sim = simulate_imu(rng, n=40)
        acc, gyro, dts = map(jnp.asarray, (sim["acc"], sim["gyro"], sim["dt"]))
        bg = jnp.asarray([0.01, -0.02, 0.015])
        P0 = pre.integrate(acc, gyro, dts, CAL)
        Pb = pre.integrate(acc, gyro, dts, CAL, bg0=bg)
        # first-order corrected dR from P0 should match reintegration at bg
        dR_corr = np.asarray(pre.delta_rotation(P0, bg))
        np.testing.assert_allclose(dR_corr, np.asarray(Pb.dR), atol=2e-3)

    def test_covariance_psd_and_growth(self, rng):
        sim = simulate_imu(rng, n=60)
        P = pre.integrate(jnp.asarray(sim["acc"]), jnp.asarray(sim["gyro"]),
                          jnp.asarray(sim["dt"]), CAL)
        C = np.asarray(P.C)
        ev = np.linalg.eigvalsh(C[0:9, 0:9])
        assert ev.min() > -1e-12
        assert np.trace(C[0:9, 0:9]) > 0

    def test_predict_state(self, rng):
        sim = simulate_imu(rng)
        P = pre.integrate(jnp.asarray(sim["acc"]), jnp.asarray(sim["gyro"]),
                          jnp.asarray(sim["dt"]), CAL)
        R2, v2, p2 = pre.predict_state(
            jnp.asarray(sim["R"][0]), jnp.asarray(sim["v"][0]),
            jnp.asarray(sim["p"][0]), P, jnp.zeros(3), jnp.zeros(3),
            gravity=jnp.asarray(sim["g"], jnp.float32))
        np.testing.assert_allclose(np.asarray(p2), sim["p"][-1], atol=2e-3)

    def test_merge(self, rng):
        sim = simulate_imu(rng, n=80)
        acc, gyro, dts = map(jnp.asarray, (sim["acc"], sim["gyro"], sim["dt"]))
        Pfull = pre.integrate(acc, gyro, dts, CAL)
        Pa = pre.integrate(acc[:40], gyro[:40], dts[:40], CAL)
        Pb = pre.integrate(acc[40:], gyro[40:], dts[40:], CAL)
        Pm = pre.merge(Pa, Pb)
        np.testing.assert_allclose(np.asarray(Pm.dR), np.asarray(Pfull.dR), atol=1e-4)
        np.testing.assert_allclose(np.asarray(Pm.dV), np.asarray(Pfull.dV), atol=1e-3)
        np.testing.assert_allclose(np.asarray(Pm.dP), np.asarray(Pfull.dP), atol=1e-3)


class TestInertialResidual:
    def test_zero_at_ground_truth(self, rng):
        sim = simulate_imu(rng, n=50)
        P = pre.integrate(jnp.asarray(sim["acc"]), jnp.asarray(sim["gyro"]),
                          jnp.asarray(sim["dt"]), CAL)
        r = factors.inertial_residual(
            jnp.asarray(sim["R"][0]), jnp.asarray(sim["p"][0]), jnp.asarray(sim["v"][0]),
            jnp.asarray(sim["R"][-1]), jnp.asarray(sim["p"][-1]), jnp.asarray(sim["v"][-1]),
            jnp.zeros(3), jnp.zeros(3), P, gravity=jnp.asarray(sim["g"], jnp.float32))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=5e-3)


class TestInertialInit:
    def test_recovers_scale_gravity_bias(self, rng):
        # keyframes every 25 samples over a 2.5 s trajectory
        sim = simulate_imu(rng, n=500, dt=0.005)
        kf_idx = np.arange(0, 501, 25)
        true_bg = np.array([0.004, -0.003, 0.005], np.float32)
        acc = sim["acc"]
        gyro = sim["gyro"] + true_bg  # measurements corrupted by bias
        pres = []
        for a, b in zip(kf_idx[:-1], kf_idx[1:]):
            pres.append(pre.integrate(
                jnp.asarray(acc[a:b]), jnp.asarray(gyro[a:b]),
                jnp.asarray(sim["dt"][a:b]), CAL))
        pres = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
        # visual poses: true R, positions scaled by 1/s_true, gravity rotated
        s_true = 2.5
        R_wb = sim["R"][kf_idx]
        p_vis = sim["p"][kf_idx] / s_true
        R_wg0 = inertial_init.initial_gravity_estimate(jnp.asarray(R_wb), pres)
        res = inertial_init.inertial_optimization(
            jnp.asarray(R_wb, jnp.float32), jnp.asarray(p_vis, jnp.float32),
            pres, R_wg0, prior_gyro=1e2, prior_acc=1e6, iters=25)
        # scale within 5% (reference Changelog claims <5% in 2 s)
        assert abs(float(res.scale) - s_true) / s_true < 0.05, float(res.scale)
        # gravity direction within 2 degrees (true gravity is -z already)
        g_est = np.asarray(res.R_wg) @ np.array([0, 0, -9.81])
        cos = g_est @ sim["g"] / (np.linalg.norm(g_est) * 9.81)
        assert cos > np.cos(np.radians(2.0))
        # gyro bias recovered
        np.testing.assert_allclose(np.asarray(res.bg), true_bg, atol=2e-3)
        # velocities close to ground truth (scaled world)
        v_err = np.linalg.norm(np.asarray(res.velocities) - sim["v"][kf_idx], axis=1)
        assert np.median(v_err) < 0.1


class TestImuCalibrationTooling:
    """scripts/process_imu.py: stream sync + Allan-deviation noise estimation
    (reference: Examples/Calibration/python_scripts/process_imu.py)."""

    def test_sync_interpolates_acc_onto_gyro(self, rng):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "process_imu", "scripts/process_imu.py")
        pi = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pi)
        ta = np.arange(0.0, 1.0, 0.01)            # 100 Hz acc
        tg = np.arange(0.005, 1.2, 0.005)         # 200 Hz gyro, longer
        acc = np.stack([ta, np.sin(ta), np.cos(ta), ta * 2], 1)
        gyro = np.stack([tg, tg * 0 + 1, tg * 3, -tg], 1)
        out = pi.sync_acc_to_gyro(acc, gyro)
        assert (out[:, 0] >= ta[0]).all() and (out[:, 0] <= ta[-1]).all()
        np.testing.assert_allclose(out[:, 1], 1.0)              # gyro copied
        np.testing.assert_allclose(out[:, 4], np.sin(out[:, 0]), atol=1e-4)
        np.testing.assert_allclose(out[:, 6], out[:, 0] * 2, atol=1e-9)

    def test_allan_recovers_noise_density(self, rng):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "process_imu", "scripts/process_imu.py")
        pi = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pi)
        dt, n = 0.005, 120_000                    # 10 min at 200 Hz
        sigma_n, sigma_w = 1.7e-3, 2e-5           # EuRoC-like gyro values
        white = rng.normal(0, sigma_n / np.sqrt(dt), (n, 3))
        walk = np.cumsum(rng.normal(0, sigma_w * np.sqrt(dt), (n, 3)), 0)
        est_n, est_w = pi.estimate_noise_params(white + walk, dt)
        np.testing.assert_allclose(est_n, sigma_n, rtol=0.1)
        # the walk needs hours of data for a tight estimate; from 10 min
        # assert the right order of magnitude (axis-averaged)
        assert sigma_w / 3 < est_w.mean() < sigma_w * 3
