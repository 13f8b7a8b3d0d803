"""Unit tests for lie/: exp/log round trips, Jacobians vs finite differences,
closed-form checks (SURVEY.md §4 test strategy: 'lie-group ops vs closed forms')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_detailed_comments_tpu.lie import SE3, Sim3, se3, sim3, so3


def random_rotvecs(rng, n=64, scale=2.0):
    w = rng.normal(size=(n, 3)) * scale
    # include edge cases: zero, tiny, near pi
    w[0] = 0.0
    w[1] = [1e-8, 0, 0]
    w[2] = [np.pi - 1e-4, 0, 0]
    w[3] = np.array([1.0, 1.0, 1.0]) / np.sqrt(3) * (np.pi - 1e-5)
    w[4] = [0, 0, np.pi - 1e-3]
    return jnp.asarray(w, dtype=jnp.float32)


class TestSO3:
    def test_exp_matches_rodrigues_scipy(self, rng):
        from scipy.spatial.transform import Rotation
        w = random_rotvecs(rng)
        R = np.asarray(so3.exp(w))
        R_ref = Rotation.from_rotvec(np.asarray(w)).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=2e-6)

    def test_log_exp_roundtrip(self, rng):
        w = random_rotvecs(rng, scale=1.0)
        w2 = so3.log(so3.exp(w))
        # Compare via rotations: near pi the angle itself is ill-conditioned
        # in f32 (arccos near -1), but the recovered rotation must match.
        R1, R2 = np.asarray(so3.exp(w)), np.asarray(so3.exp(w2))
        np.testing.assert_allclose(R2, R1, atol=2e-3)
        # Away from pi the vector itself must round-trip tightly.
        mask = np.linalg.norm(np.asarray(w), axis=-1) < 3.0
        np.testing.assert_allclose(np.asarray(w2)[mask], np.asarray(w)[mask], atol=5e-5)

    def test_exp_log_roundtrip_near_pi(self, rng):
        from scipy.spatial.transform import Rotation
        axes = rng.normal(size=(32, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = axes * (np.pi - 1e-4)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        w2 = np.asarray(so3.log(jnp.asarray(R)))
        R2 = Rotation.from_rotvec(w2).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_orthonormality(self, rng):
        w = random_rotvecs(rng)
        R = so3.exp(w)
        RtR = jnp.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(np.asarray(RtR), np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)

    def test_left_jacobian_finite_diff(self, rng):
        # Jl: exp(w + dw) ~= exp(Jl(w) dw) exp(w)
        w = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
        Jl = np.asarray(so3.left_jacobian(w))
        eps = 1e-3
        for k in range(3):
            dw = np.zeros(3, np.float32)
            dw[k] = eps
            Rp = np.asarray(so3.exp(w + dw))
            R0 = np.asarray(so3.exp(w))
            dphi = np.asarray(so3.log(jnp.asarray(Rp @ np.swapaxes(R0, -1, -2))))
            np.testing.assert_allclose(dphi / eps, Jl[:, :, k], atol=5e-3)

    def test_inv_left_jacobian(self, rng):
        w = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        J = so3.left_jacobian(w)
        Jinv = so3.inv_left_jacobian(w)
        prod = np.asarray(J @ Jinv)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4)

    def test_right_jacobian_imu_identity(self, rng):
        # Jr(w) = R(w)^T Jl(w)
        w = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        Jr = np.asarray(so3.right_jacobian(w))
        R = np.asarray(so3.exp(w))
        Jl = np.asarray(so3.left_jacobian(w))
        np.testing.assert_allclose(Jr, np.swapaxes(R, -1, -2) @ Jl, atol=1e-5)

    def test_quat_roundtrip(self, rng):
        w = random_rotvecs(rng)
        R = so3.exp(w)
        R2 = so3.from_quat(so3.to_quat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_hat_vee(self, rng):
        w = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(so3.vee(so3.hat(w))), np.asarray(w))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)), dtype=jnp.float32)
        xi2 = se3.log(se3.exp(xi))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
        T = se3.exp(xi)
        I = T.compose(T.inverse())
        np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), I.R.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        xi = jnp.asarray(rng.normal(size=(4, 6)), dtype=jnp.float32)
        T = se3.exp(xi)
        x = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
        y = T.apply(x)
        M = np.asarray(T.matrix())
        xh = np.concatenate([np.asarray(x), np.ones((4, 1), np.float32)], axis=-1)
        y_ref = np.einsum("bij,bj->bi", M, xh)[:, :3]
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)

    def test_params7_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
        T = se3.exp(xi)
        T2 = SE3.from_params7(T.params7())
        np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-5)

    def test_adjoint(self, rng):
        # T exp(xi) T^-1 == exp(Ad_T xi)
        xiT = jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32)
        xi = jnp.asarray(0.1 * rng.normal(size=(6,)), dtype=jnp.float32)
        T = se3.exp(xiT)
        lhs = T.compose(se3.exp(xi)).compose(T.inverse())
        Ad = se3.adjoint(T)
        rhs = se3.exp(Ad @ xi)
        np.testing.assert_allclose(np.asarray(lhs.R), np.asarray(rhs.R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lhs.t), np.asarray(rhs.t), atol=1e-4)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 7)) * 0.8, dtype=jnp.float32)
        xi2 = sim3.log(sim3.exp(xi))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)

    def test_zero_scale_matches_se3(self, rng):
        xi6 = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1), jnp.float32)], axis=-1)
        S = sim3.exp(xi7)
        T = se3.exp(xi6)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(T.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(T.t), atol=1e-4)
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
        S = sim3.exp(xi)
        I = S.compose(S.inverse())
        np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), I.R.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)

    def test_apply(self, rng):
        xi = jnp.asarray(rng.normal(size=(7,)) * 0.5, dtype=jnp.float32)
        S = sim3.exp(xi)
        x = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        y = np.asarray(S.apply(x))
        y_ref = float(S.s) * np.asarray(x) @ np.asarray(S.R).T + np.asarray(S.t)
        np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_jit_and_vmap_compatible():
    xi = jnp.ones((4, 6), jnp.float32) * 0.1
    f = jax.jit(lambda x: se3.log(se3.exp(x)))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-5)
    g = jax.vmap(lambda x: so3.exp(x))
    assert g(xi[:, :3]).shape == (4, 3, 3)
