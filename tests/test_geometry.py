"""Unit tests for the Lie-group geometry core (SO3/SE3/Sim3/alignment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqrtlm_slam_tpu.geometry import SE3, Sim3, align, se3, sim3, so3

KEY = jax.random.PRNGKey(0)


def random_rotvec(key, batch=(), scale=1.0):
    return jax.random.normal(key, batch + (3,)) * scale


class TestSO3:
    def test_exp_log_roundtrip(self):
        # log returns the canonical representative (|w| <= pi), so compare
        # the recovered *rotation*, not the tangent, for arbitrary w.
        w = random_rotvec(KEY, (64,), scale=1.5)
        R = so3.exp(w)
        R2 = so3.exp(so3.log(R))
        # f32 log loses precision as theta -> pi (theta / 2 sin(theta) blowup);
        # 5e-4 covers the worst case while still catching branch bugs.
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=5e-4)

    def test_exp_log_roundtrip_small_norm(self):
        w = random_rotvec(KEY, (64,), scale=0.5)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1.0)  # |w|<=1
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=2e-5)

    def test_exp_is_rotation(self):
        w = random_rotvec(KEY, (16,), scale=2.0)
        R = so3.exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        np.testing.assert_allclose(np.asarray(so3.log(R)), np.asarray(w), atol=1e-7)

    def test_near_pi(self):
        axis = jnp.array([0.6, -0.64, 0.48])
        axis = axis / jnp.linalg.norm(axis)
        for theta in [np.pi - 1e-4, np.pi - 1e-2, 3.0]:
            w = axis * theta
            wr = so3.log(so3.exp(w))
            np.testing.assert_allclose(np.asarray(wr), np.asarray(w), atol=1e-3)

    def test_quat_roundtrip(self):
        w = random_rotvec(KEY, (32,), scale=2.5)
        R = so3.exp(w)
        q = so3.mat_to_quat(R)
        R2 = so3.quat_to_mat(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_left_jacobian_inverse(self):
        w = random_rotvec(KEY, (8,), scale=1.0)
        J = so3.left_jacobian(w)
        Jinv = so3.left_jacobian_inv(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(np.asarray(J @ Jinv), np.asarray(eye), atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        # Keep |phi| < pi so the tangent roundtrip is exact (canonical branch).
        xi = jax.random.normal(KEY, (32, 6)) * jnp.array([1, 1, 1, 0.5, 0.5, 0.5])
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=2e-5)

    def test_compose_inverse(self):
        k1, k2 = jax.random.split(KEY)
        A = se3.exp(jax.random.normal(k1, (8, 6)))
        B = se3.exp(jax.random.normal(k2, (8, 6)))
        AB = se3.compose(A, B)
        I = se3.compose(AB, se3.inverse(AB))
        np.testing.assert_allclose(
            np.asarray(I.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)

    def test_act_matches_matrix(self):
        k1, k2 = jax.random.split(KEY)
        T = se3.exp(jax.random.normal(k1, (6,)))
        x = jax.random.normal(k2, (10, 3))
        y = se3.act(T, x)
        y2 = (np.asarray(T.R) @ np.asarray(x).T).T + np.asarray(T.t)
        np.testing.assert_allclose(np.asarray(y), y2, atol=1e-5)

    def test_retract_delta_roundtrip(self):
        k1, k2 = jax.random.split(KEY)
        T = se3.exp(jax.random.normal(k1, (4, 6)))
        d = jax.random.normal(k2, (4, 6)) * 0.1
        T2 = se3.retract(T, d)
        d2 = se3.local_delta(T2, T)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-5)

    def test_quat_trans_pack(self):
        T = se3.exp(jax.random.normal(KEY, (5, 6)))
        v = se3.to_quat_trans(T)
        T2 = se3.from_quat_trans(v)
        np.testing.assert_allclose(np.asarray(T.R), np.asarray(T2.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T.t), np.asarray(T2.t), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 7)) * jnp.array([1, 1, 1, 0.5, 0.5, 0.5, 0.3])
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=5e-5)

    def test_zero_is_identity(self):
        S = sim3.exp(jnp.zeros((7,)))
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.t), 0.0, atol=1e-6)

    def test_compose_inverse(self):
        k1, k2 = jax.random.split(KEY)
        A = sim3.exp(jax.random.normal(k1, (8, 7)) * 0.5)
        B = sim3.exp(jax.random.normal(k2, (8, 7)) * 0.5)
        AB = sim3.compose(A, B)
        I = sim3.compose(AB, sim3.inverse(AB))
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-4)

    def test_action_composition(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        A = sim3.exp(jax.random.normal(k1, (7,)) * 0.5)
        B = sim3.exp(jax.random.normal(k2, (7,)) * 0.5)
        x = jax.random.normal(k3, (3,))
        y1 = sim3.act(A, sim3.act(B, x))
        y2 = sim3.act(sim3.compose(A, B), x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


class TestAlign:
    def _make_cloud(self, key, n=50):
        return jax.random.normal(key, (n, 3)) * 2.0

    def test_umeyama_recovers_sim3(self):
        k1, k2 = jax.random.split(KEY)
        src = self._make_cloud(k1)
        S_true = sim3.exp(jax.random.normal(k2, (7,)) * jnp.array([1, 1, 1, 1, 1, 1, 0.4]))
        dst = sim3.act(S_true, src)
        S_est = align.umeyama(src, dst, with_scale=True)
        np.testing.assert_allclose(np.asarray(S_est.s), np.asarray(S_true.s), atol=1e-4)
        np.testing.assert_allclose(np.asarray(S_est.R), np.asarray(S_true.R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(S_est.t), np.asarray(S_true.t), atol=1e-3)

    def test_se3_horn_fixed_scale(self):
        k1, k2 = jax.random.split(KEY)
        src = self._make_cloud(k1)
        T_true = se3.exp(jax.random.normal(k2, (6,)))
        dst = se3.act(T_true, src)
        T_est = align.se3_horn(src, dst)
        np.testing.assert_allclose(np.asarray(T_est.R), np.asarray(T_true.R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(T_est.t), np.asarray(T_true.t), atol=1e-4)

    def test_umeyama_batched(self):
        keys = jax.random.split(KEY, 4)
        src = jnp.stack([self._make_cloud(k) for k in keys])  # (4, 50, 3)
        T = se3.exp(jax.random.normal(KEY, (4, 6)))
        dst = se3.act(T, src)
        S = align.umeyama(src, dst, with_scale=False)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(T.R), atol=1e-4)

    def test_umeyama_weighted_ignores_outliers(self):
        k1, k2 = jax.random.split(KEY)
        src = self._make_cloud(k1)
        T_true = se3.exp(jax.random.normal(k2, (6,)))
        dst = se3.act(T_true, src)
        dst = dst.at[0].set(jnp.array([100.0, -50.0, 30.0]))  # gross outlier
        w = jnp.ones(src.shape[0]).at[0].set(0.0)
        T_est = align.se3_horn(src, dst, weights=w)
        np.testing.assert_allclose(np.asarray(T_est.t), np.asarray(T_true.t), atol=1e-4)

    def test_ate_rmse_zero_for_aligned(self):
        traj = jnp.cumsum(jax.random.normal(KEY, (100, 3)) * 0.1, axis=0)
        S = sim3.exp(jnp.array([1.0, 2.0, -1.0, 0.1, 0.2, 0.3, 0.2]))
        est = sim3.act(S, traj)
        rmse, _ = align.ate_rmse(est, traj, align_scale=True)
        assert float(rmse) < 1e-4
