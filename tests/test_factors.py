"""Analytic Jacobians vs forward-mode autodiff under the retraction."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.factors import lidar, pose_graph, reprojection
from sqrtlm_slam_tpu.geometry import se3, sim3

KEY = jax.random.PRNGKey(7)
CAM = reprojection.Camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22, bf=386.1448)


def _random_pose(key):
    return se3.exp(jax.random.normal(key, (6,)) * 0.3)


def _points_in_front(key, n=20):
    """World points that project in front of the camera for small poses."""
    x = jax.random.normal(key, (n, 3)) * jnp.array([3.0, 2.0, 2.0]) + jnp.array(
        [0.0, 0.0, 12.0]
    )
    return x


class TestReprojection:
    def test_mono_pose_jacobian(self):
        k1, k2 = jax.random.split(KEY)
        T = _random_pose(k1)
        X = _points_in_front(k2)
        uv_obs = CAM.project(se3.act(T, X)) + 0.5
        _, J_pose, J_point = reprojection.mono_residual_jac(T, X, uv_obs, CAM)

        def res_wrt_delta(d):
            r, _, _ = reprojection.mono_residual_jac(se3.retract(T, d), X, uv_obs, CAM)
            return r

        J_num = jax.jacfwd(res_wrt_delta)(jnp.zeros(6))  # (N, 2, 6)
        np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_num), atol=1e-3, rtol=1e-3)

        def res_wrt_point(Xp):
            r, _, _ = reprojection.mono_residual_jac(T, Xp, uv_obs, CAM)
            return r

        J_num_pt = jax.jacfwd(res_wrt_point)(X)  # (N,2,N,3) block-diagonal
        idx = jnp.arange(X.shape[0])
        J_num_pt = J_num_pt[idx, :, idx, :]
        np.testing.assert_allclose(np.asarray(J_point), np.asarray(J_num_pt), atol=1e-3, rtol=1e-3)

    def test_stereo_jacobian(self):
        k1, k2 = jax.random.split(KEY, 2)
        T = _random_pose(k1)
        X = _points_in_front(k2)
        x_c = se3.act(T, X)
        uvr_obs = jnp.concatenate(
            [CAM.project(x_c), (CAM.project(x_c)[..., :1] - CAM.bf / x_c[..., 2:])],
            axis=-1,
        )
        r, J_pose, J_point = reprojection.stereo_residual_jac(T, X, uvr_obs, CAM)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)

        def res(d):
            rr, _, _ = reprojection.stereo_residual_jac(se3.retract(T, d), X, uvr_obs, CAM)
            return rr

        J_num = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_num), atol=1e-3, rtol=1e-3)

    def test_backproject_roundtrip(self):
        uv = jnp.array([[300.0, 200.0], [100.0, 50.0]])
        depth = jnp.array([5.0, 11.0])
        x = CAM.backproject(uv, depth)
        np.testing.assert_allclose(np.asarray(CAM.project(x)), np.asarray(uv), atol=1e-4)


class TestLidarFactors:
    def test_plane_jacobian(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        T = _random_pose(k1)
        p_s = jax.random.normal(k2, (15, 3)) * 5.0
        n = jax.random.normal(k3, (15, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        d = jax.random.normal(k1, (15,))
        _, J = lidar.plane_residual_jac(T, p_s, n, d)

        def res(delta):
            r, _ = lidar.plane_residual_jac(se3.retract(T, delta), p_s, n, d)
            return r

        J_num = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_num), atol=1e-3, rtol=1e-3)

    def test_point_jacobian(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        T = _random_pose(k1)
        p_s = jax.random.normal(k2, (15, 3)) * 5.0
        q_w = jax.random.normal(k3, (15, 3)) * 5.0
        _, J = lidar.point_residual_jac(T, p_s, q_w)

        def res(delta):
            r, _ = lidar.point_residual_jac(se3.retract(T, delta), p_s, q_w)
            return r

        J_num = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_num), atol=1e-3, rtol=1e-3)

    def test_line_jacobian(self):
        k1, k2, k3, k4 = jax.random.split(KEY, 4)
        T = _random_pose(k1)
        p_s = jax.random.normal(k2, (8, 3)) * 3.0
        a = jax.random.normal(k3, (8, 3)) * 3.0
        b = a + jax.random.normal(k4, (8, 3))
        _, J = lidar.edge_line_residual_jac(T, p_s, a, b)

        def res(delta):
            r, _ = lidar.edge_line_residual_jac(se3.retract(T, delta), p_s, a, b)
            return r

        J_num = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_num), atol=1e-3, rtol=1e-3)

    def test_plane_residual_zero_on_plane(self):
        T = se3.identity()
        n = jnp.array([[0.0, 0.0, 1.0]])
        d = jnp.array([-2.0])
        p = jnp.array([[3.0, 1.0, 2.0]])  # z=2 on plane z=2
        r, _ = lidar.plane_residual_jac(T, p, n, d)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)


class TestPoseGraph:
    def test_se3_residual_zero_when_consistent(self):
        k1, k2 = jax.random.split(KEY)
        T_iw = _random_pose(k1)
        T_jw = _random_pose(k2)
        meas = se3.compose(T_jw, se3.inverse(T_iw))
        # r = log(meas ∘ T_iw ∘ T_jw^-1); meas = T_jw T_iw^-1 ... so
        # meas∘T_iw∘T_jw^{-1} = T_jw T_iw^{-1} T_iw T_jw^{-1} = I. Wait —
        # convention: measurement stored as S_ji = S_jw ∘ S_iw^{-1}? Then the
        # residual needs meas^{-1}. Verify the implemented convention directly:
        r = pose_graph.se3_relative_residual(T_iw, T_jw, se3.inverse(meas))
        r2 = pose_graph.se3_relative_residual(T_iw, T_jw, meas)
        assert (
            float(jnp.linalg.norm(r)) < 1e-4 or float(jnp.linalg.norm(r2)) < 1e-4
        )

    def test_se3_jacobians(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        T_iw, T_jw = _random_pose(k1), _random_pose(k2)
        meas = se3.exp(jax.random.normal(k3, (6,)) * 0.2)
        r, J_i, J_j = pose_graph.se3_relative_residual_jac(T_iw, T_jw, meas)
        assert r.shape == (6,) and J_i.shape == (6, 6) and J_j.shape == (6, 6)
        # Jacobians must be full rank (pose graph solvable).
        assert np.linalg.matrix_rank(np.asarray(J_i)) == 6

    def test_sim3_residual_zero_when_consistent(self):
        k1, k2 = jax.random.split(KEY)
        S_iw = sim3.exp(jax.random.normal(k1, (7,)) * 0.3)
        S_jw = sim3.exp(jax.random.normal(k2, (7,)) * 0.3)
        meas = sim3.compose(S_jw, sim3.inverse(S_iw))
        r = pose_graph.sim3_relative_residual(S_iw, S_jw, sim3.inverse(meas))
        r2 = pose_graph.sim3_relative_residual(S_iw, S_jw, meas)
        assert (
            float(jnp.linalg.norm(r)) < 1e-3 or float(jnp.linalg.norm(r2)) < 1e-3
        )
