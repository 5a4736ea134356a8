"""Pose-only LM optimization on synthetic scenes (4x10 gated protocol)."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.factors import lidar as lidar_factors
from sqrtlm_slam_tpu.factors.reprojection import Camera
from sqrtlm_slam_tpu.geometry import se3
from sqrtlm_slam_tpu.optim import lm, pose_opt

KEY = jax.random.PRNGKey(3)
CAM = Camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22, bf=386.1448)


def make_scene(key, n=200, noise=0.5, outlier_frac=0.2, stereo_frac=0.5):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    X = jax.random.normal(k1, (n, 3)) * jnp.array([8.0, 4.0, 6.0]) + jnp.array(
        [0.0, 0.0, 20.0]
    )
    T_true = se3.exp(
        jnp.concatenate([jax.random.normal(k2, (3,)) * 0.5, jax.random.normal(k2, (3,)) * 0.05])
    )
    x_c = se3.act(T_true, X)
    uv = CAM.project(x_c) + jax.random.normal(k3, (n, 2)) * noise
    ur = uv[..., 0] - CAM.bf / x_c[..., 2] + jax.random.normal(k4, (n,)) * noise

    is_stereo = jax.random.uniform(k5, (n,)) < stereo_frac
    uvr = jnp.concatenate([uv, jnp.where(is_stereo, ur, -1.0)[..., None]], axis=-1)

    # Inject gross outliers.
    n_out = int(n * outlier_frac)
    uvr = uvr.at[:n_out, :2].add(
        jax.random.normal(k5, (n_out, 2)) * 80.0 + 40.0
    )
    obs = pose_opt.VisualObs(
        points_w=X,
        uvr=uvr,
        inv_sigma2=jnp.ones((n,)),
        valid=jnp.ones((n,), dtype=bool),
    )
    return T_true, obs, n_out


class TestLMEngine:
    def test_quadratic_converges(self):
        """LM on a pure quadratic: H fixed, should reach optimum in one accept."""
        A = jnp.array([[4.0, 1.0], [1.0, 3.0]])
        target = jnp.array([1.0, -2.0])

        def system_fn(x):
            r = A @ (x - target)
            H = A.T @ A
            b = A.T @ r
            return H, b, jnp.sum(r * r)

        res = lm.lm_optimize(
            jnp.zeros(2), system_fn, lambda x, dx: x + dx, num_iters=5
        )
        np.testing.assert_allclose(np.asarray(res.params), np.asarray(target), atol=1e-4)

    def test_rejects_bad_steps(self):
        """Rosenbrock-style: LM must still make progress with damping."""

        def system_fn(x):
            r = jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])
            J = jnp.array([[-20.0 * x[0], 10.0], [-1.0, 0.0]])
            H = J.T @ J
            b = J.T @ r
            return H, b, jnp.sum(r * r)

        res = lm.lm_optimize(
            jnp.array([-1.2, 1.0]), system_fn, lambda x, dx: x + dx, num_iters=50
        )
        assert float(res.chi2) < 1e-3


class TestPoseOptimization:
    def test_recovers_pose_with_outliers(self):
        T_true, obs, n_out = make_scene(KEY)
        # Start from a perturbed pose (motion-model-style error).
        T0 = se3.retract(T_true, jnp.array([0.3, -0.2, 0.4, 0.02, -0.03, 0.01]))
        result = pose_opt.optimize_pose(T0, obs, CAM)

        err = se3.local_delta(result.pose, T_true)
        assert float(jnp.linalg.norm(err[:3])) < 0.05, f"trans err {err}"
        assert float(jnp.linalg.norm(err[3:])) < 0.005, f"rot err {err}"
        # Outliers gated out, inliers retained.
        n = obs.valid.shape[0]
        assert int(result.num_inliers) > (n - n_out) * 0.9
        assert int(result.num_inliers) < n - n_out * 0.7

    def test_jit_compiles_once(self):
        T_true, obs, _ = make_scene(KEY)
        T0 = se3.retract(T_true, jnp.array([0.2, 0.1, -0.1, 0.01, 0.02, -0.01]))
        jitted = jax.jit(
            lambda p, o: pose_opt.optimize_pose(p, o, CAM)
        )
        r1 = jitted(T0, obs)
        r2 = jitted(r1.pose, obs)
        assert float(r2.chi2) <= float(r1.chi2) * 1.5

    def test_lidar_tight_coupling_improves_pose(self):
        """Visual-only weak scene + strong LiDAR plane constraints."""
        k1, k2 = jax.random.split(KEY)
        # Deliberately weak visual constellation (few points, heavy noise) so
        # the exact LiDAR planes dominate the fused optimum.
        T_true, obs, _ = make_scene(k1, n=25, noise=8.0, outlier_frac=0.0)

        # LiDAR flat points: sample world points on 3 planes, transform into
        # the sensor frame with T_true (sensor == camera frame here).
        normals = jnp.array([[0, 0, 1.0], [0, 1.0, 0], [1.0, 0, 0]])
        ds = jnp.array([-25.0, 3.0, -8.0])
        pts_w = []
        nrm = []
        dd = []
        for i in range(3):
            k2, sub = jax.random.split(k2)
            p = jax.random.normal(sub, (40, 3)) * 6.0
            # Project onto plane: p <- p - (n.p + d) n
            n_i = normals[i]
            p = p - (p @ n_i + ds[i])[:, None] * n_i[None, :]
            pts_w.append(p)
            nrm.append(jnp.tile(n_i[None], (40, 1)))
            dd.append(jnp.full((40,), ds[i]))
        pts_w = jnp.concatenate(pts_w)
        p_s = se3.act(T_true, pts_w)  # sensor-frame observation
        lobs = pose_opt.LidarObs(
            flat_pts=p_s,
            plane_n=jnp.concatenate(nrm),
            plane_d=jnp.concatenate(dd),
            flat_valid=jnp.ones((120,), dtype=bool),
            corner_pts=jnp.zeros((1, 3)),
            corner_target=jnp.zeros((1, 3)),
            corner_valid=jnp.zeros((1,), dtype=bool),
        )
        T0 = se3.retract(T_true, jnp.array([0.4, -0.3, 0.3, 0.03, -0.02, 0.04]))
        res_vis = pose_opt.optimize_pose(T0, obs, CAM)
        res_fused = pose_opt.optimize_pose(T0, obs, CAM, lidar_obs=lobs)

        err_vis = float(jnp.linalg.norm(se3.local_delta(res_vis.pose, T_true)[:3]))
        err_fused = float(jnp.linalg.norm(se3.local_delta(res_fused.pose, T_true)[:3]))
        assert err_fused < err_vis, (err_fused, err_vis)
        assert err_fused < 0.05

    def test_lidar_residual_consistency(self):
        """point_world inverts act: p_w == T^{-1} act(T, p_w)."""
        k1, k2 = jax.random.split(KEY)
        T = se3.exp(jax.random.normal(k1, (6,)) * 0.4)
        p_w = jax.random.normal(k2, (10, 3)) * 5.0
        p_s = se3.act(T, p_w)
        np.testing.assert_allclose(
            np.asarray(lidar_factors.point_world(T, p_s)), np.asarray(p_w), atol=1e-5
        )
