"""PnP RANSAC banks: 3D-3D (depth) and 2D-3D (mono DLT resection)."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.algorithm import pnp
from sqrtlm_slam_tpu.factors.reprojection import Camera
from sqrtlm_slam_tpu.geometry import se3, so3

CAM = Camera(fx=220.0, fy=220.0, cx=160.0, cy=120.0, bf=44.0)
KEY = jax.random.PRNGKey(9)


def scene(n=200, outlier_frac=0.3, noise=0.5):
    k1, k2, k3 = jax.random.split(KEY, 3)
    X_w = jax.random.uniform(k1, (n, 3), minval=-6, maxval=6) + jnp.array([0, 0, 14.0])
    R = so3.exp(jnp.array([0.1, -0.2, 0.05]))
    t = jnp.array([0.4, -0.2, 1.0])
    T = se3.SE3(R, t)
    x_c = se3.act(T, X_w)
    uv = CAM.project(x_c) + jax.random.normal(k2, (n, 2)) * noise
    n_out = int(n * outlier_frac)
    uv = uv.at[:n_out].add(jax.random.normal(k3, (n_out, 2)) * 60.0)
    return X_w, x_c, uv, T, n_out


class TestPnP2d3d:
    def test_recovers_pose_with_outliers(self):
        X_w, _, uv, T_true, n_out = scene()
        res = pnp.ransac_pnp_2d3d(
            jax.random.PRNGKey(0), X_w, uv, jnp.ones(len(X_w), bool),
            jnp.ones(len(X_w)), CAM,
        )
        assert int(res.num_inliers) > len(X_w) - n_out - 20
        d = se3.local_delta(res.pose, T_true)
        assert float(jnp.linalg.norm(d[:3])) < 0.05
        assert float(jnp.linalg.norm(d[3:])) < 0.01
        assert abs(float(jnp.linalg.det(res.pose.R)) - 1.0) < 1e-4


class TestPnP3d3d:
    def test_recovers_pose(self):
        X_w, x_c, uv, T_true, n_out = scene(outlier_frac=0.0)
        res = pnp.ransac_pose_3d3d(
            jax.random.PRNGKey(1), X_w, x_c, uv, jnp.ones(len(X_w), bool),
            jnp.ones(len(X_w)), CAM,
        )
        d = se3.local_delta(res.pose, T_true)
        assert float(jnp.linalg.norm(d[:3])) < 0.02
