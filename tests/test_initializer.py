"""Monocular two-view initializer: F path, H path (planar), degeneracy."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.factors.reprojection import Camera
from sqrtlm_slam_tpu.geometry import se3, so3
from sqrtlm_slam_tpu.pipeline import initializer

CAM = Camera(fx=220.0, fy=220.0, cx=160.0, cy=120.0)
KEY = jax.random.PRNGKey(11)


def make_pair(planar=False, n=150, noise=0.3, outlier_frac=0.1):
    k1, k2, k3 = jax.random.split(KEY, 3)
    if planar:
        uvw = jax.random.uniform(k1, (n, 2), minval=-5, maxval=5)
        X = jnp.concatenate([uvw, jnp.zeros((n, 1))], -1) + jnp.array([0, 0, 14.0])
        # tilt the plane a bit
        Rp = so3.exp(jnp.array([0.3, 0.1, 0.0]))
        X = (X - jnp.array([0, 0, 14.0])) @ Rp.T + jnp.array([0, 0, 14.0])
    else:
        X = jax.random.uniform(k1, (n, 3), minval=-5, maxval=5) + jnp.array(
            [0, 0, 14.0]
        )
    R21 = so3.exp(jnp.array([0.02, -0.1, 0.01]))
    t21 = jnp.array([-1.2, 0.05, 0.1])
    T21 = se3.SE3(R21, t21)
    uv1 = CAM.project(X)
    uv2 = CAM.project(se3.act(T21, X))
    uv2 = uv2 + jax.random.normal(k2, uv2.shape) * noise
    n_out = int(n * outlier_frac)
    uv2 = uv2.at[:n_out].add(jax.random.normal(k3, (n_out, 2)) * 40.0)
    valid = jnp.ones(n, bool)
    return X, T21, uv1, uv2, valid


def check_pose(res, T21_true):
    R_est, t_est = res.T_21.R, res.T_21.t
    # translation is up-to-scale: compare directions
    t_true = T21_true.t / jnp.linalg.norm(T21_true.t)
    cos_t = jnp.abs(jnp.sum(t_est * t_true))
    dR = so3.log(R_est @ T21_true.R.T)
    return float(cos_t), float(jnp.linalg.norm(dR))


class TestInitializer:
    def test_general_scene_uses_F(self):
        X, T21, uv1, uv2, valid = make_pair(planar=False)
        res = initializer.initialize_two_view(jax.random.PRNGKey(0), uv1, uv2, valid, CAM)
        assert bool(res.success)
        assert not bool(res.used_homography)
        cos_t, rot_err = check_pose(res, T21)
        assert cos_t > 0.995 and rot_err < 0.02
        # Triangulated points match up to the global scale factor (median
        # relative error — individual far points have high depth variance
        # from the 0.3 px observation noise).
        good = np.asarray(res.good)
        scale = float(jnp.linalg.norm(T21.t))
        err = np.linalg.norm(
            np.asarray(res.points_w)[good] - np.asarray(X)[good] / scale, axis=-1
        )
        depth = np.asarray(X)[good][:, 2] / scale
        assert np.median(err / depth) < 0.05

    def test_planar_scene_uses_H(self):
        X, T21, uv1, uv2, valid = make_pair(planar=True)
        res = initializer.initialize_two_view(jax.random.PRNGKey(1), uv1, uv2, valid, CAM)
        assert bool(res.used_homography)
        assert bool(res.success)
        cos_t, rot_err = check_pose(res, T21)
        assert cos_t > 0.995 and rot_err < 0.03

    def test_pure_rotation_rejected(self):
        k1 = jax.random.PRNGKey(4)
        X = jax.random.uniform(k1, (150, 3), minval=-5, maxval=5) + jnp.array([0, 0, 14.0])
        R21 = so3.exp(jnp.array([0.0, -0.08, 0.0]))
        T21 = se3.SE3(R21, jnp.zeros(3))  # no baseline
        uv1 = CAM.project(X)
        uv2 = CAM.project(se3.act(T21, X))
        valid = jnp.ones(150, bool)
        res = initializer.initialize_two_view(jax.random.PRNGKey(2), uv1, uv2, valid, CAM)
        assert not bool(res.success)  # no parallax -> refuse to initialize
