"""Two-view triangulation: DLT correctness + gates + fundamental matrix."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.factors.reprojection import Camera
from sqrtlm_slam_tpu.geometry import se3
from sqrtlm_slam_tpu.pipeline import triangulation

CAM = Camera(fx=220.0, fy=220.0, cx=160.0, cy=120.0, bf=44.0)
KEY = jax.random.PRNGKey(3)


def two_view_scene(n=64, baseline=1.0):
    k1, k2 = jax.random.split(KEY)
    X = jax.random.uniform(k1, (n, 3), minval=-4, maxval=4) + jnp.array([0, 0, 12.0])
    T1 = se3.identity()
    T2 = se3.SE3(jnp.eye(3), jnp.array([-baseline, 0.0, 0.0]))  # cam2 right of cam1
    uv1 = CAM.project(se3.act(T1, X))
    uv2 = CAM.project(se3.act(T2, X))
    return X, T1, T2, uv1, uv2


class TestFundamental:
    def test_epipolar_constraint(self):
        X, T1, T2, uv1, uv2 = two_view_scene()
        F12 = triangulation.fundamental_matrix(T1, T2, CAM)
        x1 = jnp.concatenate([uv1, jnp.ones((len(uv1), 1))], -1)
        x2 = jnp.concatenate([uv2, jnp.ones((len(uv2), 1))], -1)
        vals = jnp.einsum("ni,ij,nj->n", x2, F12, x1)
        # Scale-invariant check: normalize by line norm.
        lines = x1 @ F12.T
        d = jnp.abs(vals) / jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)
        assert float(jnp.max(d)) < 1e-2  # sub-pixel epipolar distance


class TestDLT:
    def test_recovers_points(self):
        X, T1, T2, uv1, uv2 = two_view_scene()
        K = jnp.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1.0]])
        P1 = K @ jnp.concatenate([T1.R, T1.t[:, None]], -1)
        P2 = K @ jnp.concatenate([T2.R, T2.t[:, None]], -1)
        Xr = triangulation._dlt_triangulate(uv1, uv2, P1, P2)
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=1e-2)


class TestMatchAndTriangulate:
    def test_full_pipeline_with_descriptors(self):
        X, T1, T2, uv1, uv2 = two_view_scene(n=64)
        rng = np.random.RandomState(0)
        desc = rng.randint(0, 2**31, (64, 8)).astype(np.uint32)
        valid = jnp.ones(64, bool)
        sigma2 = jnp.ones(64)
        res = triangulation.match_and_triangulate(
            T1, T2, CAM,
            uv1, jnp.asarray(desc), valid, sigma2,
            uv2, jnp.asarray(desc), valid, sigma2,
        )
        ok = np.asarray(res.valid)
        assert ok.sum() >= 55  # nearly all points triangulated
        idx2 = np.asarray(res.idx2)
        assert (idx2[ok] == np.arange(64)[ok]).all()  # correct correspondence
        np.testing.assert_allclose(
            np.asarray(res.points_w)[ok], np.asarray(X)[ok], atol=5e-2
        )

    def test_zero_baseline_rejected(self):
        X, T1, _, uv1, _ = two_view_scene()
        rng = np.random.RandomState(0)
        desc = jnp.asarray(rng.randint(0, 2**31, (64, 8)).astype(np.uint32))
        valid = jnp.ones(64, bool)
        sigma2 = jnp.ones(64)
        res = triangulation.match_and_triangulate(
            T1, T1, CAM, uv1, desc, valid, sigma2, uv1, desc, valid, sigma2
        )
        assert int(jnp.sum(res.valid)) == 0  # no parallax -> all gated out
