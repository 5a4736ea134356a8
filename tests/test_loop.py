"""Loop-closing components: Sim3 RANSAC, essential graph, CG global BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqrtlm_slam_tpu.geometry import se3, sim3
from sqrtlm_slam_tpu.loop import essential_graph, sim3_solver
from sqrtlm_slam_tpu.optim import schur
from tests.test_schur_ba import CAM, make_ba_scene

KEY = jax.random.PRNGKey(5)


def random_sim3(key, max_angle=0.5, max_t=2.0, max_log_s=0.3, fix_scale=False):
    k1, k2, k3 = jax.random.split(key, 3)
    xi = jnp.concatenate(
        [
            jax.random.uniform(k1, (3,), minval=-max_t, maxval=max_t),
            jax.random.uniform(k2, (3,), minval=-max_angle, maxval=max_angle),
            jnp.zeros(1)
            if fix_scale
            else jax.random.uniform(k3, (1,), minval=-max_log_s, maxval=max_log_s),
        ]
    )
    return sim3.exp(xi)


class TestSim3Ransac:
    @pytest.mark.parametrize("fix_scale", [False, True])
    def test_recovers_transform_with_outliers(self, fix_scale):
        k1, k2, k3 = jax.random.split(KEY, 3)
        N = 128
        S_true = random_sim3(k1, fix_scale=fix_scale)
        # Points in front of both cameras.
        x2 = jax.random.uniform(k2, (N, 3), minval=-4, maxval=4) + jnp.array(
            [0.0, 0.0, 12.0]
        )
        x1 = sim3.act(S_true, x2)
        # 25% outliers.
        n_out = N // 4
        x1 = x1.at[:n_out].add(jax.random.normal(k3, (n_out, 3)) * 5.0)
        valid = jnp.ones(N, bool)
        is2 = jnp.ones(N)

        res = sim3_solver.ransac_sim3(
            jax.random.PRNGKey(0), x1, x2, valid, is2, is2, CAM,
            fix_scale=fix_scale,
        )
        assert int(res.num_inliers) >= N - n_out - 8
        err = sim3.log(sim3.compose(sim3.inverse(res.S12), S_true))
        assert float(jnp.linalg.norm(err)) < 0.05

    def test_refinement_tightens(self):
        k1, k2 = jax.random.split(KEY)
        N = 96
        S_true = random_sim3(k1)
        x2 = jax.random.uniform(k2, (N, 3), minval=-4, maxval=4) + jnp.array(
            [0.0, 0.0, 12.0]
        )
        x1 = sim3.act(S_true, x2)
        valid = jnp.ones(N, bool)
        is2 = jnp.ones(N)
        # Start from a perturbed guess.
        S0 = sim3.retract(S_true, jnp.array([0.1, -0.1, 0.05, 0.02, -0.02, 0.01, 0.02]))
        S_ref, inl, n = sim3_solver.optimize_sim3(
            S0, x1, x2, valid, is2, is2, CAM
        )
        err0 = jnp.linalg.norm(sim3.log(sim3.compose(sim3.inverse(S0), S_true)))
        err1 = jnp.linalg.norm(sim3.log(sim3.compose(sim3.inverse(S_ref), S_true)))
        assert float(err1) < float(err0) * 0.1
        assert int(n) == N


class TestEssentialGraph:
    def _make_drifted_loop(self, K=24, drift=0.02):
        """Ring trajectory whose odometry drifts; loop edge closes it."""
        rng = np.random.RandomState(0)
        # True poses on a circle (world->cam).
        true_poses = []
        for k in range(K):
            a = 2 * np.pi * k / K
            t_wc = np.array([np.cos(a) * 10, np.sin(a) * 10, 0.0])
            yaw = a + np.pi / 2
            R_wc = np.array(
                [
                    [np.cos(yaw), -np.sin(yaw), 0],
                    [np.sin(yaw), np.cos(yaw), 0],
                    [0, 0, 1.0],
                ]
            )
            R_cw = R_wc.T
            t_cw = -R_cw @ t_wc
            true_poses.append(se3.SE3(jnp.asarray(R_cw, dtype=jnp.float32), jnp.asarray(t_cw, dtype=jnp.float32)))

        # Drifted estimates: integrate noisy relative poses.
        est = [true_poses[0]]
        for k in range(1, K):
            T_rel = se3.compose(true_poses[k], se3.inverse(true_poses[k - 1]))
            noise = jnp.asarray(
                rng.normal(0, drift, 6) * np.array([1, 1, 1, 0.3, 0.3, 0.3]),
                dtype=jnp.float32,
            )
            est.append(se3.compose(se3.retract(T_rel, noise), est[-1]))

        E_cap = 64
        e_i = np.zeros(E_cap, np.int32)
        e_j = np.zeros(E_cap, np.int32)
        e_s = np.ones(E_cap, np.float32)
        e_R = np.tile(np.eye(3, dtype=np.float32), (E_cap, 1, 1))
        e_t = np.zeros((E_cap, 3), np.float32)
        e_v = np.zeros(E_cap, bool)
        ne = 0
        # Odometry chain edges measured from the DRIFTED estimates (these
        # are self-consistent) ...
        for k in range(1, K):
            T_rel = se3.compose(est[k], se3.inverse(est[k - 1]))
            e_i[ne], e_j[ne] = k - 1, k
            e_R[ne] = np.asarray(T_rel.R)
            e_t[ne] = np.asarray(T_rel.t)
            e_v[ne] = True
            ne += 1
        # ... plus the loop edge with the TRUE relative pose (K-1 -> 0).
        T_loop = se3.compose(true_poses[0], se3.inverse(true_poses[K - 1]))
        e_i[ne], e_j[ne] = K - 1, 0
        e_R[ne] = np.asarray(T_loop.R)
        e_t[ne] = np.asarray(T_loop.t)
        e_v[ne] = True
        ne += 1

        problem = essential_graph.PoseGraphProblem(
            s=jnp.ones(K),
            R=jnp.stack([p.R for p in est]),
            t=jnp.stack([p.t for p in est]),
            fixed=jnp.arange(K) == 0,
            valid=jnp.ones(K, bool),
            e_i=jnp.asarray(e_i),
            e_j=jnp.asarray(e_j),
            e_s=jnp.asarray(e_s),
            e_R=jnp.asarray(e_R),
            e_t=jnp.asarray(e_t),
            e_valid=jnp.asarray(e_v),
        )
        return problem, true_poses, est

    def test_loop_relaxation_reduces_endpoint_error(self):
        problem, true_poses, est = self._make_drifted_loop()
        out, chi2 = essential_graph.optimize_pose_graph(problem, num_iters=30)
        K = len(true_poses)

        def endpoint_err(R, t):
            T = se3.SE3(jnp.asarray(R), jnp.asarray(t))
            d = se3.local_delta(T, true_poses[K - 1])
            return float(jnp.linalg.norm(d[:3]))

        err_before = endpoint_err(est[K - 1].R, est[K - 1].t)
        err_after = endpoint_err(out.R[K - 1], out.t[K - 1] / out.s[K - 1])
        assert err_after < err_before * 0.5
        assert float(chi2) < 1.0

    def test_measure_edges_roundtrip(self):
        problem, _, est = self._make_drifted_loop(K=8)
        poses = problem.poses()
        S = essential_graph.measure_edges(poses, problem.e_i, problem.e_j)
        # Residual with self-measured edges must vanish.
        from sqrtlm_slam_tpu.factors import pose_graph

        S_i = jax.tree_util.tree_map(lambda a: a[problem.e_i], poses)
        S_j = jax.tree_util.tree_map(lambda a: a[problem.e_j], poses)
        r = pose_graph.sim3_relative_residual(S_i, S_j, S)
        assert float(jnp.max(jnp.abs(r))) < 1e-4


class TestGlobalBACG:
    def test_cg_step_matches_dense(self):
        """Matrix-free PCG step == dense Schur step on the same problem."""
        problem, _, _ = make_ba_scene(KEY, P=5, L=40, noise=0.3)
        mu = 1e-3
        Hpp, Hll, W, bp, bl, _ = schur.build_normal_equations(
            problem, CAM, problem.obs_valid, None
        )
        dxp_ref, dxl_ref = schur.reduce_and_solve(
            Hpp, Hll, W, bp, bl, problem.pose_fixed, problem.point_valid, mu
        )
        dxp, dxl, _, _, _, n = schur.cg_reduce_and_solve(
            problem, CAM, problem.obs_valid, None, mu, cg_iters=300, cg_tol=1e-10
        )
        np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxp_ref), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dxl), np.asarray(dxl_ref), atol=2e-3)

    def test_global_ba_cg_converges(self):
        problem, poses_true, _ = make_ba_scene(KEY, P=6, L=64, noise=0.3)
        chi0 = schur.build_normal_equations(problem, CAM, problem.obs_valid, None)[-1]
        out, survivors, stats = schur.global_ba_cg(problem, CAM, num_iters=10)
        assert float(stats.chi2) < float(chi0) * 0.2
        err = se3.local_delta(out.poses(), poses_true)
        assert float(jnp.max(jnp.linalg.norm(err[:, :3], axis=-1))) < 0.05
