"""Schur-complement BA engine: algebraic correctness + synthetic-scene recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.factors.reprojection import Camera
from sqrtlm_slam_tpu.geometry import se3
from sqrtlm_slam_tpu.optim import schur

KEY = jax.random.PRNGKey(11)
CAM = Camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22, bf=386.1448)


def make_ba_scene(
    key,
    P=6,
    L=80,
    noise=0.3,
    pose_noise=0.05,
    point_noise=0.05,
    stereo_frac=0.6,
    n_fixed=2,
):
    """Poses on a rough line, landmarks ahead; full observation matrix."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    # True poses: camera i at x = i (world), looking down +z.
    t_true = jnp.stack(
        [jnp.arange(P) * 1.0, jnp.zeros(P), jnp.zeros(P)], axis=-1
    ) + jax.random.normal(k1, (P, 3)) * 0.1
    w_true = jax.random.normal(k2, (P, 3)) * 0.02
    R_true = jax.vmap(lambda w: se3.exp(jnp.concatenate([jnp.zeros(3), w])).R)(w_true)
    # T_cw: world->cam with camera center at c: t = -R c.
    pose_t = -jnp.einsum("pij,pj->pi", R_true, t_true)
    poses_true = se3.SE3(R_true, pose_t)

    points_true = jax.random.normal(k3, (L, 3)) * jnp.array([6.0, 3.0, 4.0]) + jnp.array(
        [P / 2.0, 0.0, 18.0]
    )

    # Observations: every pose observes every landmark (dense; E = P*L).
    obs_cam = jnp.repeat(jnp.arange(P, dtype=jnp.int32), L)
    obs_pt = jnp.tile(jnp.arange(L, dtype=jnp.int32), P)
    T_e = se3.SE3(R_true[obs_cam], pose_t[obs_cam])
    x_c = se3.act(T_e, points_true[obs_pt])
    uv = CAM.project(x_c) + jax.random.normal(k4, (P * L, 2)) * noise
    ur = uv[..., 0] - CAM.bf / x_c[..., 2] + jax.random.normal(k5, (P * L,)) * noise
    is_stereo = jax.random.uniform(k6, (P * L,)) < stereo_frac
    uvr = jnp.concatenate([uv, jnp.where(is_stereo, ur, -1.0)[..., None]], axis=-1)

    # Perturb free poses and all points (the BA must undo this).
    k7, k8 = jax.random.split(k6)
    dpose = jax.random.normal(k7, (P, 6)) * jnp.array([1, 1, 1, 0.3, 0.3, 0.3]) * pose_noise
    dpose = dpose.at[:n_fixed].set(0.0)
    poses_init = se3.retract(poses_true, dpose)
    points_init = points_true + jax.random.normal(k8, (L, 3)) * point_noise

    problem = schur.BAProblem(
        pose_R=poses_init.R,
        pose_t=poses_init.t,
        pose_fixed=jnp.arange(P) < n_fixed,
        pose_valid=jnp.ones(P, dtype=bool),
        points=points_init,
        point_valid=jnp.ones(L, dtype=bool),
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uvr=uvr,
        obs_inv_sigma2=jnp.ones(P * L),
        obs_valid=jnp.ones(P * L, dtype=bool),
    )
    return problem, poses_true, points_true


class TestSchurAlgebra:
    def test_schur_matches_dense_solve(self):
        """The Schur-reduced solve must equal solving the full normal system."""
        problem, _, _ = make_ba_scene(KEY, P=4, L=12, noise=0.5)
        P, L = 4, 12
        Hpp, Hll, W, bp, bl, _ = schur.build_normal_equations(
            problem, CAM, problem.obs_valid, None
        )
        mu = jnp.asarray(1e-3)
        dxp, dxl = schur.reduce_and_solve(
            Hpp, Hll, W, bp, bl, problem.pose_fixed, problem.point_valid, mu
        )

        # Dense reference: assemble the full (6P + 3L) system.
        H_full = np.zeros((6 * P + 3 * L, 6 * P + 3 * L))
        b_full = np.zeros(6 * P + 3 * L)
        # Marquardt damping (matches reduce_and_solve): mu * diag + 1e-8 I.
        for p in range(P):
            Hp = np.asarray(Hpp[p])
            H_full[6 * p : 6 * p + 6, 6 * p : 6 * p + 6] = (
                Hp + 1e-3 * np.diag(np.diag(Hp)) + 1e-8 * np.eye(6)
            )
        for l in range(L):
            s = 6 * P + 3 * l
            Hl = np.asarray(Hll[l])
            H_full[s : s + 3, s : s + 3] = (
                Hl + 1e-3 * np.diag(np.diag(Hl)) + 1e-8 * np.eye(3)
            )
        W_np = np.asarray(W).reshape(6 * P, L, 3)
        for l in range(L):
            H_full[: 6 * P, 6 * P + 3 * l : 6 * P + 3 * l + 3] = W_np[:, l, :]
            H_full[6 * P + 3 * l : 6 * P + 3 * l + 3, : 6 * P] = W_np[:, l, :].T
        b_full[: 6 * P] = np.asarray(bp).reshape(-1)
        b_full[6 * P :] = np.asarray(bl).reshape(-1)

        # Pin fixed pose rows/cols.
        fixed = np.asarray(problem.pose_fixed)
        for p in range(P):
            if fixed[p]:
                sl = slice(6 * p, 6 * p + 6)
                H_full[sl, :] = 0.0
                H_full[:, sl] = 0.0
                H_full[sl, sl] = np.eye(6)
                b_full[sl] = 0.0

        dx_full = np.linalg.solve(H_full, -b_full)
        np.testing.assert_allclose(
            np.asarray(dxp).reshape(-1), dx_full[: 6 * P], atol=2e-3, rtol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(dxl).reshape(-1), dx_full[6 * P :], atol=2e-3, rtol=1e-2
        )


class TestLocalBA:
    def test_recovers_scene(self):
        problem, poses_true, points_true = make_ba_scene(KEY)
        chi2_before = schur.build_normal_equations(problem, CAM, problem.obs_valid, None)[-1]
        result, survivors, stats = schur.local_ba(problem, CAM)

        assert float(stats.chi2) < float(chi2_before) * 0.05
        # Free pose errors vs truth should be small (fixed gauge anchors).
        err = se3.local_delta(result.poses(), poses_true)
        trans_err = jnp.linalg.norm(err[:, :3], axis=-1)
        assert float(jnp.max(trans_err)) < 0.03, trans_err
        # Landmarks recovered.
        pt_err = jnp.linalg.norm(result.points - points_true, axis=-1)
        assert float(jnp.median(pt_err)) < 0.05
        # Nothing spuriously gated out (no outliers injected).
        assert int(stats.num_inlier_edges) > problem.obs_valid.shape[0] * 0.97

    def test_outlier_gating(self):
        problem, _, _ = make_ba_scene(KEY, noise=0.3)
        E = problem.obs_uvr.shape[0]
        n_out = 40
        k = jax.random.PRNGKey(5)
        bad = problem.obs_uvr.at[:n_out, :2].add(
            jax.random.normal(k, (n_out, 2)) * 60.0 + 30.0
        )
        problem = problem._replace(obs_uvr=bad)
        _, survivors, stats = schur.local_ba(problem, CAM)
        # The injected outliers must be gated out.
        assert int(jnp.sum(survivors[:n_out])) == 0
        assert int(jnp.sum(survivors[n_out:])) > (E - n_out) * 0.95

    def test_fixed_poses_unchanged(self):
        problem, _, _ = make_ba_scene(KEY)
        result, _, _ = schur.local_ba(problem, CAM)
        np.testing.assert_allclose(
            np.asarray(result.pose_R[:2]), np.asarray(problem.pose_R[:2]), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(result.pose_t[:2]), np.asarray(problem.pose_t[:2]), atol=1e-7
        )

    def test_jit_local_ba(self):
        problem, _, _ = make_ba_scene(KEY, P=4, L=32)
        jitted = jax.jit(lambda p: schur.local_ba(p, CAM))
        r1, _, s1 = jitted(problem)
        r2, _, s2 = jitted(r1)
        assert float(s2.chi2) <= float(s1.chi2) * 1.2


class TestGlobalBA:
    def test_global_ba_runs(self):
        problem, poses_true, _ = make_ba_scene(KEY, P=8, L=100, n_fixed=1)
        result, _, stats = schur.global_ba(problem, CAM)
        err = se3.local_delta(result.poses(), poses_true)
        assert float(jnp.max(jnp.linalg.norm(err[:, :3], axis=-1))) < 0.05
