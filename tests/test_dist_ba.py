"""Distributed BA on the 8-device virtual CPU mesh: exactness vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sqrtlm_slam_tpu.optim import schur
from sqrtlm_slam_tpu.parallel import dist_ba
from tests.test_schur_ba import CAM, make_ba_scene

KEY = jax.random.PRNGKey(77)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return Mesh(devs[:8], axis_names=("ba",))


class TestPartitioner:
    def test_partition_covers_all(self):
        problem, _, _ = make_ba_scene(KEY, P=4, L=24, noise=0.3)
        sharded, lm_ids = dist_ba.partition_problem(problem, 8)
        # All landmark ids appear exactly once.
        ids = lm_ids[lm_ids >= 0]
        assert sorted(ids.tolist()) == list(range(24))
        # All valid edges preserved.
        assert int(jnp.sum(sharded.obs_valid)) == int(jnp.sum(problem.obs_valid))

    def test_local_indices_consistent(self):
        problem, _, _ = make_ba_scene(KEY, P=4, L=24, noise=0.3)
        sharded, lm_ids = dist_ba.partition_problem(problem, 4)
        # Edge (d, j) with local slot s refers to global landmark lm_ids[d, s]
        # whose position must match the original.
        pts = np.asarray(problem.points)
        for d in range(4):
            val = np.asarray(sharded.obs_valid[d])
            slots = np.asarray(sharded.obs_pt[d])[val]
            gids = lm_ids[d][slots]
            np.testing.assert_allclose(
                np.asarray(sharded.points[d])[slots], pts[gids], atol=1e-6
            )


class TestDistributedBA:
    def test_matches_single_device_step(self, mesh):
        """One distributed GN step == one single-device damped step."""
        problem, _, _ = make_ba_scene(KEY, P=4, L=24, noise=0.4)
        mu = 1e-3

        # Single-device reference step.
        Hpp, Hll, W, bp, bl, _ = schur.build_normal_equations(
            problem, CAM, problem.obs_valid, None
        )
        dxp, dxl = schur.reduce_and_solve(
            Hpp, Hll, W, bp, bl, problem.pose_fixed, problem.point_valid, mu
        )
        ref = schur._apply_update(problem, dxp, dxl)

        # Distributed step.
        out, _ = dist_ba.distributed_ba(problem, CAM, mesh, num_iters=1, mu=mu)
        np.testing.assert_allclose(
            np.asarray(out.pose_t), np.asarray(ref.pose_t), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.points), np.asarray(ref.points), atol=5e-3
        )

    def test_converges_on_scene(self, mesh):
        problem, poses_true, _ = make_ba_scene(KEY, P=6, L=64, noise=0.3)
        chi0 = schur.build_normal_equations(problem, CAM, problem.obs_valid, None)[-1]
        out, chi2 = dist_ba.distributed_ba(problem, CAM, mesh, num_iters=8)
        assert float(chi2) < float(chi0) * 0.1
        from sqrtlm_slam_tpu.geometry import se3

        err = se3.local_delta(out.poses(), poses_true)
        assert float(jnp.max(jnp.linalg.norm(err[:, :3], axis=-1))) < 0.05


class TestBucketedDistributedBA:
    def test_matches_single_device_step(self, mesh):
        """One bucketed distributed GN step == single-device bucketed step."""
        from sqrtlm_slam_tpu.optim import schur_bucketed as sb

        problem, _, _ = make_ba_scene(KEY, P=4, L=24, noise=0.4)
        b = sb.from_flat(problem, K=4)
        mu = 1e-3
        dxp, dxl, _, _, _ = sb.reduce_and_solve(b, CAM, b.obs_valid, None, mu)
        dxp = jnp.where(b.pose_fixed[:, None], 0.0, dxp)
        ref = sb._apply_update(b, dxp, dxl)

        out, _ = dist_ba.distributed_ba_bucketed(b, CAM, mesh, num_iters=1, mu=mu)
        np.testing.assert_allclose(
            np.asarray(out.pose_t), np.asarray(ref.pose_t), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.points), np.asarray(ref.points), atol=5e-3
        )

    def test_converges_on_scene(self, mesh):
        from sqrtlm_slam_tpu.geometry import se3
        from sqrtlm_slam_tpu.optim import schur_bucketed as sb

        problem, poses_true, _ = make_ba_scene(KEY, P=6, L=64, noise=0.3)
        b = sb.from_flat(problem, K=6)
        chi0 = float(sb.chi2_only(b, CAM, b.obs_valid, None))
        out, chi2 = dist_ba.distributed_ba_bucketed(b, CAM, mesh, num_iters=8)
        assert float(chi2) < chi0 * 0.1
        err = se3.local_delta(out.poses(), poses_true)
        assert float(jnp.max(jnp.linalg.norm(err[:, :3], axis=-1))) < 0.05


class TestDistributedNielsenLM:
    """The full accept/reject LM loop inside the mesh (round-3 upgrade:
    dist BA previously ran fixed-mu GN steps only)."""

    def test_matches_single_device_lm(self, mesh):
        from sqrtlm_slam_tpu.optim import schur_bucketed as sb

        problem, _, _ = make_ba_scene(KEY, P=6, L=64, noise=0.4)
        b = sb.from_flat(problem, K=6)
        ref, chi2_ref, acc_ref = sb.ba_iterate(
            b, CAM, b.obs_valid, 6, robust_delta=None
        )
        out, chi2, acc = dist_ba.distributed_ba_lm(b, CAM, mesh, num_iters=6)
        # Same protocol (mu0, Nielsen updates, rollback). psum reassociation
        # and the per-shard diagonal floor can flip ONE marginal accept, so
        # allow that while requiring matching convergence quality.
        assert abs(int(acc) - int(acc_ref)) <= 1
        np.testing.assert_allclose(float(chi2), float(chi2_ref), rtol=0.05)
        np.testing.assert_allclose(
            np.asarray(out.pose_t), np.asarray(ref.pose_t), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(out.points), np.asarray(ref.points), atol=2e-2
        )

    def test_rejects_then_recovers(self, mesh):
        """A hard problem (large noise) must show the LM loop actually
        rejecting steps (nu growth) yet still reducing chi2."""
        from sqrtlm_slam_tpu.optim import schur_bucketed as sb

        problem, _, _ = make_ba_scene(KEY, P=6, L=64, noise=1.5)
        b = sb.from_flat(problem, K=6)
        chi0 = float(sb.chi2_only(b, CAM, b.obs_valid, None))
        out, chi2, acc = dist_ba.distributed_ba_lm(b, CAM, mesh, num_iters=10)
        assert float(chi2) <= chi0
        assert 0 < int(acc) <= 10
