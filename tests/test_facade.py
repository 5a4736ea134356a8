"""Optimizer facade: the three backends are interchangeable (Optimizer.cc:26-107
parity — the reference swaps g2o/Ceres/mybackend behind one interface and
expects equivalent results, not bit-identical ones)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import facade, schur_bucketed

P, L, K = 8, 256, 4


@pytest.fixture(scope="module")
def bucketed_problem():
    flat, _ = make_ba_problem(seed=2, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    return schur_bucketed.from_flat(flat, K)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        facade.Optimizer("g2o")


def test_bucketed_to_flat_roundtrip(bucketed_problem):
    flat = facade.bucketed_to_flat(bucketed_problem)
    assert flat.obs_cam.shape == (L * K,)
    assert int(flat.obs_valid.sum()) == int(bucketed_problem.obs_valid.sum())
    # edge (l, k) maps to flat index l*K + k with obs_pt == l
    np.testing.assert_array_equal(
        np.asarray(flat.obs_pt).reshape(L, K),
        np.tile(np.arange(L)[:, None], (1, K)),
    )


@pytest.mark.parametrize("backend", facade.BACKENDS)
def test_local_ba_backends_agree(bucketed_problem, backend):
    opt = facade.Optimizer(backend)
    out, survivors, chi2 = opt.local_bundle_adjustment(bucketed_problem, DEFAULT_CAM)
    assert survivors.shape == (L, K)
    chi2_0 = float(
        schur_bucketed.chi2_only(
            bucketed_problem, DEFAULT_CAM, bucketed_problem.obs_valid, None
        )
    )
    # Each backend must reduce chi2 by orders of magnitude on this synthetic
    # (well-conditioned) problem.
    assert float(chi2) < 0.05 * chi2_0, backend
    assert out.pose_t.shape == bucketed_problem.pose_t.shape


def test_global_ba_backends_agree(bucketed_problem):
    results = {}
    for backend in ("bucketed", "flat"):
        opt = facade.Optimizer(backend)
        out, survivors, chi2 = opt.global_bundle_adjustment(
            bucketed_problem, DEFAULT_CAM, num_iters=10
        )
        results[backend] = (np.asarray(out.pose_t), float(chi2))
    # Both reach the same basin: optimized poses agree to fine tolerance.
    np.testing.assert_allclose(
        results["bucketed"][0], results["flat"][0], rtol=1e-2, atol=1e-3
    )
