"""Pallas assembly kernel vs the XLA reference reductions (interpret mode).

Validates that optim/assembly_pallas.py reproduces _edge_terms +
pieces_from_terms' reductions (Hll, bl, U, Hpp, bp, chi2) bit-accurately
(up to f32 reassociation) on the same bucketed problem.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental import pallas as pl  # noqa: F401  (skip if unavailable)

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import assembly_pallas, schur_bucketed

P, L, K = 8, 256, 4


def _reference_reductions(prob, cam, active, robust_delta):
    # HIGHEST: on TPU the default-precision einsums truncate their f32 inputs
    # to bf16 on the MXU — the *reference* would then be the inaccurate side
    # of the comparison (found when the tpu-marked test first ran on-chip).
    hi = jax.lax.Precision.HIGHEST
    r, Jp, Jl, w, chi2, _ = schur_bucketed._edge_terms(
        prob, cam, active, robust_delta
    )
    free = (~prob.pose_fixed)[prob.obs_cam]
    Jp = Jp * free[..., None, None].astype(r.dtype)
    Hll = jnp.einsum("lkri,lk,lkrj->lij", Jl, w, Jl, precision=hi)
    bl = jnp.einsum("lkri,lk,lkr->li", Jl, w, r, precision=hi)
    U = jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jl, precision=hi)
    O = jax.nn.one_hot(prob.obs_cam, P, dtype=r.dtype).reshape(L * K, P)
    Hpp = jnp.einsum(
        "ep,ed->pd",
        O,
        jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jp, precision=hi).reshape(L * K, 36),
        precision=hi,
    ).reshape(P, 6, 6)
    bp = jnp.einsum(
        "ep,ei->pi",
        O,
        jnp.einsum("lkri,lk,lkr->lki", Jp, w, r, precision=hi).reshape(L * K, 6),
        precision=hi,
    )
    return Hll, bl, U, Hpp, bp, chi2


@pytest.mark.parametrize("robust_delta", [None, 2.447])
def test_assembly_matches_xla(robust_delta):
    flat, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    prob = schur_bucketed.from_flat(flat, K)
    cam = DEFAULT_CAM
    active = prob.obs_valid

    ref = _reference_reductions(prob, cam, active, robust_delta)

    w_active = prob.obs_inv_sigma2 * active.astype(jnp.float32)
    with jax.disable_jit():  # interpret path on CPU
        import functools
        out = assembly_pallas.assemble.__wrapped__(
            prob.pose_R,
            prob.pose_t,
            ~prob.pose_fixed,
            prob.points,
            prob.obs_cam,
            prob.obs_uvr,
            w_active,
            fx=cam.fx,
            fy=cam.fy,
            cx=cam.cx,
            cy=cam.cy,
            bf=cam.bf,
            robust_delta=robust_delta,
            interpret=True,
        )

    names = ["Hll", "bl", "U", "Hpp", "bp", "chi2"]
    for name, got, want in zip(names, out, ref):
        # f32 reassociation (fused muladd chains vs einsum accumulation
        # order) perturbs cancellation-heavy sums; the LM loop gates every
        # step by chi2 so this is well below algorithmic significance.
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(want),
            rtol=5e-3,
            atol=5e-4,
            err_msg=name,
        )


def test_ba_iterate_kernel_body_matches_xla_body():
    """The LM loop with the Pallas assembly kernel (interpret mode) as its
    reduction provider must track the XLA-reductions loop: identical
    protocol, same accepted chi2 trajectory up to f32 reassociation."""
    flat, _ = make_ba_problem(seed=1, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    prob = schur_bucketed.from_flat(flat, K)
    cam = DEFAULT_CAM
    delta = 2.447

    out_a, chi2_a, acc_a = schur_bucketed.ba_iterate(
        prob, cam, prob.obs_valid, 8, robust_delta=delta, use_pallas=False
    )

    w_active = prob.obs_inv_sigma2 * prob.obs_valid.astype(jnp.float32)
    prep = assembly_pallas.prepare(
        prob.obs_uvr, w_active, ~prob.pose_fixed, prob.obs_cam
    )

    def reduce_fn(p):
        out = assembly_pallas.assemble_prepared(
            p.pose_R, p.pose_t, p.points, prep,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
            robust_delta=delta, interpret=True,
        )
        return (out.Hll, out.bl, out.U, out.Hpp, out.bp, out.chi2)

    out_b, chi2_b, acc_b = schur_bucketed._ba_iterate_core(prob, reduce_fn, 8)
    # The kernel's reductions differ from XLA's at f32-reassociation level
    # (rtol ~5e-3 above); near a marginal accept (gain ratio rho ~ 0) that
    # can flip one accept and the trajectories diverge slightly — so compare
    # at convergence level, not bitwise.
    assert abs(int(acc_a) - int(acc_b)) <= 1
    chi2_0 = float(
        schur_bucketed.chi2_only(prob, cam, prob.obs_valid, delta)
    )
    assert float(chi2_b) < 0.1 * chi2_0  # converged, not just ran
    np.testing.assert_allclose(float(chi2_a), float(chi2_b), rtol=5e-2)
    np.testing.assert_allclose(
        np.asarray(out_a.pose_t), np.asarray(out_b.pose_t), rtol=5e-2, atol=5e-2
    )


def test_pallas_ok_rejects_traced_robust_delta():
    """A non-static robust_delta must route to the XLA path, not crash the
    kernel jit (ADVICE r1: unhashable-static error)."""
    flat, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    prob = schur_bucketed.from_flat(flat, K)
    assert not schur_bucketed._pallas_assembly_ok(
        prob, DEFAULT_CAM, jnp.asarray(2.447)
    )
    assert schur_bucketed._pallas_assembly_ok(prob, DEFAULT_CAM, 2.447) == (
        jax.default_backend() == "tpu" and L % 128 == 0
    )


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled kernel path needs a TPU"
)
def test_assembly_compiled_tpu_matches_xla():
    """Compiled (non-interpret) kernel vs the XLA reductions, on-chip —
    covers TPU-only layout/lowering bugs the interpret test cannot see."""
    flat, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    prob = schur_bucketed.from_flat(flat, K)
    cam = DEFAULT_CAM
    # highest matmul precision end-to-end: the reference path's own einsums
    # (incl. se3.act inside _edge_terms) otherwise run bf16 on the MXU and
    # the "reference" becomes the inaccurate side.
    with jax.default_matmul_precision("highest"):
        ref = jax.tree.map(
            lambda x: np.asarray(x),
            _reference_reductions(prob, cam, prob.obs_valid, 2.447),
        )
    w_active = prob.obs_inv_sigma2 * prob.obs_valid.astype(jnp.float32)
    out = assembly_pallas.assemble(
        prob.pose_R, prob.pose_t, ~prob.pose_fixed, prob.points,
        prob.obs_cam, prob.obs_uvr, w_active,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
        robust_delta=2.447,
    )
    for name, got, want in zip(["Hll", "bl", "U", "Hpp", "bp", "chi2"], out, ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-4, err_msg=name
        )


@pytest.mark.parametrize("robust_delta", [None, 2.447])
def test_chi2_kernel_matches_xla(robust_delta):
    """Residual-only kernel (LM candidate evaluation) vs the XLA chi2."""
    flat, _ = make_ba_problem(seed=2, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    prob = schur_bucketed.from_flat(flat, K)
    cam = DEFAULT_CAM
    want = schur_bucketed._edge_terms(prob, cam, prob.obs_valid, robust_delta)[4]
    w_active = prob.obs_inv_sigma2 * prob.obs_valid.astype(jnp.float32)
    with jax.disable_jit():
        got = assembly_pallas.chi2_sum.__wrapped__(
            prob.pose_R, prob.pose_t, prob.points, prob.obs_cam, prob.obs_uvr,
            w_active, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
            robust_delta=robust_delta, interpret=True,
        )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_rows_tail_matches_pieces_tail():
    """_pieces_tail_rows (kernel-native rows layout) must reproduce
    _pieces_tail's S_half / rhs_corr / backsub algebra exactly (both f32
    on CPU)."""
    flat, _ = make_ba_problem(seed=2, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    prob = schur_bucketed.from_flat(flat, K)
    cam = DEFAULT_CAM
    mu = jnp.float32(1e-3)

    terms = schur_bucketed._edge_terms(prob, cam, prob.obs_valid, 2.447)[:5]
    Hll, bl, U, Hpp, bp, chi2 = schur_bucketed.reductions_from_terms(prob, terms)
    ref = schur_bucketed._pieces_tail(prob, Hll, bl, U, Hpp, bp, chi2, mu)

    rows = assembly_pallas.AssemblyRows(
        hll9=Hll.reshape(L, 9).T,
        bl3=bl.T,
        u18=U.reshape(L, K, 18).transpose(2, 1, 0),
        Hpp=Hpp,
        bp=bp,
        chi2=chi2,
    )
    O = jax.nn.one_hot(prob.obs_cam.T, P, axis=1)  # (K, P, L)
    got = schur_bucketed._pieces_tail_rows(prob, rows, mu, O)

    # Tolerances scale with the matrix magnitude: S entries are ~5e6-scale
    # dot products whose near-cancelling sums reassociate differently
    # between the two einsum orders (pure f32 effects, max rel ~3e-6 of the
    # matrix scale).
    S_ref = np.asarray(ref.S_half)
    np.testing.assert_allclose(
        np.asarray(got.S_half), S_ref, rtol=1e-4, atol=1e-5 * np.abs(S_ref).max()
    )
    r_ref = np.asarray(ref.rhs_corr)
    np.testing.assert_allclose(
        np.asarray(got.rhs_corr), r_ref, rtol=1e-4,
        atol=1e-5 * np.abs(r_ref).max(),
    )
    rhs = -(ref.bp.reshape(-1) - ref.rhs_corr)
    dxp = schur_bucketed.solve_pose_system(ref.S_half, rhs, prob.pose_fixed)
    dxp = jnp.where(prob.pose_fixed[:, None], 0.0, dxp)
    dxl_ref = schur_bucketed.back_substitute(ref, prob, dxp)
    dxl_rows = schur_bucketed.back_substitute_rows(got, prob, dxp, O)
    # dxl goes through Minv twice; f32 reassociation in the weighted sums
    # is amplified by the solve's conditioning (~1e-3 relative on the
    # smallest entries).
    np.testing.assert_allclose(
        np.asarray(dxl_rows), np.asarray(dxl_ref), rtol=5e-3, atol=1e-4
    )


def test_ba_iterate_rows_body_matches_xla_body():
    """The full rows-layout Pallas LM body (interpret mode) must track the
    XLA loop: same convergence, accept counts within 1."""
    flat, _ = make_ba_problem(seed=1, P=P, L=L, stereo_frac=0.5, obs_per_landmark=K)
    prob = schur_bucketed.from_flat(flat, K)
    cam = DEFAULT_CAM
    delta = 2.447

    out_a, chi2_a, acc_a = schur_bucketed.ba_iterate(
        prob, cam, prob.obs_valid, 8, robust_delta=delta, use_pallas=False
    )

    w_active = prob.obs_inv_sigma2 * prob.obs_valid.astype(jnp.float32)
    prep = assembly_pallas.prepare(
        prob.obs_uvr, w_active, ~prob.pose_fixed, prob.obs_cam
    )
    O = jax.nn.one_hot(prep.cam_t, P, axis=1)

    def reduce_fn(p):
        return assembly_pallas.assemble_prepared_rows(
            p.pose_R, p.pose_t, p.points, prep,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
            robust_delta=delta, interpret=True,
        )

    def step_fn(p, red, mu):
        pieces = schur_bucketed._pieces_tail_rows(p, red, mu, O)
        rhs = -(pieces.bp.reshape(-1) - pieces.rhs_corr)
        dxp = schur_bucketed.solve_pose_system(pieces.S_half, rhs, p.pose_fixed)
        dxp = jnp.where(p.pose_fixed[:, None], 0.0, dxp)
        dxl = schur_bucketed.back_substitute_rows(pieces, p, dxp, O)
        return dxp, dxl, pieces.bp, pieces.bl3.T

    out_b, chi2_b, acc_b = schur_bucketed._ba_iterate_core(
        prob, reduce_fn, 8, step_fn=step_fn
    )
    assert abs(int(acc_a) - int(acc_b)) <= 1
    chi2_0 = float(schur_bucketed.chi2_only(prob, cam, prob.obs_valid, delta))
    assert float(chi2_b) < 0.1 * chi2_0
    np.testing.assert_allclose(float(chi2_a), float(chi2_b), rtol=5e-2)
    np.testing.assert_allclose(
        np.asarray(out_a.pose_t), np.asarray(out_b.pose_t), rtol=5e-2, atol=5e-2
    )


def _rows_from_xla(prob, cam, mu):
    terms = schur_bucketed._edge_terms(prob, cam, prob.obs_valid, 2.447)[:5]
    Hll, bl, U, Hpp, bp, chi2 = schur_bucketed.reductions_from_terms(prob, terms)
    Ln = prob.num_points
    Kn = prob.obs_cam.shape[1]
    rows = assembly_pallas.AssemblyRows(
        hll9=Hll.reshape(Ln, 9).T,
        bl3=bl.T,
        u18=U.reshape(Ln, Kn, 18).transpose(2, 1, 0),
        Hpp=Hpp,
        bp=bp,
        chi2=chi2,
    )
    return rows


class TestChunkedSGram:
    """Banded chunked S_corr (schur_bucketed.plan_chunks/_chunked_S_corr)
    vs the dense rows tail — same algebra, ~36x fewer flops on banded maps."""

    def _check(self, prob, Pn, plan):
        cam = DEFAULT_CAM
        mu = jnp.float32(1e-3)
        rows = _rows_from_xla(prob, cam, mu)
        O = jax.nn.one_hot(prob.obs_cam.T, Pn, axis=1)
        dense = schur_bucketed._pieces_tail_rows(prob, rows, mu, O, None)
        chunked = schur_bucketed._pieces_tail_rows(prob, rows, mu, O, plan)
        S_ref = np.asarray(dense.S_half)
        np.testing.assert_allclose(
            np.asarray(chunked.S_half), S_ref,
            rtol=1e-4, atol=1e-5 * np.abs(S_ref).max(),
        )

    def test_banded_fully_covered(self):
        Pn, Ln, Kn = 24, 512, 4
        flat, _ = make_ba_problem(
            seed=5, P=Pn, L=Ln, stereo_frac=0.5, obs_per_landmark=Kn
        )
        prob = schur_bucketed.from_flat(flat, Kn)
        plan = schur_bucketed.plan_chunks(
            prob.obs_cam.T, prob.obs_valid.T, Pn, Lc=128, W=16
        )
        assert plan is not None
        assert int(plan.n_uncovered) == 0  # banded map: all chunk-covered
        self._check(prob, Pn, plan)

    def test_scrambled_uses_dense_fallback(self):
        """Random camera assignment: most landmarks escape their window —
        the lax.cond dense path must keep the result exact."""
        Pn, Ln, Kn = 24, 512, 4
        flat, _ = make_ba_problem(
            seed=6, P=Pn, L=Ln, stereo_frac=0.5, obs_per_landmark=Kn
        )
        prob = schur_bucketed.from_flat(flat, Kn)
        rng = np.random.RandomState(0)
        cam_scrambled = jnp.asarray(
            rng.randint(0, Pn, size=prob.obs_cam.shape), jnp.int32
        )
        prob = prob._replace(obs_cam=cam_scrambled)
        plan = schur_bucketed.plan_chunks(
            prob.obs_cam.T, prob.obs_valid.T, Pn, Lc=128, W=16
        )
        assert plan is not None
        assert int(plan.n_uncovered) > 0
        self._check(prob, Pn, plan)

    def test_lm_loop_with_plan_matches_dense(self):
        """ba_iterate on the XLA reduce path vs a manual loop with the
        chunked step: final chi2 must agree (the plan only reorders exact
        sums for covered landmarks)."""
        Pn, Ln, Kn = 16, 256, 4
        flat, _ = make_ba_problem(
            seed=7, P=Pn, L=Ln, stereo_frac=0.5, obs_per_landmark=Kn
        )
        prob = schur_bucketed.from_flat(flat, Kn)
        cam = DEFAULT_CAM
        ref, chi_ref, acc_ref = schur_bucketed.ba_iterate(
            prob, cam, prob.obs_valid, 5, robust_delta=2.447
        )

        O = jax.nn.one_hot(prob.obs_cam.T, Pn, axis=1)
        plan = schur_bucketed.plan_chunks(
            prob.obs_cam.T, prob.obs_valid.T, Pn, Lc=64, W=8
        )

        def reduce_fn(p):
            terms = schur_bucketed._edge_terms(p, cam, prob.obs_valid, 2.447)[:5]
            Hll, bl, U, Hpp, bp, chi2 = schur_bucketed.reductions_from_terms(p, terms)
            return assembly_pallas.AssemblyRows(
                hll9=Hll.reshape(Ln, 9).T, bl3=bl.T,
                u18=U.reshape(Ln, Kn, 18).transpose(2, 1, 0),
                Hpp=Hpp, bp=bp, chi2=chi2,
            )

        def step_fn(p, red, mu):
            pieces = schur_bucketed._pieces_tail_rows(p, red, mu, O, plan)
            rhs = -(pieces.bp.reshape(-1) - pieces.rhs_corr)
            dxp = schur_bucketed.solve_pose_system(pieces.S_half, rhs, p.pose_fixed)
            dxp = jnp.where(p.pose_fixed[:, None], 0.0, dxp)
            dxl = schur_bucketed.back_substitute_rows(pieces, p, dxp, O)
            return dxp, dxl, pieces.bp, pieces.bl3.T

        out, chi, acc = schur_bucketed._ba_iterate_core(
            prob, reduce_fn, 5, step_fn=step_fn
        )
        np.testing.assert_allclose(float(chi), float(chi_ref), rtol=5e-3)
