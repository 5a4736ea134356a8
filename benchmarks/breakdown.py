"""Per-iteration composition of the assembled (Pallas) LM loop at the bench
shape (P=96, L=8192, K=5).

Slope-timed (N=2 vs N=8 loop reps inside one jit, CSE defeated by an
epsilon perturbation of the carried state) per PERF.md methodology. This is
the one canonical stage-timing tool; the round-1/2 exploratory variants
(S-einsum precision, solve alternatives, feed costs, ...) live in git
history as benchmarks/breakdown{2..10}.py.

Run on the real TPU chip:  python benchmarks/breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sqrtlm_slam_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import schur_bucketed as sb
from sqrtlm_slam_tpu.optim import assembly_pallas as ap

P, L, K = 96, 8192, 5
flat, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
problem = sb.from_flat(flat, K)
cam = DEFAULT_CAM
active = problem.obs_valid
DELTA = 2.447
MU = jnp.float32(1e-3)


def slope(make_body, reps=(2, 8), n_timing=4):
    """make_body() -> (init_carry, body_fn(carry)->carry, consume(carry)->scalar)"""
    init, body, consume = make_body()

    @jax.jit
    def run(n, carry):
        def step(_, c):
            return body(c)

        return consume(jax.lax.fori_loop(0, n, step, carry))

    times = {}
    for n in reps:
        nn = jnp.int32(n)
        float(run(nn, init))
        best = 1e9
        for _ in range(n_timing):
            t0 = time.perf_counter()
            float(run(nn, init))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = reps
    return (times[n1] - times[n0]) / (n1 - n0) * 1e3


def perturb(p, s):
    eps = 1.0 + jnp.sign(s) * 1e-7
    return p._replace(points=p.points * eps)


def m_full_iter():
    def body(carry):
        prob, chi2, mu, nu, acc = carry
        pieces = sb.build_local_pieces(prob, cam, active, DELTA, mu)
        rhs = -(pieces.bp.reshape(-1) - pieces.rhs_corr)
        dxp = sb.solve_pose_system(pieces.S_half, rhs, prob.pose_fixed)
        dxp = jnp.where(prob.pose_fixed[:, None], 0.0, dxp)
        dxl = sb.back_substitute(pieces, prob, dxp)
        cand = sb._apply_update(prob, dxp, dxl)
        chi2_c = sb.chi2_only(cand, cam, active, DELTA)
        a, prob_new, mu_new, nu_new = sb._lm_accept(
            prob, cand, pieces.chi2, chi2_c, dxp, dxl, pieces.bp, pieces.bl, mu, nu
        )
        return (prob_new, chi2_c, mu_new, nu_new, acc + a)

    init = (problem, jnp.float32(jnp.inf), MU, jnp.float32(2.0), jnp.int32(0))
    return init, body, lambda c: c[1]


def m_pieces():
    def body(carry):
        prob, s = carry
        pieces = sb.build_local_pieces(prob, cam, active, DELTA, MU)
        s2 = pieces.chi2 + jnp.sum(pieces.S_half[:2, :2])
        return (perturb(prob, s2), s2)

    return (problem, jnp.float32(0.0)), body, lambda c: c[1]


def m_assemble():
    def body(carry):
        prob, s = carry
        w_active = prob.obs_inv_sigma2 * active.astype(jnp.float32)
        out = ap.assemble(
            prob.pose_R, prob.pose_t, ~prob.pose_fixed, prob.points,
            prob.obs_cam, prob.obs_uvr, w_active,
            fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
            cy=float(cam.cy), bf=float(cam.bf), robust_delta=DELTA,
        )
        s2 = out.chi2 + jnp.sum(out.bp[:2]) + jnp.sum(out.U[0, 0]) + jnp.sum(out.Hll[0])
        return (perturb(prob, s2), s2)

    return (problem, jnp.float32(0.0)), body, lambda c: c[1]


def m_feed():
    """Just the XLA-side gathers/transposes that feed the kernel."""
    def body(carry):
        prob, s = carry
        Rg = prob.pose_R[prob.obs_cam]
        tg = prob.pose_t[prob.obs_cam]
        rg_t = Rg.reshape(L, K, 9).transpose(2, 1, 0)
        tg_t = tg.transpose(2, 1, 0)
        x_t = jnp.broadcast_to(prob.points.T[:, None, :], (3, K, L))
        uvr_t = prob.obs_uvr.transpose(2, 1, 0)
        s2 = (
            jnp.sum(rg_t[:, 0, :2]) + jnp.sum(tg_t[:, 0, :2])
            + jnp.sum(x_t[:, 0, :2]) + jnp.sum(uvr_t[:, 0, :2]) + s * 0
        )
        return (perturb(prob, s2), s2)

    return (problem, jnp.float32(0.0)), body, lambda c: c[1]


def m_tail():
    w_active = problem.obs_inv_sigma2 * active.astype(jnp.float32)
    out0 = ap.assemble(
        problem.pose_R, problem.pose_t, ~problem.pose_fixed, problem.points,
        problem.obs_cam, problem.obs_uvr, w_active,
        fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
        cy=float(cam.cy), bf=float(cam.bf), robust_delta=DELTA,
    )

    def body(carry):
        Hll, bl, U, Hpp, bp, s = carry
        pieces = sb._pieces_tail(problem, Hll, bl, U, Hpp, bp, jnp.float32(0), MU)
        s2 = jnp.sum(pieces.S_half[:2, :2]) + pieces.rhs_corr[0]
        eps = 1.0 + jnp.sign(s2) * 1e-7
        return (Hll * eps, bl * eps, U * eps, Hpp * eps, bp * eps, s2)

    init = (out0.Hll, out0.bl, out0.U, out0.Hpp, out0.bp, jnp.float32(0.0))
    return init, body, lambda c: c[5]


def m_solve():
    pieces0 = jax.jit(
        lambda p: sb.build_local_pieces(p, cam, active, DELTA, MU)
    )(problem)
    S0 = pieces0.S_half
    rhs0 = -(pieces0.bp.reshape(-1) - pieces0.rhs_corr)

    def body(carry):
        S, rhs, s = carry
        dxp = sb.solve_pose_system(S, rhs, problem.pose_fixed)
        s2 = jnp.sum(dxp[:2])
        eps = 1.0 + jnp.sign(s2) * 1e-7
        return (S * eps, rhs * eps, s2)

    return (S0, rhs0, jnp.float32(0.0)), body, lambda c: c[2]


def m_backsub():
    pieces0 = jax.jit(
        lambda p: sb.build_local_pieces(p, cam, active, DELTA, MU)
    )(problem)

    def body(carry):
        dxp, s = carry
        dxl = sb.back_substitute(pieces0, problem, dxp)
        s2 = jnp.sum(dxl[:2])
        eps = 1.0 + jnp.sign(s2) * 1e-7
        return (dxp * eps, s2)

    dxp0 = jnp.zeros((P, 6), jnp.float32) + 1e-4
    return (dxp0, jnp.float32(0.0)), body, lambda c: c[1]


def m_chi2():
    def body(carry):
        prob, s = carry
        c = sb.chi2_only(prob, cam, active, DELTA)
        return (perturb(prob, c), c)

    return (problem, jnp.float32(0.0)), body, lambda c: c[1]




def m_production_scan():
    """The ACTUAL production LM body (rows-layout Pallas path) via
    ba_iterate slope: 15 vs 45 iterations inside one jit."""
    import time as _time

    out = {}
    for iters in (15, 45):
        f = jax.jit(
            lambda p, n=iters: sb.ba_iterate(
                p, cam, p.obs_valid, n, robust_delta=DELTA, use_pallas=True
            )[1]
        )
        float(f(problem))
        best = 1e9
        for _ in range(4):
            t0 = _time.perf_counter()
            float(f(problem))
            best = min(best, _time.perf_counter() - t0)
        out[iters] = best
    return (out[45] - out[15]) / 30 * 1e3


def m_rows_tail():
    w_active = problem.obs_inv_sigma2 * active.astype(jnp.float32)
    prep = ap.prepare(problem.obs_uvr, w_active, ~problem.pose_fixed, problem.obs_cam)
    red0 = ap.assemble_prepared_rows(
        problem.pose_R, problem.pose_t, problem.points, prep,
        fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
        cy=float(cam.cy), bf=float(cam.bf), robust_delta=DELTA,
    )
    O = jax.nn.one_hot(prep.cam_t, P, axis=1)

    def body(carry):
        red, s = carry
        pieces = sb._pieces_tail_rows(problem, red, MU, O)
        s2 = jnp.sum(pieces.S_half[:2, :2]) + pieces.rhs_corr[0]
        eps = 1.0 + jnp.sign(s2) * 1e-7
        return (jax.tree.map(lambda a: a * eps if a.ndim else a, red), s2)

    return (red0, jnp.float32(0.0)), body, lambda c: c[1]

print(f"device={jax.devices()[0].platform}, P={P}, L={L}, K={K}")
print(f"{'production LM iter (rows, slope 15v45)':38s}: {m_production_scan():7.3f} ms")
for name, m in [
    ("full LM iteration", m_full_iter),
    ("build_local_pieces (kernel+tail)", m_pieces),
    ("  assemble kernel (incl feed)", m_assemble),
    ("    XLA feed (gathers/transposes)", m_feed),
    ("  _pieces_tail (V/Y/S/rhs_corr)", m_tail),
    ("  _pieces_tail_rows (production)", m_rows_tail),
    ("solve_pose_system (576)", m_solve),
    ("back_substitute", m_backsub),
    ("chi2_only (kernel incl feed)", m_chi2),
]:
    print(f"{name:38s}: {slope(m):7.3f} ms")
