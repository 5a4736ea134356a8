"""Per-piece timing breakdown of the BA iteration at the headline bench shape.

Slope timing (see PERF.md): each piece runs N=LO vs N=HI times inside ONE jit
via lax.scan with a data dependency between repetitions (prevents hoisting/DCE),
cost = (t_hi - t_lo) / (HI - LO). Every output is consumed via float().

Run on the real TPU chip:  python benchmarks/breakdown.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import schur

P, L, K = 96, 8192, 5
LO, HI = 2, 8


def slope(make_fn, label):
    fns = {}
    for n in (LO, HI):
        fns[n] = jax.jit(make_fn(n))
        out = fns[n]()
        jax.block_until_ready(out)
        float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
    times = {}
    for n in (LO, HI):
        reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fns[n]()
            s = float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
            t1 = time.perf_counter()
            best = min(best, t1 - t0)
        times[n] = best
        del s
    per = (times[HI] - times[LO]) / (HI - LO)
    print(f"{label:42s} {per*1e3:9.3f} ms/rep   (t{LO}={times[LO]*1e3:.1f} t{HI}={times[HI]*1e3:.1f})")
    return per


def main():
    print("devices:", jax.devices())
    problem, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
    problem = jax.device_put(problem)
    cam = DEFAULT_CAM
    active = problem.obs_valid

    # 1. Full LM iteration (ba_iterate with 1 iter per rep).
    def mk_full(n):
        def f():
            def body(prob, _):
                out, chi2, _ = schur.ba_iterate(prob, cam, active, 1, robust_delta=2.447)
                return out, chi2
            prob, chi2s = jax.lax.scan(body, problem, None, length=n)
            return chi2s
        return f
    slope(mk_full, "full LM iteration")

    # 2. chi2_only pass.
    def mk_chi2(n):
        def f():
            def body(c, _):
                p2 = problem._replace(pose_t=problem.pose_t + 1e-12 * c)
                return schur.chi2_only(p2, cam, active, 2.447), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_chi2, "chi2_only (residual pass)")

    # 3. build_normal_equations.
    def mk_build(n):
        def f():
            def body(c, _):
                p2 = problem._replace(pose_t=problem.pose_t + 1e-12 * c)
                Hpp, Hll, W, bp, bl, chi2 = schur.build_normal_equations(p2, cam, active, 2.447)
                return chi2 + jnp.sum(W[0, 0]) + jnp.sum(Hpp[0, 0]) + bl[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_build, "build_normal_equations (assembly)")

    # Precompute normal equations once for solver pieces.
    Hpp, Hll, W, bp, bl, _ = jax.jit(
        lambda p: schur.build_normal_equations(p, cam, active, 2.447)
    )(problem)
    mu = jnp.float32(1e-3)

    # 4. reduce_and_solve.
    def mk_solve(n):
        def f():
            def body(c, _):
                dxp, dxl = schur.reduce_and_solve(
                    Hpp + 1e-12 * c, Hll, W, bp, bl,
                    problem.pose_fixed, problem.point_valid, mu,
                )
                return jnp.sum(dxp) + jnp.sum(dxl[0]), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_solve, "reduce_and_solve (total)")

    # 5. S_corr einsum pieces.
    from sqrtlm_slam_tpu.optim.edge_kernels import inv3x3
    eye3 = jnp.eye(3, dtype=jnp.float32)
    dll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
    Hll_d = jnp.where(problem.point_valid[:, None, None],
                      Hll + mu * dll[..., None] * eye3 + 1e-8 * eye3, eye3)
    Hll_inv = jax.jit(inv3x3)(Hll_d)

    def mk_scorr(n):
        def f():
            def body(c, _):
                Wp = W + 1e-12 * c
                WHinv = jnp.einsum("alk,lkm->alm", Wp, Hll_inv)
                S_corr = jnp.einsum("alm,blm->ab", WHinv, Wp)
                return jnp.sum(S_corr[0]), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_scorr, "  WHinv + S_corr einsums")

    # 6. Cholesky solve of the 576x576 system.
    S0 = jnp.eye(P * 6) * 10.0 + jax.random.normal(jax.random.PRNGKey(0), (P * 6, P * 6)) * 0.01
    S0 = S0 @ S0.T
    rhs0 = jnp.ones((P * 6,))

    def mk_chol(n):
        def f():
            def body(c, _):
                x = jax.scipy.linalg.cho_solve(
                    jax.scipy.linalg.cho_factor(S0 + 1e-12 * c), rhs0
                )
                return jnp.sum(x), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_chol, "  cho_factor+cho_solve 576x576")

    # 7. The dense-W scatter alone (segment_sum into P*L block slots).
    r, Jp, Jl, w, chi2, _ = jax.jit(
        lambda p: schur._edge_terms(p, cam, active, 2.447)
    )(problem)

    def mk_scatter(n):
        def f():
            def body(c, _):
                Wblk = jnp.einsum("eki,e,ekj->eij", Jp + 1e-12 * c, w, Jl)
                flat_idx = problem.obs_cam * L + problem.obs_pt
                Wd = jax.ops.segment_sum(Wblk, flat_idx, num_segments=P * L)
                Wd = Wd.reshape(P, L, 6, 3).transpose(0, 2, 1, 3).reshape(P * 6, L, 3)
                return jnp.sum(Wd[0]), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_scatter, "  dense-W scatter (segment_sum P*L)")

    # 8. Edge terms alone (r, Jp, Jl materialized).
    def mk_edges(n):
        def f():
            def body(c, _):
                p2 = problem._replace(pose_t=problem.pose_t + 1e-12 * c)
                r, Jp, Jl, w, chi2, _ = schur._edge_terms(p2, cam, active, 2.447)
                return chi2 + jnp.sum(Jp[0]) + jnp.sum(Jl[0]) + r[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_edges, "  edge terms (r, Jp, Jl)")

    # 9. Hpp/Hll/b segment sums alone.
    def mk_seg(n):
        def f():
            def body(c, _):
                Jp2 = Jp + 1e-12 * c
                Hpp_ = jax.ops.segment_sum(
                    jnp.einsum("eki,e,ekj->eij", Jp2, w, Jp2), problem.obs_cam, num_segments=P)
                Hll_ = jax.ops.segment_sum(
                    jnp.einsum("eki,e,ekj->eij", Jl, w, Jl), problem.obs_pt, num_segments=L)
                bp_ = jax.ops.segment_sum(
                    jnp.einsum("eki,e,ek->ei", Jp2, w, r), problem.obs_cam, num_segments=P)
                bl_ = jax.ops.segment_sum(
                    jnp.einsum("eki,e,ek->ei", Jl, w, r), problem.obs_pt, num_segments=L)
                return jnp.sum(Hpp_[0]) + jnp.sum(Hll_[0]) + bp_[0, 0] + bl_[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_seg, "  Hpp/Hll/bp/bl segment sums")


def main_bucketed():
    from sqrtlm_slam_tpu.optim import schur_bucketed as sb

    problem, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
    bucketed = jax.device_put(sb.from_flat(problem, K))
    cam = DEFAULT_CAM
    active = bucketed.obs_valid

    for y_build in ("onehot", "scatter"):
        sb.Y_BUILD = y_build

        def mk_full(n):
            def f():
                def body(prob, _):
                    out, chi2, _ = sb.ba_iterate(prob, cam, active, 1, robust_delta=2.447)
                    return out, chi2
                prob, chi2s = jax.lax.scan(body, bucketed, None, length=n)
                return chi2s
            return f
        slope(mk_full, f"bucketed LM iteration [{y_build}]")

        def mk_step(n):
            def f():
                def body(c, _):
                    p2 = bucketed._replace(pose_t=bucketed.pose_t + 1e-12 * c)
                    dxp, dxl, chi2, bp, bl = sb.reduce_and_solve(
                        p2, cam, active, 2.447, jnp.float32(1e-3)
                    )
                    return jnp.sum(dxp) + jnp.sum(dxl[0]) + chi2, None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        slope(mk_step, f"  bucketed build+solve [{y_build}]")

    def mk_chi2(n):
        def f():
            def body(c, _):
                p2 = bucketed._replace(pose_t=bucketed.pose_t + 1e-12 * c)
                return sb.chi2_only(p2, cam, active, 2.447), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_chi2, "  bucketed chi2_only")


if __name__ == "__main__":
    import sys as _sys
    if "--bucketed" in _sys.argv:
        main_bucketed()
    else:
        main()
