"""Breakdown of the kernel-path LM iteration (post-c44358b).

Slope timing (N=2 vs N=8 inside one jit, consume outputs via float()) of the
pieces of _ba_iterate_assembled at the bench shape: assembly kernel, chi2-only
candidate pass, tail (damp/chol/V/S), cho_solve, back-substitution.
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
from sqrtlm_slam_tpu.optim import assembly_pallas, schur_bucketed as sb

P, L, K = 96, 8192, 5
cam = DEFAULT_CAM
flat, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
prob = sb.from_flat(flat, K)
mu = jnp.asarray(1e-3, jnp.float32)
DELTA = 2.447


def slope(fn, reps=(2, 8), n_timing=4):
    """ms per rep via slope between rep counts (subtracts dispatch cost).

    Each rep perturbs the input by a result-dependent epsilon so XLA cannot
    CSE the identical pure calls into one (the breakdown6 trick)."""

    @jax.jit
    def run(p, n):
        def body(_, carry):
            s, x = carry
            s = s + fn(x)
            x = x._replace(
                points=(x.points * (1.0 + jnp.sign(s) * 1e-7)).astype(
                    x.points.dtype
                )
            )
            return s, x

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), p))[0]

    times = {}
    for n in reps:
        nn = jnp.int32(n)
        float(run(prob, nn))  # compile+warm
        best = 1e9
        for _ in range(n_timing):
            t0 = time.perf_counter()
            float(run(prob, nn))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = reps
    return (times[n1] - times[n0]) / (n1 - n0) * 1e3


def f_full(p):
    out, chi2, acc = sb.ba_iterate(p, cam, p.obs_valid, 1, robust_delta=DELTA)
    return chi2 + jnp.sum(out.pose_t) + acc


def f_kernel(p):
    w_active = p.obs_inv_sigma2 * p.obs_valid.astype(jnp.float32)
    out = assembly_pallas.assemble(
        p.pose_R, p.pose_t, ~p.pose_fixed, p.points, p.obs_cam, p.obs_uvr,
        w_active, fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
        cy=float(cam.cy), bf=float(cam.bf), robust_delta=DELTA,
    )
    return (
        out.chi2 + jnp.sum(out.Hll) + jnp.sum(out.bl) + jnp.sum(out.U)
        + jnp.sum(out.Hpp) + jnp.sum(out.bp)
    )


def f_chi2(p):
    return sb.chi2_only(p, cam, p.obs_valid, DELTA)


def f_pieces(p):
    pieces = sb.build_local_pieces(p, cam, p.obs_valid, DELTA, mu)
    return pieces.chi2 + jnp.sum(pieces.S_half) + jnp.sum(pieces.rhs_corr)


def f_step(p):
    dxp, dxl, chi2, bp, bl = sb.reduce_and_solve(p, cam, p.obs_valid, DELTA, mu)
    return chi2 + jnp.sum(dxp) + jnp.sum(dxl)


print(f"device={jax.devices()[0].platform}")
print(f"full LM iter        : {slope(f_full):7.3f} ms")
print(f"assembly kernel     : {slope(f_kernel):7.3f} ms")
print(f"chi2_only pass      : {slope(f_chi2):7.3f} ms")
print(f"build_local_pieces  : {slope(f_pieces):7.3f} ms")
print(f"reduce_and_solve    : {slope(f_step):7.3f} ms")
