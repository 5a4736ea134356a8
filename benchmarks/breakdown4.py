"""Variants of the S = Y Y^T stage, measured in-graph (full bucketed step)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import schur_bucketed as sb

Pn, Ln, Kn = 96, 8192, 5
LO, HI = 2, 8
cam = DEFAULT_CAM
HI_P = jax.lax.Precision.HIGHEST


def step(problem, mu, variant: str):
    P, L = problem.num_poses, problem.num_points
    K = problem.obs_cam.shape[1]
    r, Jp, Jl, w, chi2, _ = sb._edge_terms(problem, cam, problem.obs_valid, 2.447)
    dtype = r.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    free_pose = (~problem.pose_fixed)[problem.obs_cam]
    Jp = Jp * free_pose[..., None, None].astype(dtype)
    Hll = jnp.einsum("lkri,lk,lkrj->lij", Jl, w, Jl)
    bl = jnp.einsum("lkri,lk,lkr->li", Jl, w, r)
    U = jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jl)
    O = jax.nn.one_hot(problem.obs_cam, P, dtype=dtype)
    Of = O.reshape(L * K, P)
    Hpp = jnp.einsum("ep,ed->pd", Of,
                     jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jp).reshape(L * K, 36)
                     ).reshape(P, 6, 6)
    bp = jnp.einsum("ep,ei->pi", Of,
                    jnp.einsum("lkri,lk,lkr->lki", Jp, w, r).reshape(L * K, 6))
    dll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
    Hll_d = Hll + mu * dll[..., None] * eye3 + 1e-8 * eye3
    Hll_d = jnp.where(problem.point_valid[:, None, None], Hll_d, eye3)
    Minv = sb.trinv_lower3x3(sb.chol3x3(Hll_d))
    V = jnp.einsum("lkim,ljm->lkij", U, Minv)
    z = jnp.einsum("lij,lj->li", Minv, bl)
    dpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp_d = Hpp + mu * dpp[..., None] * eye6 + 1e-8 * eye6
    BD = jnp.einsum("pij,pq->piqj", Hpp_d, jnp.eye(P, dtype=dtype)).reshape(P * 6, P * 6)

    V18 = V.reshape(L, K, 18)
    if variant == "A_transpose":
        Y = jnp.einsum("lkp,lkd->pld", O, V18)
        Y = Y.reshape(P, L, 6, 3).transpose(0, 2, 1, 3).reshape(P * 6, L * 3)
        S = BD - jnp.dot(Y, Y.T, precision=HI_P)
        rhs = -(bp.reshape(-1) - jnp.dot(Y, z.reshape(-1), precision=HI_P))
    elif variant == "B_direct_pilm":
        Y4 = jnp.einsum("lkp,lkim->pilm", O, V)  # (P, 6, L, 3) directly
        Y = Y4.reshape(P * 6, L * 3)
        S = BD - jnp.dot(Y, Y.T, precision=HI_P)
        rhs = -(bp.reshape(-1) - jnp.dot(Y, z.reshape(-1), precision=HI_P))
    elif variant == "C_einsum_aibj":
        Y4 = jnp.einsum("lkp,lkim->plim", O, V)  # (P, L, 6, 3)
        S = BD - jnp.einsum("alim,bljm->aibj", Y4, Y4,
                            precision=HI_P).reshape(P * 6, P * 6)
        rhs = -(bp.reshape(-1) - jnp.einsum(
            "alim,lm->ai", Y4, z, precision=HI_P).reshape(-1))
    elif variant == "D_default_prec":
        Y = jnp.einsum("lkp,lkd->pld", O, V18)
        Y = Y.reshape(P, L, 6, 3).transpose(0, 2, 1, 3).reshape(P * 6, L * 3)
        S = BD - jnp.dot(Y, Y.T)
        rhs = -(bp.reshape(-1) - jnp.dot(Y, z.reshape(-1)))
    elif variant == "E_barrier":
        Y = jnp.einsum("lkp,lkd->pld", O, V18)
        Y = Y.reshape(P, L, 6, 3).transpose(0, 2, 1, 3).reshape(P * 6, L * 3)
        Y = jax.lax.optimization_barrier(Y)
        S = BD - jnp.dot(Y, Y.T, precision=HI_P)
        rhs = -(bp.reshape(-1) - jnp.dot(Y, z.reshape(-1), precision=HI_P))
    elif variant == "F_lp_layout":
        # Y in (L*3, P*6) layout (landmark-major rows), S = Y^T Y.
        Y4 = jnp.einsum("lkp,lkim->lmpi", O, V)  # (L, 3, P, 6)
        Y = Y4.reshape(L * 3, P * 6)
        S = BD - jnp.dot(Y.T, Y, precision=HI_P)
        rhs = -(bp.reshape(-1) - jnp.dot(z.reshape(-1), Y, precision=HI_P))
    else:
        raise ValueError(variant)

    dxp = sb.solve_pose_system(S, rhs, problem.pose_fixed)
    dxp = jnp.where(problem.pose_fixed[:, None], 0.0, dxp)
    pieces = sb.LocalPieces(S_half=S, bp=bp, rhs_corr=jnp.zeros(P * 6), chi2=chi2,
                            U=U, Minv=Minv, bl=bl)
    dxl = sb.back_substitute(pieces, problem, dxp)
    return jnp.sum(dxp) + jnp.sum(dxl) + chi2


def slope(make_fn, label):
    fns = {n: jax.jit(make_fn(n)) for n in (LO, HI)}
    for n in (LO, HI):
        float(fns[n]())
    times = {}
    for n in (LO, HI):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fns[n]())
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[HI] - times[LO]) / (HI - LO)
    print(f"{label:24s} {per*1e3:9.3f} ms/rep")


def main():
    problem, _ = make_ba_problem(seed=0, P=Pn, L=Ln, stereo_frac=0.6, obs_per_landmark=Kn)
    b = jax.device_put(sb.from_flat(problem, Kn))
    for variant in ["A_transpose", "B_direct_pilm", "C_einsum_aibj",
                    "D_default_prec", "E_barrier", "F_lp_layout"]:
        def mk(n, variant=variant):
            def f():
                def body(c, _):
                    p2 = b._replace(pose_t=b.pose_t + 1e-12 * c)
                    return step(p2, jnp.float32(1e-3), variant), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        slope(mk, variant)


if __name__ == "__main__":
    main()
