"""In-graph prefix bisection of the bucketed BA step: time the step truncated
after each stage (full-array consumption) — differences = in-graph stage cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import schur_bucketed as sb

P, L, K = 96, 8192, 5
LO, HI = 2, 8
cam = DEFAULT_CAM
mu0 = 1e-3


def step_prefix(problem, mu, stage: int):
    """Replicates sb.build_local_pieces with a cut-off stage."""
    Pn, Ln = problem.num_poses, problem.num_points
    Kn = problem.obs_cam.shape[1]
    r, Jp, Jl, w, chi2, _ = sb._edge_terms(problem, cam, problem.obs_valid, 2.447)
    dtype = r.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    free_pose = (~problem.pose_fixed)[problem.obs_cam]
    Jp = Jp * free_pose[..., None, None].astype(dtype)
    if stage == 0:
        return jnp.sum(r) + jnp.sum(Jp) + jnp.sum(Jl) + jnp.sum(w) + chi2

    Hll = jnp.einsum("lkri,lk,lkrj->lij", Jl, w, Jl)
    bl = jnp.einsum("lkri,lk,lkr->li", Jl, w, r)
    U = jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jl)
    if stage == 1:
        return jnp.sum(Hll) + jnp.sum(bl) + jnp.sum(U) + chi2

    O = jax.nn.one_hot(problem.obs_cam, Pn, dtype=dtype)
    Of = O.reshape(Ln * Kn, Pn)
    Hpp = jnp.einsum("ep,ed->pd", Of,
                     jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jp).reshape(Ln * Kn, 36)
                     ).reshape(Pn, 6, 6)
    bp = jnp.einsum("ep,ei->pi", Of,
                    jnp.einsum("lkri,lk,lkr->lki", Jp, w, r).reshape(Ln * Kn, 6))
    if stage == 2:
        return jnp.sum(Hpp) + jnp.sum(bp) + jnp.sum(U) + jnp.sum(Hll) + jnp.sum(bl) + chi2

    dll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
    Hll_d = Hll + mu * dll[..., None] * eye3 + 1e-8 * eye3
    Hll_d = jnp.where(problem.point_valid[:, None, None], Hll_d, eye3)
    Lc = sb.chol3x3(Hll_d)
    Minv = sb.trinv_lower3x3(Lc)
    V = jnp.einsum("lkim,ljm->lkij", U, Minv)
    if stage == 3:
        return jnp.sum(V) + jnp.sum(Minv) + jnp.sum(Hpp) + jnp.sum(bp) + chi2

    Y = sb._build_Y(V, problem.obs_cam, Pn)
    if stage == 4:
        return jnp.sum(Y) + jnp.sum(Hpp) + jnp.sum(bp) + jnp.sum(Minv) + jnp.sum(bl) + chi2

    dpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp_d = Hpp + mu * dpp[..., None] * eye6 + 1e-8 * eye6
    S = -jnp.dot(Y, Y.T, precision=jax.lax.Precision.HIGHEST)
    S = S + jnp.einsum("pij,pq->piqj", Hpp_d, jnp.eye(Pn, dtype=dtype)).reshape(Pn * 6, Pn * 6)
    z = jnp.einsum("lij,lj->li", Minv, bl)
    rhs = -(bp.reshape(-1) - jnp.dot(Y, z.reshape(-1)))
    if stage == 5:
        return jnp.sum(S) + jnp.sum(rhs) + jnp.sum(Minv) + jnp.sum(bl) + chi2

    dxp = sb.solve_pose_system(S, rhs, problem.pose_fixed)
    dxp = jnp.where(problem.pose_fixed[:, None], 0.0, dxp)
    if stage == 6:
        return jnp.sum(dxp) + jnp.sum(Minv) + jnp.sum(bl) + chi2

    pieces = sb.LocalPieces(S_half=S, bp=bp, rhs_corr=jnp.zeros(Pn * 6), chi2=chi2,
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
    print(f"{label:40s} {per*1e3:9.3f} ms/rep")
    return per


def main():
    problem, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
    b = jax.device_put(sb.from_flat(problem, K))

    names = ["edge terms", "+Hll/bl/U", "+Hpp/bp onehot", "+chol/V", "+Y build",
             "+S/rhs", "+cho_solve", "+backsub (full)"]
    prev = 0.0
    for stage in range(8):
        def mk(n, stage=stage):
            def f():
                def body(c, _):
                    p2 = b._replace(pose_t=b.pose_t + 1e-12 * c)
                    return step_prefix(p2, jnp.float32(mu0), stage), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        t = slope(mk, f"prefix {stage}: {names[stage]}")


if __name__ == "__main__":
    main()
