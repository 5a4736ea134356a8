"""On-chip timing: Pallas assembly kernel vs the XLA front-end reductions.

Compares optim/assembly_pallas.assemble against the XLA edge-terms +
K-reduction + one-hot pose-reduction chain at the bench shape
(P=96, L=8192, K=5), plus a full build_local_pieces comparison when the
kernel feeds the sqrt-Schur tail.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import assembly_pallas, schur_bucketed as sb

P, L, K = 96, 8192, 5
cam = DEFAULT_CAM
DELTA = 2.447


def slope(fn, *args, reps=(2, 16)):
    @jax.jit
    def f(args, n):
        def body(_, carry):
            s, a = carry
            out = fn(*a)
            s = s + jnp.sum(ravel_pytree(out)[0][:8])
            leaves, tree = jax.tree.flatten(a)
            leaves = [
                (leaves[0] * (1.0 + jnp.sign(s) * 1e-6)).astype(leaves[0].dtype)
            ] + leaves[1:]
            return s, jax.tree.unflatten(tree, leaves)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), args))[0]

    def rep(n):
        n = jnp.int32(n)
        float(f(args, n))
        best = float("inf")
        for _ in range(4):
            t = time.perf_counter()
            float(f(args, n))
            best = min(best, time.perf_counter() - t)
        return best

    t2, t16 = rep(reps[0]), rep(reps[1])
    return (t16 - t2) / (reps[1] - reps[0])


flat, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
prob = sb.from_flat(flat, K)
w_active = prob.obs_inv_sigma2 * prob.obs_valid.astype(jnp.float32)


def xla_front(X):
    p = prob._replace(points=X)
    r, Jp, Jl, w, chi2, _ = sb._edge_terms(p, cam, p.obs_valid, DELTA)
    free = (~p.pose_fixed)[p.obs_cam]
    Jp = Jp * free[..., None, None].astype(r.dtype)
    Hll = jnp.einsum("lkri,lk,lkrj->lij", Jl, w, Jl)
    bl = jnp.einsum("lkri,lk,lkr->li", Jl, w, r)
    U = jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jl)
    O = jax.nn.one_hot(p.obs_cam, P, dtype=r.dtype).reshape(L * K, P)
    Hpp = jnp.einsum(
        "ep,ed->pd", O,
        jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jp).reshape(L * K, 36),
    ).reshape(P, 6, 6)
    bp = jnp.einsum(
        "ep,ei->pi", O,
        jnp.einsum("lkri,lk,lkr->lki", Jp, w, r).reshape(L * K, 6),
    )
    return Hll, bl, U, Hpp, bp, chi2


def pallas_front(X):
    return assembly_pallas.assemble(
        prob.pose_R, prob.pose_t, ~prob.pose_fixed, X, prob.obs_cam,
        prob.obs_uvr, w_active,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
        robust_delta=DELTA,
    )


# Correctness on-chip first.
a = jax.jit(xla_front)(prob.points)
b = jax.jit(pallas_front)(prob.points)
import numpy as np
for name, x, y in zip(["Hll", "bl", "U", "Hpp", "bp", "chi2"], a, b):
    err = float(
        jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y)))
        / (1.0 + float(jnp.max(jnp.abs(jnp.asarray(x)))))
    )
    print(f"  {name}: max rel-ish err {err:.2e}")

dt = slope(xla_front, prob.points)
print(f"XLA front-end: {dt*1e3:.2f} ms")
dt = slope(pallas_front, prob.points)
print(f"Pallas front-end: {dt*1e3:.2f} ms")
