"""Measure next-round optimization candidates for the bucketed engine.

Candidates (PERF.md "known headroom"):
  1. Build Y in bf16 (halves HBM traffic of the S product's dominant read).
  2. Single edge pass per LM iteration (fold the candidate chi2 evaluation's
     residual pass into the next iteration's linearization by carrying edge
     terms through the scan).
  3. Dense 576x576 cho_solve cost (Pallas blocked Cholesky candidate).

Each piece slope-timed on-chip (N=2 vs N=16 reps inside one jit).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import schur_bucketed as sb

P, L, K = 96, 8192, 5
cam = DEFAULT_CAM


def slope(fn, *args, reps=(2, 16)):
    @jax.jit
    def f(args, n):
        def body(_, carry):
            s, a = carry
            out = fn(*a)
            s = s + jnp.sum(ravel_pytree(out)[0][:8])
            # serialize: perturb first leaf by a data-dependent epsilon
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
mu = jnp.float32(1e-3)

# --- 1. full reduce_and_solve (current) ------------------------------------
dt = slope(
    lambda R, t, X: sb.reduce_and_solve(
        prob._replace(pose_R=R, pose_t=t, points=X), cam, prob.obs_valid, 2.447, mu
    )[:3],
    prob.pose_R, prob.pose_t, prob.points,
)
print(f"reduce_and_solve (current): {dt*1e3:.2f} ms")

# --- 2. chi2_only pass ------------------------------------------------------
dt = slope(
    lambda X: sb.chi2_only(prob._replace(points=X), cam, prob.obs_valid, 2.447),
    prob.points,
)
print(f"chi2_only: {dt*1e3:.2f} ms")

# --- 3. build_local_pieces only (no solve) ---------------------------------
dt = slope(
    lambda X: sb.build_local_pieces(
        prob._replace(points=X), cam, prob.obs_valid, 2.447, mu
    )[:4],
    prob.points,
)
print(f"build_local_pieces: {dt*1e3:.2f} ms")

# --- 4. bf16-Y variant of the S product ------------------------------------
pieces = jax.jit(
    lambda p: sb.build_local_pieces(p, cam, p.obs_valid, 2.447, mu)
)(prob)
U, Minv = pieces.U, pieces.Minv


def s_from_U_f32(U, Minv):
    V = jnp.einsum("lkim,ljm->lkij", U, Minv)
    O = jax.nn.one_hot(prob.obs_cam, P, dtype=V.dtype)
    Y = jnp.einsum("lkp,lkim->plim", O, V)
    return jnp.einsum("alim,bljm->aibj", Y, Y,
                      precision=jax.lax.Precision.DEFAULT)


def s_from_U_bf16(U, Minv):
    V = jnp.einsum("lkim,ljm->lkij", U, Minv).astype(jnp.bfloat16)
    O = jax.nn.one_hot(prob.obs_cam, P, dtype=jnp.bfloat16)
    Y = jnp.einsum("lkp,lkim->plim", O, V)
    return jnp.einsum("alim,bljm->aibj", Y, Y,
                      preferred_element_type=jnp.float32)


dt = slope(s_from_U_f32, U, Minv)
print(f"V+Y+S (f32 Y, DEFAULT): {dt*1e3:.2f} ms")
dt = slope(s_from_U_bf16, U, Minv)
print(f"V+Y+S (bf16 Y): {dt*1e3:.2f} ms")

s32 = jax.jit(s_from_U_f32)(U, Minv)
s16 = jax.jit(s_from_U_bf16)(U, Minv)
rel = float(jnp.linalg.norm(s16 - s32) / jnp.linalg.norm(s32))
print(f"bf16-Y rel error vs f32-DEFAULT: {rel:.2e}")

# --- 5. dense solve ---------------------------------------------------------
S = jnp.eye(P * 6, dtype=jnp.float32) * 10.0 + jax.random.normal(
    jax.random.PRNGKey(0), (P * 6, P * 6)
) * 0.01
S = S @ S.T
rhs = jax.random.normal(jax.random.PRNGKey(1), (P * 6,))
dt = slope(
    lambda S, rhs: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), rhs),
    S, rhs,
)
print(f"cho_factor+solve 576: {dt*1e3:.2f} ms")
