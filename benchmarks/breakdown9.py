"""Dense reduced-camera-system solve alternatives at P=96 (S is 576x576).

The LM iteration's remaining cost is dominated by the pose solve
(cho_factor + cho_solve ~0.9 ms of a 1.9 ms iteration, breakdown8).
576^3/3 FLOPs is ~0.07 ms of MXU work — the gap is the sequential panel
factorization. Candidates measured here, all CSE-proof slope-timed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

N = 576
rng = np.random.default_rng(0)
A_np = rng.normal(size=(N, N)).astype(np.float32)
S_np = A_np @ A_np.T + N * np.eye(N, dtype=np.float32)
b_np = rng.normal(size=(N,)).astype(np.float32)
S0 = jnp.asarray(S_np)
b0 = jnp.asarray(b_np)


def slope(fn, reps=(2, 16), n_timing=4):
    @jax.jit
    def run(S, b, n):
        def body(_, carry):
            s, SS, bb = carry
            x = fn(SS, bb)
            s = jnp.sum(x[:4])
            eps = 1.0 + jnp.sign(s) * 1e-7
            return s, SS * eps, bb * eps

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), S, b))[0]

    times = {}
    for n in reps:
        nn = jnp.int32(n)
        float(run(S0, b0, nn))
        best = 1e9
        for _ in range(n_timing):
            t0 = time.perf_counter()
            float(run(S0, b0, nn))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = reps
    return (times[n1] - times[n0]) / (n1 - n0) * 1e3


def f_cho(S, b):
    return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b)


def f_lusolve(S, b):
    return jnp.linalg.solve(S, b)


def f_chol_tri(S, b):
    Lc = jnp.linalg.cholesky(S)
    y = jax.lax.linalg.triangular_solve(
        Lc, b[:, None], left_side=True, lower=True
    )
    x = jax.lax.linalg.triangular_solve(
        Lc, y, left_side=True, lower=True, transpose_a=True
    )
    return x[:, 0]


def f_inv(S, b):
    return jnp.linalg.inv(S) @ b


def make_cg(iters):
    def f_cg(S, b):
        d = jnp.diagonal(S)
        pre = 1.0 / d

        def body(_, carry):
            x, r, p, rz = carry
            Ap = S @ p
            alpha = rz / jnp.maximum(jnp.dot(p, Ap), 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            z = pre * r
            rz_new = jnp.dot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return x, r, z + beta * p, rz_new

        x0 = jnp.zeros_like(b)
        z0 = pre * b
        out = jax.lax.fori_loop(0, iters, body, (x0, b, z0, jnp.dot(b, z0)))
        return out[0]

    return f_cg


print(f"device={jax.devices()[0].platform}, N={N}")
print(f"cho_factor+cho_solve : {slope(f_cho):7.3f} ms")
print(f"jnp.linalg.solve     : {slope(f_lusolve):7.3f} ms")
print(f"cholesky+2 trisolve  : {slope(f_chol_tri):7.3f} ms")
print(f"inv @ b              : {slope(f_inv):7.3f} ms")
print(f"jacobi-CG 40 iters   : {slope(make_cg(40)):7.3f} ms")

# accuracy check of CG at 40 iters
x_ref = np.linalg.solve(S_np, b_np)
x_cg = np.asarray(jax.jit(make_cg(40))(S0, b0))
print("cg rel err:", float(np.linalg.norm(x_cg - x_ref) / np.linalg.norm(x_ref)))
