"""Measure the S-einsum precision tradeoff on-chip.

The Schur product S = Y @ Y^T ('alim,bljm->aibj') currently runs at
Precision.HIGHEST (f32 emulation: ~6x MXU passes). In sqrt form the
product is well-conditioned and the LM loop gates every step by chi2,
so DEFAULT (bf16 inputs, f32 accumulate) may be acceptable. Slope-time
the einsum at each precision and check ba_iterate convergence.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import schur_bucketed

P, L, K = 96, 8192, 5


def slope(fn, *args):
    def rep(n):
        @jax.jit
        def f(a):
            s = jnp.float32(0.0)
            for _ in range(n):
                out = fn(a)
                s = s + jnp.sum(out)
                # serialize: next call depends on prev (big enough to
                # survive a bf16 cast, small enough not to change timing)
                a = a * (1.0 + jnp.sign(s) * 0.004)
            return s

        float(f(*args))  # compile+run
        best = float("inf")
        for _ in range(5):
            t = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t)
        return best

    t2, t16 = rep(2), rep(16)
    return (t16 - t2) / 14


key = jax.random.PRNGKey(0)
Y = jax.random.normal(key, (P, L, 6, 3), jnp.float32)

for name, prec, cast in [
    ("HIGHEST f32", jax.lax.Precision.HIGHEST, None),
    ("DEFAULT f32in", jax.lax.Precision.DEFAULT, None),
    ("bf16 in", jax.lax.Precision.DEFAULT, jnp.bfloat16),
]:
    def s_ein(Y, prec=prec, cast=cast):
        Yc = Y.astype(cast) if cast else Y
        return jnp.einsum(
            "alim,bljm->aibj", Yc, Yc, precision=prec,
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)

    dt = slope(s_ein, Y)
    print(f"S einsum [{name}]: {dt*1e3:.2f} ms")

# Convergence check: full 15-iteration LM at each precision, final chi2.
flat, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
prob = schur_bucketed.from_flat(flat, K)


def run(prob):
    @jax.jit
    def step(p):
        out, chi2, acc = schur_bucketed.ba_iterate(
            p, DEFAULT_CAM, p.obs_valid, 15, robust_delta=2.447
        )
        return out, chi2

    out, chi2 = step(prob)
    return float(chi2)


print("chi2 after 15 iters (current engine):", run(prob))
