"""Sub-piece timing of the bucketed BA step (see breakdown.py for method)."""

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


def slope(make_fn, label):
    fns = {n: jax.jit(make_fn(n)) for n in (LO, HI)}
    for n in (LO, HI):
        float(jnp.sum(fns[n]()))
    times = {}
    for n in (LO, HI):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(jnp.sum(fns[n]()))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[HI] - times[LO]) / (HI - LO)
    print(f"{label:44s} {per*1e3:9.3f} ms/rep")
    return per


def main():
    problem, _ = make_ba_problem(seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=K)
    b = jax.device_put(sb.from_flat(problem, K))
    cam = DEFAULT_CAM
    active = b.obs_valid
    mu = jnp.float32(1e-3)

    # Precompute edge terms once (for isolating downstream pieces).
    def terms(p):
        r, Jp, Jl, w, chi2, _ = sb._edge_terms(p, cam, active, 2.447)
        free_pose = (~p.pose_fixed)[p.obs_cam]
        Jp = Jp * free_pose[..., None, None].astype(r.dtype)
        return r, Jp, Jl, w
    r, Jp, Jl, w = jax.jit(terms)(b)

    def mk_terms(n):
        def f():
            def body(c, _):
                p2 = b._replace(pose_t=b.pose_t + 1e-12 * c)
                r, Jp, Jl, w = terms(p2)
                return jnp.sum(r) + jnp.sum(Jp) + jnp.sum(Jl) + jnp.sum(w), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_terms, "edge terms (r,Jp,Jl,w)")

    def mk_lmred(n):
        def f():
            def body(c, _):
                Jl2 = Jl + 1e-12 * c
                Hll = jnp.einsum("lkri,lk,lkrj->lij", Jl2, w, Jl2)
                bl = jnp.einsum("lkri,lk,lkr->li", Jl2, w, r)
                U = jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jl2)
                return jnp.sum(Hll) + jnp.sum(bl) + jnp.sum(U), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_lmred, "Hll/bl/U einsums")

    Hll = jnp.einsum("lkri,lk,lkrj->lij", Jl, w, Jl)
    U = jnp.einsum("lkri,lk,lkrj->lkij", Jp, w, Jl)
    eye3 = jnp.eye(3)
    dll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
    Hll_d = jnp.where(b.point_valid[:, None, None],
                      Hll + mu * dll[..., None] * eye3 + 1e-8 * eye3, eye3)
    Minv = jax.jit(lambda M: sb.trinv_lower3x3(sb.chol3x3(M)))(Hll_d)
    V = jnp.einsum("lkim,ljm->lkij", U, Minv)

    def mk_chol(n):
        def f():
            def body(c, _):
                M2 = Hll_d + 1e-12 * c
                Mi = sb.trinv_lower3x3(sb.chol3x3(M2))
                V2 = jnp.einsum("lkim,ljm->lkij", U, Mi)
                return jnp.sum(V2) + jnp.sum(Mi), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_chol, "chol3x3+trinv+V")

    V18 = V.reshape(L, K, 18)

    def mk_y_onehot(n):
        def f():
            def body(c, _):
                O = jax.nn.one_hot(b.obs_cam, P, dtype=V18.dtype)
                Y = jnp.einsum("lkp,lkd->pld", O, V18 + 1e-12 * c)
                return jnp.sum(Y), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_y_onehot, "Y build: onehot einsum")

    def mk_y_bcast(n):
        def f():
            def body(c, _):
                mask = (b.obs_cam[:, :, None] == jnp.arange(P)[None, None, :])
                Y = jnp.sum(mask[..., None] * (V18 + 1e-12 * c)[:, :, None, :], axis=1)
                return jnp.sum(Y), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_y_bcast, "Y build: broadcast-compare sum")

    def mk_y_scatk(n):
        def f():
            def body(c, _):
                Y = jnp.zeros((L, P, 18))
                for k in range(K):
                    Y = Y.at[jnp.arange(L), b.obs_cam[:, k], :].add(V18[:, k, :] + 1e-12 * c)
                return jnp.sum(Y), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_y_scatk, "Y build: K batched scatters")

    # Downstream: S matmul + transpose path.
    O = jax.nn.one_hot(b.obs_cam, P, dtype=V18.dtype)
    Ypld = jnp.einsum("lkp,lkd->pld", O, V18)

    def mk_s(n):
        def f():
            def body(c, _):
                Y2 = (Ypld + 1e-12 * c).reshape(P, L, 6, 3).transpose(0, 2, 1, 3).reshape(P * 6, L * 3)
                S = jnp.dot(Y2, Y2.T, precision=jax.lax.Precision.HIGHEST)
                return jnp.sum(S), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_s, "transpose + S = Y Y^T")

    cam_flat = b.obs_cam.reshape(-1)

    def mk_hpp(n):
        def f():
            def body(c, _):
                Jp2 = Jp + 1e-12 * c
                Hpp = jax.ops.segment_sum(
                    jnp.einsum("lkri,lk,lkrj->lkij", Jp2, w, Jp2).reshape(L * K, 6, 6),
                    cam_flat, num_segments=P)
                bp = jax.ops.segment_sum(
                    jnp.einsum("lkri,lk,lkr->lki", Jp2, w, r).reshape(L * K, 6),
                    cam_flat, num_segments=P)
                return jnp.sum(Hpp) + jnp.sum(bp), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_hpp, "Hpp/bp segment sums (P segs)")

    def mk_hpp_oh(n):
        def f():
            def body(c, _):
                Jp2 = Jp + 1e-12 * c
                Of = jax.nn.one_hot(cam_flat, P, dtype=r.dtype)  # (LK, P)
                Hpp = jnp.einsum("ep,eij->pij",
                                 Of, jnp.einsum("lkri,lk,lkrj->lkij", Jp2, w, Jp2).reshape(L * K, 6, 6))
                bp = jnp.einsum("ep,ei->pi",
                                Of, jnp.einsum("lkri,lk,lkr->lki", Jp2, w, r).reshape(L * K, 6))
                return jnp.sum(Hpp) + jnp.sum(bp), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    slope(mk_hpp_oh, "Hpp/bp one-hot matmul")


if __name__ == "__main__":
    main()
