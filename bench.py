"""Headline benchmark: local-BA LM iterations/second on the Schur engine.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} plus
auxiliary metrics on stderr. The problem size mirrors the reference's local
BA regime (~10^2 poses, ~10^4 landmarks, ~10^4+ observation edges,
/root/reference/src/backend/g2oOptimizer.cc:704-1191; SURVEY.md §3.2 calls
it the hottest backend loop).

Baseline: the reference publishes no numbers (BASELINE.md). `BASELINE_ITERS_S`
is the reference-regime estimate recorded there: g2o local BA at this scale
runs ~15 LM iterations in ~200-400 ms on a desktop CPU => ~50 iters/s.
vs_baseline = value / 50.
"""

from __future__ import annotations

import json
import sys
import time

import jax
from sqrtlm_slam_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, make_ba_problem
from sqrtlm_slam_tpu.optim import schur, schur_bucketed

BASELINE_ITERS_S = 50.0

# Reference local-BA regime: ~10^2 poses, ~10^4 landmarks, ~10^4+ edges with
# sparse covisibility (SURVEY.md §3.2 — each landmark is seen by a handful
# of consecutive keyframes, NOT by every pose).
P, L, OBS_PER_LM = 96, 8192, 5
ITERS_PER_CALL = 15


def main():
    flat, _ = make_ba_problem(
        seed=0, P=P, L=L, stereo_frac=0.6, obs_per_landmark=OBS_PER_LM
    )
    # Landmark-bucketed engine (optim/schur_bucketed.py): same LM protocol,
    # scatter-free assembly — measured ~4x the flat engine on-chip.
    problem = schur_bucketed.from_flat(flat, OBS_PER_LM)

    @jax.jit
    def ba_step(prob):
        out, chi2, acc = schur_bucketed.ba_iterate(
            prob, DEFAULT_CAM, prob.obs_valid, ITERS_PER_CALL, robust_delta=2.447
        )
        return out, chi2

    chi2_0 = float(
        jax.jit(lambda p: schur_bucketed.chi2_only(p, DEFAULT_CAM, p.obs_valid, None))(problem)
    )

    # Warm-up (compile). float() forces a host round-trip — on the remote
    # axon platform block_until_ready alone does not synchronize.
    out, chi2 = ba_step(problem)
    float(chi2)

    # Methodology (recorded since r2, ADVICE r1): the headline metric is
    # SUSTAINED throughput — calls are chained (each solve consumes the
    # previous solution, like consecutive local-BA invocations in the
    # pipeline) and the host syncs ONCE at the end, because the per-dispatch
    # tunnel RTT (~35 ms on axon) otherwise dominates and measures the link,
    # not the chip. A per-call-synced number (r1-pre-9998d80 methodology) is
    # also printed on stderr so both series stay comparable.
    n_calls = 5
    t0 = time.perf_counter()
    out = problem
    for _ in range(n_calls):
        out, chi2 = ba_step(out)
    last = float(chi2)
    dt = time.perf_counter() - t0

    t1 = time.perf_counter()
    out2, chi2_pc = ba_step(problem)
    float(chi2_pc)
    dt_percall = time.perf_counter() - t1
    print(
        json.dumps(
            {
                "metric": "local_ba_lm_iters_per_s_percall_synced",
                "value": round(ITERS_PER_CALL / dt_percall, 2),
                "unit": "iters/s",
                "note": "one dispatch + host sync per call (r1 methodology)",
            }
        ),
        file=sys.stderr,
    )

    iters_s = n_calls * ITERS_PER_CALL / dt
    edges = int(problem.obs_valid.sum())
    print(
        f"[bench] device={jax.devices()[0].platform} poses={P} landmarks={L} "
        f"edges={edges} {n_calls}x{ITERS_PER_CALL} LM iters in {dt:.3f}s "
        f"chi2 {chi2_0:.1f} -> {last:.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "local_ba_lm_iters_per_s",
                "value": round(iters_s, 2),
                "unit": "iters/s",
                "vs_baseline": round(iters_s / BASELINE_ITERS_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
