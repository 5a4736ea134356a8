"""Small closed-form kernels for the BA engine.

Note on a measured dead end: a full SoA "component form" rewrite of the
edge assembly (every Jacobian entry as its own flat (E,) array instead of
(E, 3, 6) blocks) was implemented and benchmarked on-chip — it made
assembly 3.5x SLOWER (14 ms -> 49 ms at E=786k) and the LM loop ~10x
slower: XLA already lays out and fuses the (E, 3, 6) einsum chain well, and
the ~100 explicitly materialized component arrays defeated its fusion.
Keep the einsum formulation in optim/schur.py; what survives here are the
closed-form helpers that do beat their library counterparts.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv3x3(M):
    """Closed-form batched 3x3 inverse (adjugate/det).

    `jnp.linalg.inv` lowers to an LU path that is slow for large batches of
    tiny matrices inside loops; the adjugate form is pure elementwise math.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E_ = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    idet = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    rows = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E_, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return rows * idet[..., None, None]
