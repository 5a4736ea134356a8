"""Closed-form 3D-3D alignment (Horn / Umeyama), batched over hypotheses.

Two uses mirroring the reference:
  * `Sim3Solver::ComputeSim3` — Horn's closed-form Sim3/SE3 from 3-point
    minimal sets inside RANSAC (/root/reference/src/algorithm/Sim3Solver.cc:319-460).
    Here the whole hypothesis bank is one batched SVD (vmap-free, pure
    leading-dim broadcasting) instead of a loop.
  * evo-style ATE alignment (`evo ... -as`) for the evaluation harness
    (/root/reference/src/fusionsystem.cc:218-220).
"""

from __future__ import annotations

import jax.numpy as jnp

from .se3 import SE3
from .sim3 import Sim3

_EPS = 1e-9


def umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
) -> Sim3:
    """Weighted Umeyama alignment: find Sim3 S minimizing ||S(src) - dst||^2.

    src, dst: (..., N, 3); weights: (..., N) nonnegative (masks allowed).
    Returns a batched `Sim3` (scale fixed to 1 when ``with_scale=False`` —
    the reference's `bFixScale` stereo/RGBD case, Sim3Solver.cc:433).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), _EPS)

    mu_src = jnp.sum(w[..., None] * src, axis=-2)
    mu_dst = jnp.sum(w[..., None] * dst, axis=-2)
    src_c = src - mu_src[..., None, :]
    dst_c = dst - mu_dst[..., None, :]

    # Weighted covariance: dst_c^T diag(w) src_c, (..., 3, 3).
    cov = jnp.einsum("...ni,...n,...nj->...ij", dst_c, w, src_c)

    U, D, Vt = jnp.linalg.svd(cov)
    # Reflection fix-up (det(U V^T) = -1 case).
    det = jnp.linalg.det(U @ Vt)
    S = jnp.ones(src.shape[:-2] + (3,), dtype=src.dtype)
    S = S.at[..., 2].set(jnp.sign(det))
    R = U @ (S[..., :, None] * Vt)

    if with_scale:
        var_src = jnp.sum(w * jnp.sum(src_c * src_c, axis=-1), axis=-1)
        scale = jnp.sum(D * S, axis=-1) / jnp.maximum(var_src, _EPS)
    else:
        scale = jnp.ones(src.shape[:-2], dtype=src.dtype)

    t = mu_dst - scale[..., None] * jnp.einsum("...ij,...j->...i", R, mu_src)
    return Sim3(scale, R, t)


def se3_horn(src: jnp.ndarray, dst: jnp.ndarray, weights=None) -> SE3:
    """Rigid (scale = 1) Horn alignment, returned as SE3."""
    S = umeyama(src, dst, weights=weights, with_scale=False)
    return SE3(S.R, S.t)


def ate_rmse(est_xyz: jnp.ndarray, gt_xyz: jnp.ndarray, align_scale: bool = True):
    """Absolute trajectory error RMSE after Sim3 (or SE3) alignment.

    Replicates `evo_ape ... -as` used by the reference's evaluation protocol.
    Returns (rmse, aligned_estimate).
    """
    S = umeyama(est_xyz, gt_xyz, with_scale=align_scale)
    aligned = S.s * est_xyz @ S.R.T + S.t
    err = aligned - gt_xyz
    rmse = jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))
    return rmse, aligned
