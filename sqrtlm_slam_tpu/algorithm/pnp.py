"""Robust camera-pose estimation from 2D/3D matches — RANSAC, batched.

TPU-native replacement of `PnPsolver` (EPnP + RANSAC,
/root/reference/src/algorithm/PnPsolver.cc:247-1491), used by
relocalization (Tracking.cc:2334-2554) and as the no-prior fallback in
tracking. Two estimators:

  * `ransac_pose_3d3d` — when the frame keypoint carries (LiDAR/stereo)
    depth, each match is a 3D-3D pair (backprojected camera point vs
    landmark world point) and the minimal solver is Horn's closed form —
    strictly stronger than EPnP's 2D-3D geometry and a single batched SVD
    for the whole hypothesis bank (SURVEY §7.0: vmapped RANSAC).
  * verification is the reference's reprojection chi2 gate (9.21 at 0.01),
    followed by a least-squares refit on the consensus set.

The sequential `iterate()` loop of the reference becomes one device
computation over H hypotheses — no host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors.reprojection import Camera
from ..geometry import align, se3

CHI2_PNP = 9.210  # reference PnP/Sim3 inlier gate (chi2 2-dof @ 0.01)


class PnPResult(NamedTuple):
    pose: se3.SE3  # T_cw
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # ()


@functools.partial(jax.jit, static_argnames=("cam", "num_hypotheses"))
def ransac_pose_3d3d(
    key: jnp.ndarray,
    points_w: jnp.ndarray,  # (N, 3) landmark world positions
    points_c: jnp.ndarray,  # (N, 3) backprojected camera-frame points
    uv: jnp.ndarray,  # (N, 2) observed pixels (for the inlier gate)
    valid: jnp.ndarray,  # (N,) bool
    inv_sigma2: jnp.ndarray,  # (N,)
    cam: Camera,
    num_hypotheses: int = 256,
) -> PnPResult:
    """Estimate T_cw with points_c ~ T_cw * points_w; batched-hypothesis
    RANSAC with reprojection verification + consensus refit."""
    N = points_w.shape[0]
    H = num_hypotheses

    g = jax.random.gumbel(key, (H, N))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, sel = jax.lax.top_k(g, 3)  # (H, 3) minimal sets

    T_h = align.umeyama(points_w[sel], points_c[sel], with_scale=False)  # Sim3 s=1
    # Reprojection gate per hypothesis.
    x_c = (
        jnp.einsum("hij,nj->hni", T_h.R, points_w) + T_h.t[:, None, :]
    )  # (H, N, 3)
    e2 = jnp.sum((cam.project(x_c) - uv[None]) ** 2, axis=-1) * inv_sigma2[None]
    ok = (e2 < CHI2_PNP) & valid[None] & (x_c[..., 2] > 0.1)
    counts = jnp.sum(ok, axis=-1)

    best = jnp.argmax(counts)
    inliers = ok[best]

    # Consensus refit (weighted Horn on all inliers).
    w = inliers.astype(points_w.dtype)
    T_fit = align.umeyama(points_w, points_c, weights=w, with_scale=False)
    x_cf = jnp.einsum("ij,nj->ni", T_fit.R, points_w) + T_fit.t
    e2f = jnp.sum((cam.project(x_cf) - uv) ** 2, axis=-1) * inv_sigma2
    in_f = (e2f < CHI2_PNP) & valid & (x_cf[..., 2] > 0.1)
    use_fit = jnp.sum(in_f) >= jnp.sum(inliers)

    R_best = jnp.where(use_fit, T_fit.R, T_h.R[best])
    t_best = jnp.where(use_fit, T_fit.t, T_h.t[best])
    inl = jnp.where(use_fit, in_f, inliers)
    return PnPResult(
        pose=se3.SE3(R_best, t_best), inliers=inl, num_inliers=jnp.sum(inl)
    )
