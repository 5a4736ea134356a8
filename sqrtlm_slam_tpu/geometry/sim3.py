"""Batched Sim(3) similarity transforms in JAX.

Used by loop closing: Sim3 candidate verification (reference
`Sim3Solver`, /root/reference/src/algorithm/Sim3Solver.cc:319-460) and the
7-DoF essential-graph optimization
(/root/reference/src/backend/g2oOptimizer.cc:1212-1560, g2o `sim3.h`).

Storage: ``(s, R, t)`` with scalar scale ``s (...)``, rotation ``(..., 3, 3)``
and translation ``(..., 3)``; action is ``x -> s * R @ x + t``. Tangent is a
7-vector ``[rho(3), phi(3), sigma(1)]`` with ``s = exp(sigma)``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import se3, so3

_EPS = 1e-8


class Sim3(NamedTuple):
    s: jnp.ndarray  # (...)
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)


def identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> Sim3:
    return Sim3(
        jnp.ones(batch_shape, dtype=dtype),
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
        jnp.zeros(batch_shape + (3,), dtype=dtype),
    )


def from_se3(T: se3.SE3, s=None) -> Sim3:
    if s is None:
        s = jnp.ones(T.t.shape[:-1], dtype=T.t.dtype)
    return Sim3(s, T.R, T.t)


def to_se3(S: Sim3) -> se3.SE3:
    """Drop the scale by folding it into the translation: t <- t / s.

    Matches the reference's conversion of a corrected Sim3 keyframe pose back
    to SE3 after essential-graph optimization
    (`g2oOptimizer.cc:1515-1530`: `t / s`, R kept).
    """
    return se3.SE3(S.R, S.t / jnp.maximum(S.s[..., None], _EPS))


def act(S: Sim3, x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim >= 2 and S.t.ndim < x.ndim:
        return (
            S.s[..., None, None] * jnp.einsum("...ij,...nj->...ni", S.R, x)
            + S.t[..., None, :]
        )
    return S.s[..., None] * jnp.einsum("...ij,...j->...i", S.R, x) + S.t


def compose(a: Sim3, b: Sim3) -> Sim3:
    s = a.s * b.s
    R = a.R @ b.R
    t = a.s[..., None] * jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return Sim3(s, R, t)


def inverse(S: Sim3) -> Sim3:
    sinv = 1.0 / jnp.maximum(S.s, _EPS)
    Rinv = jnp.swapaxes(S.R, -1, -2)
    tinv = -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rinv, S.t)
    return Sim3(sinv, Rinv, tinv)


def _W_matrix(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) 'W' matrix coupling translation with rotation+scale.

    ``W = A*hat(phi) + B*hat(phi)^2 + C*I`` with the coefficient scheme of
    Strasdat's thesis (same four regimes as g2o's ``sim3.h`` constructor:
    {sigma, theta} each near/away from zero), written branch-free with
    `jnp.where` so it is jit/vmap-safe.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5
    sig = jnp.where(small_sigma, 1.0, sigma)  # safe denominators
    th = jnp.where(small_theta, 1.0, theta)
    th2 = jnp.where(small_theta, 1.0, theta2)

    # C multiplies the identity.
    C = jnp.where(small_sigma, 1.0 + 0.5 * sigma, (s - 1.0) / sig)

    # sigma ~ 0 regime (plain SO(3) left-Jacobian coefficients):
    A_s0 = jnp.where(small_theta, 0.5 - theta2 / 24.0, (1.0 - cos_t) / th2)
    B_s0 = jnp.where(small_theta, 1.0 / 6.0 - theta2 / 120.0, (theta - sin_t) / (th2 * th))

    # theta ~ 0, sigma general:
    A_t0 = ((sigma - 1.0) * s + 1.0) / (sig * sig)
    B_t0 = (s * (0.5 * sigma * sigma - sigma + 1.0) - 1.0) / (sig * sig * sig)

    # general regime:
    a = s * sin_t
    b = s * cos_t
    c = theta2 + sigma * sigma
    c_safe = jnp.where(small_theta & small_sigma, 1.0, c)
    A_gen = (a * sigma + (1.0 - b) * theta) / (th * c_safe)
    B_gen = (C - ((b - 1.0) * sigma + a * theta) / c_safe) / th2

    A = jnp.where(small_sigma, A_s0, jnp.where(small_theta, A_t0, A_gen))
    B = jnp.where(small_sigma, B_s0, jnp.where(small_theta, B_t0, B_gen))

    Phi = so3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return A[..., None, None] * Phi + B[..., None, None] * (Phi @ Phi) + C[..., None, None] * eye


def exp(xi: jnp.ndarray) -> Sim3:
    """Exponential map sim(3) -> Sim(3); ``xi = [rho, phi, sigma]`` (..., 7)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3.exp(phi)
    W = _W_matrix(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return Sim3(s, R, t)


def log(S: Sim3) -> jnp.ndarray:
    """Logarithm map Sim(3) -> sim(3), (..., 7) ``[rho, phi, sigma]``."""
    sigma = jnp.log(jnp.maximum(S.s, _EPS))
    phi = so3.log(S.R)
    W = _W_matrix(phi, sigma)
    rho = jnp.linalg.solve(W, S.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def retract(S: Sim3, delta: jnp.ndarray) -> Sim3:
    """Left-multiplicative update ``exp(delta) ∘ S`` (7-dim tangent)."""
    return compose(exp(delta), S)
