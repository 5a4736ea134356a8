"""Constant-velocity Kalman filter (position smoothing / prediction).

Parity with the reference's declared-but-barely-used 6-state KF
(/root/reference/include/utils/KalmanFilter.h:8-29). Useful as a motion
prior for tracking prediction when IMU/odometry is absent. Batched and
jittable (pure-function update).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class KFState(NamedTuple):
    x: jnp.ndarray  # (6,) [pos(3), vel(3)]
    P: jnp.ndarray  # (6, 6) covariance


def init(pos: jnp.ndarray, pos_var: float = 1.0, vel_var: float = 1.0) -> KFState:
    x = jnp.concatenate([pos, jnp.zeros(3, dtype=pos.dtype)])
    P = jnp.diag(jnp.concatenate([jnp.full(3, pos_var), jnp.full(3, vel_var)]))
    return KFState(x=x, P=P.astype(pos.dtype))


def predict(s: KFState, dt: float, accel_var: float = 1.0) -> KFState:
    F = jnp.eye(6, dtype=s.x.dtype)
    F = F.at[:3, 3:].set(dt * jnp.eye(3, dtype=s.x.dtype))
    # Discrete white-accel process noise.
    q11 = 0.25 * dt**4
    q12 = 0.5 * dt**3
    q22 = dt**2
    Q = jnp.block(
        [
            [q11 * jnp.eye(3), q12 * jnp.eye(3)],
            [q12 * jnp.eye(3), q22 * jnp.eye(3)],
        ]
    ).astype(s.x.dtype) * accel_var
    x = F @ s.x
    P = F @ s.P @ F.T + Q
    return KFState(x=x, P=P)


def update(s: KFState, z: jnp.ndarray, meas_var: float = 0.01) -> KFState:
    """Position measurement z (3,)."""
    H = jnp.zeros((3, 6), dtype=s.x.dtype).at[:, :3].set(jnp.eye(3, dtype=s.x.dtype))
    S = H @ s.P @ H.T + meas_var * jnp.eye(3, dtype=s.x.dtype)
    K = s.P @ H.T @ jnp.linalg.inv(S)
    x = s.x + K @ (z - H @ s.x)
    P = (jnp.eye(6, dtype=s.x.dtype) - K @ H) @ s.P
    return KFState(x=x, P=P)


def step(s: KFState, z: jnp.ndarray, dt: float, accel_var=1.0, meas_var=0.01) -> KFState:
    return update(predict(s, dt, accel_var), z, meas_var)
