"""Kalman-filter state estimation variants (kf_enabled=True path).

Pure-function re-design of the reference's two Kalman filters
(scripts/Estimator.py:8-181):

  * `KFilter` — 6-state (base position + linear velocity) filter with
    identity observation, constant Q = 1000 I and R = I
    (scripts/Estimator.py:8-86). Kept for parity/test coverage; the
    reference never wires it into run_filter.
  * `KFilterBis` — 18-state filter (IMU world position, IMU world linear
    velocity, 4 world foot positions) with 16 measurements (4 x relative
    IMU-to-foot position in world axes + 4 foot heights), contact-gated
    measurement/process noise (updateCoeffs, scripts/Estimator.py:166-181),
    prediction driven by the world-frame IMU acceleration
    (scripts/Estimator.py:561-580). This is the filter selected by
    `kf_enabled` (scripts/Estimator.py:269-285).

All matrices are fixed-shape; the contact gating is branch-free
(jnp.where on the per-foot trust), so both filters jit and vmap.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config

# KFilterBis tuning parameters (scripts/Estimator.py:131-136)
SIGMA_KIN = 0.1
SIGMA_H = 1.0
SIGMA_A = 0.1
SIGMA_DP = 0.1
GAMMA = 30.0
TRUST_SWING = 0.01


# ----------------------------------------------------------------------
# 6-state filter (KFilter)
# ----------------------------------------------------------------------

class KF6State(NamedTuple):
    X: jnp.ndarray   # (6,) [pos; vel]
    P: jnp.ndarray   # (6, 6)


def kf6_init(dtype=jnp.float32) -> KF6State:
    return KF6State(X=jnp.zeros(6, dtype), P=jnp.eye(6, dtype=dtype))


def kf6_matrices(dt: float):
    """A, B, Q, R of the reference KFilter (scripts/Estimator.py:13-43)."""
    A = np.eye(6)
    A[0:3, 3:6] = dt * np.eye(3)
    B = np.zeros((6, 3))
    B[0:3, :] = 0.5 * dt * dt * np.eye(3)
    B[3:6, :] = dt * np.eye(3)
    Q = 1000.0 * np.eye(6)
    R = np.eye(6)
    return A, B, Q, R


def kf6_step(dt: float, state: KF6State, accel, meas) -> KF6State:
    """predict(U=accel) then correct(Z=meas) (scripts/Estimator.py:71-86)."""
    dtype = state.X.dtype
    A, B, Q, R = (jnp.asarray(m, dtype) for m in kf6_matrices(dt))
    X = A @ state.X + B @ accel
    P = A @ state.P @ A.T + Q
    S = P + R                                  # H = I
    K = P @ jnp.linalg.inv(S)
    X = X + K @ (meas - X)
    P = P - K @ P
    return KF6State(X=X, P=P)


# ----------------------------------------------------------------------
# 18-state filter (KFilterBis)
# ----------------------------------------------------------------------

class KF18State(NamedTuple):
    X: jnp.ndarray   # (18,) [imu pos; imu vel; foot0..3 pos] world frame
    P: jnp.ndarray   # (18, 18)


def kf18_init(h_init: float, dtype=jnp.float32) -> KF18State:
    """X starts at [0, 0, h_init] (scripts/Estimator.py:285)."""
    X = jnp.zeros(18, dtype).at[2].set(jnp.asarray(h_init, dtype))
    return KF18State(X=X, P=jnp.eye(18, dtype=dtype))


def _kf18_const(dt: float):
    """A, B, H of KFilterBis (scripts/Estimator.py:95-112)."""
    A = np.eye(18)
    A[0:3, 3:6] = dt * np.eye(3)
    B = np.zeros((18, 3))
    B[0:3, :] = 0.5 * dt * dt * np.eye(3)
    B[3:6, :] = dt * np.eye(3)
    H = np.zeros((16, 18))
    for i in range(4):
        for j in range(3):
            H[3 * i + j, j] = 1.0
            H[3 * i + j, j + 6 + 3 * i] = -1.0
        H[12 + i, 6 + 3 * i + 2] = 1.0
    return A, B, H


def kf18_noise(dt: float, feet_status, dtype):
    """Contact-gated R (16, 16) and Q (18, 18) diagonals
    (updateCoeffs, scripts/Estimator.py:166-181)."""
    trust = jnp.where(feet_status > 0, 1.0, TRUST_SWING).astype(dtype)
    r_kin = SIGMA_KIN ** 2 / trust                       # (4,)
    r_h = SIGMA_H ** 2 / trust                           # (4,)
    R = jnp.concatenate([jnp.repeat(r_kin, 3), r_h])     # (16,)
    q_feet = (SIGMA_DP ** 2 * (1.0 + jnp.exp(GAMMA * (0.5 - trust)))
              * dt * dt)                                 # (4,)
    Q = jnp.concatenate([
        jnp.zeros(3, dtype),
        jnp.full(3, SIGMA_A ** 2 * dt * dt, dtype),
        jnp.repeat(q_feet, 3)])                          # (18,)
    return R, Q


def kf18_step(cfg: Config, state: KF18State, oRb, imu_acc_world,
              foot_pos_base, feet_status, imu_ang_vel
              ) -> Tuple[KF18State, jnp.ndarray, jnp.ndarray]:
    """One predict+correct tick of the kf_enabled path
    (scripts/Estimator.py:554-580).

    oRb: (3, 3) base->world rotation; imu_acc_world: (3,) oRb @ IMU accel;
    foot_pos_base: (4, 3) foot positions in the base frame (fixed-base FK);
    feet_status: (4,) contact flags; imu_ang_vel: (3,) gyro (base frame).
    Returns (state, filt_lin_pos (world), filt_lin_vel (base frame)).
    """
    dt = cfg.dt_wbc
    dtype = state.X.dtype
    A, B, H = (jnp.asarray(m, dtype) for m in _kf18_const(dt))
    Rd, Qd = kf18_noise(dt, feet_status, dtype)
    imu_r = jnp.asarray(cfg.imu_offset, dtype)

    # predict
    X = A @ state.X + B @ imu_acc_world
    P = A @ state.P @ A.T + jnp.diag(Qd)

    # measurement: world-axis IMU-to-foot relative position, foot height 0
    rel = jnp.einsum("ab,fb->fa", oRb, imu_r[None, :] - foot_pos_base)
    Z = jnp.concatenate([rel.reshape(12), jnp.zeros(4, dtype)])

    # correct
    S = H @ P @ H.T + jnp.diag(Rd)
    K = P @ H.T @ jnp.linalg.inv(S)
    X = X + K @ (Z - H @ X)
    P = P - K @ H @ P

    cross = jnp.cross(imu_r, imu_ang_vel)
    filt_lin_pos = X[0:3] - imu_r                        # world frame
    # NOTE: the reference subtracts the base-frame lever-arm term BEFORE
    # rotating into the base frame (scripts/Estimator.py:580) — kept as-is.
    filt_lin_vel = oRb.T @ (X[3:6] - cross)              # base frame
    return KF18State(X=X, P=P), filt_lin_pos, filt_lin_vel
