"""Swing-foot reference trajectories (5th-order xy, closed-form z).

Re-design of the reference FootTrajectoryGenerator
(src/FootTrajectoryGenerator.cpp) as a pure function over a state pytree.

The reference refits, each MPC step, a quintic per swing foot and axis from
the current position/velocity/acceleration to the touchdown target, freezing
the coefficients `lockTime_` before touchdown, and evaluates a deterministic
degree-6 z profile with apex `maxHeight_`
(src/FootTrajectoryGenerator.cpp:54-105). Instead of transcribing the
reference's giant closed-form coefficient expressions, the quintic is solved
in *normalized* time tau = (t - t_fit)/(d - t_fit) in [0, 1]: the boundary
matrix is then a constant, its inverse is precomputed once on the host, and
the fit is a single 6x6 matmul per foot — better conditioned in f32 and
mathematically identical (same 6 boundary conditions). The z profile
simplifies to z(t) = maxHeight * 64 t^3 (d-t)^3 / d^6 (the reference's Az
coefficients in factored form, src/FootTrajectoryGenerator.cpp:96-105).

All four feet are processed with where-masks; vmap over scenarios applies.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core.gait import GaitState, phase_durations

# Inverse of the quintic boundary matrix in normalized time tau in [0,1]:
# rows = [p(0), p'(0), p''(0), p(1), p'(1), p''(1)], basis c0..c5.
_B = np.zeros((6, 6))
_B[0, 0] = 1.0
_B[1, 1] = 1.0
_B[2, 2] = 2.0
_B[3, :] = 1.0
_B[4, :] = [0, 1, 2, 3, 4, 5]
_B[5, :] = [0, 0, 2, 6, 12, 20]
_BINV = np.linalg.inv(_B)


class FootTrajState(NamedTuple):
    position: jnp.ndarray      # (3, 4)
    velocity: jnp.ndarray      # (3, 4)
    acceleration: jnp.ndarray  # (3, 4)
    coeffs: jnp.ndarray        # (4, 2, 6) xy quintic coeffs, normalized time
    t_fit: jnp.ndarray         # (4,) swing time at last refit
    s_fit: jnp.ndarray         # (4,) time span (d - t_fit) at last refit
    t0s: jnp.ndarray           # (4,) elapsed swing time
    t_swing: jnp.ndarray       # (4,) total swing duration


def make_foot_traj_state(initial_positions) -> FootTrajState:
    p0 = jnp.asarray(initial_positions)
    dtype = p0.dtype
    return FootTrajState(
        position=p0,
        velocity=jnp.zeros((3, 4), dtype),
        acceleration=jnp.zeros((3, 4), dtype),
        coeffs=jnp.zeros((4, 2, 6), dtype),
        t_fit=jnp.zeros(4, dtype),
        s_fit=jnp.ones(4, dtype),
        t0s=jnp.zeros(4, dtype),
        t_swing=jnp.full((4,), 0.16, dtype),
    )


def update_foot_trajectory(cfg: Config, gait: GaitState,
                           state: FootTrajState, k,
                           target) -> FootTrajState:
    """One tick (FootTrajectoryGenerator::update). `target` is the (3, 4)
    touchdown target from the footstep planner; `k` is the WBC tick."""
    dt = cfg.dt_wbc
    k_mpc = cfg.k_mpc
    dtype = state.position.dtype
    swing = gait.current[0] == 0.0                           # (4,)
    k = jnp.asarray(k)
    mpc_tick = (k % k_mpc) == 0

    # -- swing timing (src/FootTrajectoryGenerator.cpp:108-137) -------------
    info = phase_durations(gait, 0.0, cfg.dt_mpc)
    t_swing_new = info.duration[0]                           # (4,)
    remaining = info.remaining[0].astype(dtype)
    val = (t_swing_new - (remaining * k_mpc - ((k + 1) % k_mpc)) * dt - dt)
    t0_mpc = jnp.maximum(0.0, val)
    t0_step = jnp.maximum(0.0, state.t0s + dt)
    t_swing = jnp.where(swing & mpc_tick, t_swing_new, state.t_swing)
    t0s = jnp.where(swing, jnp.where(mpc_tick, t0_mpc, t0_step), state.t0s)

    t = t0s
    d = t_swing

    # -- xy quintic refit (unless inside the lock window) -------------------
    refit = swing & (t < d - cfg.lock_time)
    s = jnp.maximum(d - t, 1e-6)                             # (4,)
    # rhs rows in normalized time: [p, p'*s, p''*s^2, target, 0, 0]
    rhs = jnp.stack([
        state.position[0:2],                                 # (2, 4)
        state.velocity[0:2] * s[None, :],
        state.acceleration[0:2] * s[None, :] ** 2,
        target[0:2],
        jnp.zeros((2, 4), dtype),
        jnp.zeros((2, 4), dtype),
    ])                                                       # (6, 2, 4)
    binv = jnp.asarray(_BINV, dtype)
    new_coeffs = jnp.einsum("ij,jak->kai", binv, rhs)        # (4, 2, 6)
    coeffs = jnp.where(refit[:, None, None], new_coeffs, state.coeffs)
    t_fit = jnp.where(refit, t, state.t_fit)
    s_fit = jnp.where(refit, s, state.s_fit)

    # -- evaluate xy at ev = t + dt -----------------------------------------
    ev = t + dt
    tau = (ev - t_fit) / s_fit                               # (4,)
    powers = tau[:, None] ** jnp.arange(6, dtype=dtype)      # (4, 6)
    dpow = jnp.concatenate(
        [jnp.zeros((4, 1), dtype),
         jnp.arange(1, 6, dtype=dtype) * powers[:, :5]], axis=1)
    ddpow = jnp.concatenate(
        [jnp.zeros((4, 2), dtype),
         (jnp.arange(2, 6, dtype=dtype) * jnp.arange(1, 5, dtype=dtype))
         * powers[:, :4]], axis=1)
    pos_xy = jnp.einsum("fai,fi->af", coeffs, powers)        # (2, 4)
    vel_xy = jnp.einsum("fai,fi->af", coeffs, dpow) / s_fit[None, :]
    acc_xy = jnp.einsum("fai,fi->af", coeffs, ddpow) / s_fit[None, :] ** 2

    # out-of-range swing time: hold xy, zero xy vel/acc
    # (src/FootTrajectoryGenerator.cpp:120-128)
    in_range = (t >= 0.0) & (t <= d)
    pos_xy = jnp.where(in_range, pos_xy, state.position[0:2])
    vel_xy = jnp.where(in_range, vel_xy, 0.0)
    acc_xy = jnp.where(in_range, acc_xy, 0.0)

    # -- z profile: maxHeight * 64 ev^3 (d-ev)^3 / d^6 ----------------------
    h = cfg.max_height
    z = 64.0 * h * ev ** 3 * (d - ev) ** 3 / d ** 6
    dz = 64.0 * h * (3 * ev ** 2 * (d - ev) ** 3
                     - 3 * ev ** 3 * (d - ev) ** 2) / d ** 6
    ddz = 64.0 * h * (6 * ev * (d - ev) ** 3 - 18 * ev ** 2 * (d - ev) ** 2
                      + 6 * ev ** 3 * (d - ev)) / d ** 6

    position = jnp.concatenate([pos_xy, z[None, :]], axis=0)
    velocity = jnp.concatenate([vel_xy, dz[None, :]], axis=0)
    acceleration = jnp.concatenate([acc_xy, ddz[None, :]], axis=0)

    # stance feet keep their last values (only swing feet are updated)
    position = jnp.where(swing, position, state.position)
    velocity = jnp.where(swing, velocity, state.velocity)
    acceleration = jnp.where(swing, acceleration, state.acceleration)

    return FootTrajState(position=position, velocity=velocity,
                         acceleration=acceleration, coeffs=coeffs,
                         t_fit=t_fit, s_fit=s_fit, t0s=t0s, t_swing=t_swing)
