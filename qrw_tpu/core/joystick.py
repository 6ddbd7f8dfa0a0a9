"""Reference-velocity command source (joystick / predefined profiles).

Re-design of the reference Joystick (scripts/Joystick.py) as pure
functions:

  * the 7 predefined velocity profiles velID 0..6 are keyframe tables
    (tick switch points x 6-dof velocities) interpolated with the
    reference's cubic bell transition v = v0 + A2 t^2 + A3 t^3
    (scripts/Joystick.py:160-189, 191-287);
  * gamepad mode is a first-order low-pass on scaled analog axes
    (scripts/Joystick.py:81-158) — the raw axes arrive from the host
    runtime (the evdev reader process of the reference becomes a host
    callback feeding a (4,) array).

Profiles are static per velID, so `v_ref_profile` traces to a constant
gather + cubic — vmap over k for whole-rollout precomputation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config

# velID -> (k_switch, v_switch[6, n]) (scripts/Joystick.py:200-285)
_PROFILES = {}

_PROFILES[0] = (
    [0, 500, 2000, 3000, 4000, 13000, 20000, 30000],
    {0: [0.0, 0.0, 0.25, 0.25, 0.0, 0.0, 0.0, 0.0]},
)
_V1, _R1 = 1.0, 0.3
_PROFILES[1] = (
    [0, 1000, 3000, 8000, 12000, 16000, 20000, 22000, 23000, 26000,
     30000, 33000, 34000, 40000, 41000, 43000, 44000, 45000],
    {0: [0.0, 0.0, _V1, _V1, 0.0, 0.0, 0.0, 0.0, -_V1, -_V1, 0.0, 0.0,
         0.0, _V1, _V1, _V1, _V1, _V1],
     1: [0.0, 0.0, 0.0, 0.0, -_V1 * 0.5, -_V1 * 0.5, 0.0, 0.0, 0.0, 0.0,
         0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
     5: [0.0, 0.0, _R1, _R1, _R1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
         _R1, _R1, 0.0, 0.0, -_R1, 0.0]},
)
_PROFILES[2] = (
    [0, 7000, 14000, 20000, 30000],
    {0: [0.0, 0.7, 1.3, 1.3, 1.3]},
)
_PROFILES[3] = (
    [0, 1000, 2000, 7000, 26000, 30000],
    {0: [0.0, 0.0, 0.0, 0.3, 0.3, 0.0],
     5: [0.0, 0.0, 0.3, 0.0, 0.0, 0.0]},
)
_PROFILES[4] = (
    [0, 1000, 3000, 7000, 9000, 30000],
    {0: [0.0, 0.0, 1.5, 1.5, 1.5, 1.5],
     5: [0.0, 0.0, 0.0, 0.0, 0.4, 0.4]},
)
_PROFILES[5] = (
    [0, 500, 1500, 2600, 5000, 6500, 7000, 8000, 9000],
    {0: [0.0, 0.0, 0.5, 0.6, 0.3, 0.6, -0.5, 0.7, 0.0],
     5: [0.0, 0.0, 0.2, 0.7, 0.7, 0.0, -0.4, -0.6, 0.0]},
)
_PROFILES[6] = (
    [0, 1000, 2500, 5000, 7500, 8000, 10000],
    {0: [0.0, 0.0, 0.8, 0.4, 0.8, 0.8, 0.0],
     5: [0.0, 0.0, 0.0, 0.55, 0.3, 0.0, 0.0]},
)


def profile_tables(vel_id: int):
    """(k_switch (n,), v_switch (6, n)) numpy tables for one velID."""
    ks, rows = _PROFILES[vel_id]
    v = np.zeros((6, len(ks)))
    for r, vals in rows.items():
        v[r] = vals
    return np.asarray(ks), v


def v_ref_profile(k, vel_id: int, dtype=jnp.float64) -> jnp.ndarray:
    """Reference 6-dof velocity at tick k for a predefined profile
    (Joystick.handle_v_switch + apply_velocity_change,
    scripts/Joystick.py:160-189)."""
    ks_np, v_np = profile_tables(vel_id)
    return v_ref_from_tables(k, ks_np, v_np, dtype)


def v_ref_multi_simu(k_loop, vx_ref, vy_ref, wyaw_ref, k_mpc: int,
                     dtype=jnp.float64) -> jnp.ndarray:
    """Multi-simulation ramp mode (scripts/Joystick.py:289-315): after a
    48-MPC-cycle standstill, each commanded component ramps linearly to
    its target at a slope set by the target magnitude (beta = max(|v| *
    1e4, 100) ticks for x/y, |w| * 2500 for yaw), saturating at 1."""
    k0 = k_mpc * 16 * 3
    k_loop = jnp.asarray(k_loop, dtype)

    def alpha(v, scale):
        # the reference truncates: beta = int(max(|v|*scale, 100.0))
        # (scripts/Joystick.py update_v_ref_multi_simu)
        beta = jnp.floor(
            jnp.maximum(jnp.abs(jnp.asarray(v, dtype)) * scale, 100.0))
        return jnp.clip((k_loop - k0) / beta, 0.0, 1.0)

    zero = jnp.zeros((), dtype)
    return jnp.stack([alpha(vx_ref, 1e4) * vx_ref,
                      alpha(vy_ref, 1e4) * vy_ref,
                      zero, zero, zero,
                      alpha(wyaw_ref, 2.5e3) * wyaw_ref])


def analysis_tables(des_vel_analysis, n_analysis: int, n_steady: int):
    """Keyframe tables for the speed-envelope analysis mode
    (scripts/Joystick.py:317-326 update_for_analysis; used by the
    crocoddyl_eval test_4 sweep): ramp 500 ticks after start to the
    analysed 6-dof velocity, hold through n_analysis, stay steady for
    n_steady more. Feed the result through the same cubic interpolation
    as the velID profiles (see eval/speed_sweep)."""
    des = np.asarray(des_vel_analysis, np.float64).reshape(6)
    ks = np.array([0, 500, n_analysis, n_analysis + n_steady])
    v = np.zeros((6, 4))
    v[:, 2] = des
    v[:, 3] = des
    return ks, v


def v_ref_from_tables(k, ks_np, v_np, dtype=jnp.float64) -> jnp.ndarray:
    """Cubic keyframe interpolation over explicit tables — the same
    handle_v_switch math as `v_ref_profile`, for caller-built tables
    (analysis mode / custom scenarios)."""
    ks = jnp.asarray(ks_np)
    v = jnp.asarray(v_np, dtype)
    k = jnp.asarray(k)
    n = ks.shape[0]
    i = jnp.sum((ks <= k).astype(jnp.int32))
    i = jnp.clip(i, 1, n - 1)
    past_end = k >= ks[n - 1]
    ev = (k - ks[i - 1]).astype(dtype)
    t1 = (ks[i] - ks[i - 1]).astype(dtype)
    v0 = v[:, i - 1]
    v1 = v[:, i]
    A3 = 2.0 * (v0 - v1) / t1 ** 3
    A2 = -1.5 * t1 * A3
    out = v0 + A2 * ev ** 2 + A3 * ev ** 3
    return jnp.where(past_end, v[:, n - 1], out)


class GamepadState(NamedTuple):
    v_ref: jnp.ndarray      # (6,) filtered reference velocity
    gait_code: jnp.ndarray  # () int — pending gait-switch code


def init_gamepad_state(dtype=jnp.float64) -> GamepadState:
    return GamepadState(v_ref=jnp.zeros(6, dtype),
                        gait_code=jnp.zeros((), jnp.int32))


def gamepad_update(cfg: Config, state: GamepadState, axes, buttons,
                   orientation_mode=False) -> GamepadState:
    """Low-pass filtered gamepad command (scripts/Joystick.py:81-158).

    axes: (4,) [vX, vY, vYaw, vZ-ish] raw in [-1, 1]; buttons: (4,) int
    one-hot-ish [pacing, bounding, trot, static]."""
    dtype = state.v_ref.dtype
    vx = axes[0] * cfg.vx_scale
    vy = axes[1] * cfg.vy_scale
    wyaw = axes[2] * cfg.vyaw_scale
    zero = jnp.zeros((), dtype)
    if orientation_mode:
        target = jnp.stack([zero, zero, zero, vy, -vx, wyaw])
    else:
        target = jnp.stack([vx, vy, zero, zero, zero, wyaw])
    alpha = cfg.dt_wbc / cfg.joy_tc
    v_ref = state.v_ref * (1.0 - alpha) + target * alpha
    code = jnp.argmax(buttons) + 1
    code = jnp.where(jnp.max(buttons) > 0, code, 0).astype(jnp.int32)
    return GamepadState(v_ref=v_ref, gait_code=code)
