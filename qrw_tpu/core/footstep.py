"""Raibert-heuristic footstep planner as a pure function.

Re-design of the reference FootstepPlanner (src/FootstepPlanner.cpp) over an
explicit state pytree. Per tick it:

  * refreshes stance-foot anchor positions on a new contact phase
    (src/FootstepPlanner.cpp:223-232),
  * drags stance feet in the moving horizontal frame
    (src/FootstepPlanner.cpp:59-71),
  * computes the full horizon of footstep locations — Raibert symmetry +
    velocity feedback + centrifugal term, clamped to the leg reach, placed
    under the shoulders (src/FootstepPlanner.cpp:158-186) — with the
    closed-form arc displacement under nonzero yaw rate
    (src/FootstepPlanner.cpp:104-120),
  * extracts the next touchdown target per foot and converts it to the
    world frame (src/FootstepPlanner.cpp:188-221).

The reference's while-loops over gait rows become a static unrolled
propagation over the fixed N_gait axis; everything is vmap-able.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from qrw_tpu.config import Config
from qrw_tpu.core.gait import GaitState, phase_durations
from qrw_tpu.ops.rotations import quat_to_rpy


class FootstepState(NamedTuple):
    current: jnp.ndarray    # (3, 4) stance anchor positions, horizontal frame
    footsteps: jnp.ndarray  # (N_gait, 3, 4) last computed horizon footsteps


def make_footstep_state(cfg: Config, shoulders) -> FootstepState:
    shoulders = jnp.asarray(shoulders)
    n = cfg.N_gait
    return FootstepState(
        current=shoulders,
        footsteps=jnp.zeros((n, 3, 4), dtype=shoulders.dtype),
    )


def update_footsteps(cfg: Config, shoulders, gait: GaitState,
                     state: FootstepState, refresh, k_remaining, q7,
                     b_v6, b_vref6) -> Tuple[FootstepState, jnp.ndarray,
                                             jnp.ndarray]:
    """One planner tick (FootstepPlanner::updateFootsteps).

    refresh: bool — `k % k_mpc == 0 and k != 0` (traced ok)
    k_remaining: `k_mpc - k % k_mpc` — WBC ticks until the next MPC step
    q7: (7,) base pose; b_v6 / b_vref6: (6,) measured / reference twist in
    the horizontal frame.
    Returns (new_state, o_target_footstep (3,4) world frame,
             fsteps (N_gait, 12) for the MPC).
    """
    n = cfg.N_gait
    dt, dt_wbc = cfg.dt_mpc, cfg.dt_wbc
    cur_gait = gait.current                       # (N, 4)
    contact0 = cur_gait[0] == 1.0                 # (4,)
    dtype = q7.dtype

    # -- refresh anchors on a new phase (uses last tick's footsteps row 1) --
    cf = jnp.where(refresh & gait.new_phase & contact0,
                   state.footsteps[1], state.current)

    # -- drag stance feet in the horizontal frame ---------------------------
    rot = dt_wbc * b_vref6[5]
    c, s = jnp.cos(rot), jnp.sin(rot)
    px = cf[0] - dt_wbc * b_vref6[0]
    py = cf[1] - dt_wbc * b_vref6[1]
    dragged = jnp.stack([c * px + s * py, -s * px + c * py, cf[2]])
    cf = jnp.where(contact0, dragged, cf)

    # -- cumulative time / yaw / arc displacement per gait row --------------
    nz = jnp.any(cur_gait != 0.0, axis=1)         # (N,)
    inc = nz.astype(dtype).at[0].set(0.0)
    dt_cum = dt_wbc * k_remaining + dt * jnp.cumsum(inc)
    wz = b_vref6[5]
    yaws = wz * dt_cum
    sy, cy = jnp.sin(yaws), jnp.cos(yaws)
    wz_safe = jnp.where(wz == 0, 1.0, wz)
    dx = jnp.where(wz == 0, b_v6[0] * dt_cum,
                   (b_v6[0] * sy + b_v6[1] * (cy - 1.0)) / wz_safe)
    dy = jnp.where(wz == 0, b_v6[1] * dt_cum,
                   (b_v6[1] * sy - b_v6[0] * (cy - 1.0)) / wz_safe)

    # -- Raibert touchdown offset, per (row, foot) --------------------------
    t_stance = phase_durations(gait, 1.0, dt).duration    # (N, 4)
    sym = 0.5 * t_stance[:, None, :] * b_v6[0:3][None, :, None]
    fb = cfg.k_feedback * (b_v6[0:3] - b_vref6[0:3])
    cross = jnp.stack([b_v6[1] * b_vref6[5] - b_v6[2] * b_vref6[4],
                       b_v6[2] * b_vref6[3] - b_v6[0] * b_vref6[5],
                       jnp.zeros((), dtype)])
    cent = 0.5 * jnp.sqrt(cfg.h_ref / cfg.gravity) * cross
    next_fs = sym + (fb + cent)[None, :, None]            # (N, 3, 4)
    L = cfg.step_limit
    next_fs = next_fs.at[:, 0:2].set(jnp.clip(next_fs[:, 0:2], -L, L))
    next_fs = next_fs + jnp.asarray(shoulders)[None]
    next_fs = next_fs.at[:, 2].set(0.0)

    # rotate into the frame of row i-1 and add the arc displacement
    cp, sp = cy, sy                                       # yaw at row i-1
    rot_fs = jnp.stack([cp[:, None] * next_fs[:, 0] - sp[:, None] * next_fs[:, 1],
                        sp[:, None] * next_fs[:, 0] + cp[:, None] * next_fs[:, 1],
                        next_fs[:, 2]], axis=1)
    disp = jnp.stack([dx, dy, jnp.zeros_like(dx)], axis=1)  # (N, 3)
    cand = rot_fs + disp[:, :, None]                      # V at row i uses i-1
    # cand[i] must use yaw/disp of row i-1 (src/FootstepPlanner.cpp:139-151)
    cand = jnp.concatenate([cand[0:1], cand[:-1]], axis=0)

    # -- forward propagation over gait rows ---------------------------------
    rows = [jnp.where(contact0, cf, 0.0)]
    for i in range(1, n):
        stay = (cur_gait[i - 1] * cur_gait[i]) > 0
        new = ((1.0 - cur_gait[i - 1]) * cur_gait[i]) > 0
        rows.append(jnp.where(stay, rows[i - 1], jnp.where(new, cand[i], 0.0)))
    footsteps = jnp.stack(rows)                           # (N, 3, 4)
    footsteps = jnp.where(nz[:, None, None], footsteps, 0.0)

    # -- next touchdown target per foot (first row with nonzero x) ----------
    has = footsteps[:, 0, :] != 0.0                        # (N, 4)
    first = jnp.argmax(has, axis=0)                        # (4,)
    target = jnp.take_along_axis(
        footsteps, first[None, None, :].repeat(3, axis=1), axis=0)[0]
    target = target.at[2].set(0.0)

    # -- world frame --------------------------------------------------------
    yaw = quat_to_rpy(q7[3:7])[2]
    cw, sw = jnp.cos(yaw), jnp.sin(yaw)
    o_target = jnp.stack([cw * target[0] - sw * target[1] + q7[0],
                          sw * target[0] + cw * target[1] + q7[1],
                          target[2]])

    new_state = FootstepState(current=cf, footsteps=footsteps)
    fsteps12 = footsteps.transpose(0, 2, 1).reshape(n, 12)
    return new_state, o_target, fsteps12
