"""Reference base-state trajectory over the MPC horizon.

Pure-function re-design of the reference StatePlanner
(src/StatePlanner.cpp:21-61): builds the 12 x (N+1) xref matrix in the
horizontal frame. Column 0 is the current state with x = y = yaw = 0;
columns 1..N integrate the reference velocity with the closed-form arc
solution for nonzero yaw rate. Fully vectorized over the horizon (and over
batches via broadcasting), no loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from qrw_tpu.ops.rotations import quat_to_rpy


def compute_reference_states(q7, h_v6, vref6, *, dt_mpc: float, n_steps: int,
                             h_ref: float, z_average=0.0):
    """Args mirror StatePlanner::computeReferenceStates.

    q7: (7,) base position + quaternion [x,y,z,qx,qy,qz,qw]
    h_v6: (6,) current base twist in the horizontal frame
    vref6: (6,) reference twist in the horizontal frame
    Returns xref: (12, n_steps + 1).
    """
    dtype = q7.dtype
    rpy = quat_to_rpy(q7[3:7])
    vx, vy, wz = vref6[0], vref6[1], vref6[5]

    # column 0: current state in the horizontal frame
    col0 = jnp.concatenate([
        jnp.zeros(2, dtype), q7[2:3], rpy[0:2], jnp.zeros(1, dtype),
        h_v6[0:3], h_v6[3:6],
    ])

    t = jnp.arange(1, n_steps + 1, dtype=dtype) * dt_mpc      # (N,)
    yaw = wz * t
    s, c = jnp.sin(yaw), jnp.cos(yaw)
    # closed-form integral of the rotating reference velocity
    straight_x, straight_y = vx * t, vy * t
    arc_x = (vx * s + vy * (c - 1.0)) / jnp.where(wz == 0, 1.0, wz)
    arc_y = (vy * s - vx * (c - 1.0)) / jnp.where(wz == 0, 1.0, wz)
    x = jnp.where(wz == 0, straight_x, arc_x)
    y = jnp.where(wz == 0, straight_y, arc_y)

    zeros = jnp.zeros_like(t)
    cols = jnp.stack([
        x, y,
        jnp.full_like(t, h_ref + z_average),
        zeros, zeros,                    # roll, pitch refs are 0
        yaw,
        vx * c - vy * s, vx * s + vy * c,
        zeros,                           # vz
        zeros, zeros,                    # wx, wy
        jnp.full_like(t, wz),
    ])                                    # (12, N)
    return jnp.concatenate([col0[:, None], cols], axis=1)
