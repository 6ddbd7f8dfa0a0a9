"""Trajectory replay: re-drive the simulator from logged joint commands.

Equivalent of the reference's replay entry point
(scripts/main_solo12_replay.py): a logged run's per-tick joint commands
(q_des, v_des, tau_ff from a RolloutLog .npz) are fed straight back to
the device — here the in-graph simulator under lax.scan — bypassing the
controller entirely. Used to validate logs, reproduce runs, and (on
hardware) re-execute a recorded motion."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from qrw_tpu.config import Config
from qrw_tpu.sim.physics import SimState, init_sim_state, step


class ReplayLog(NamedTuple):
    base_pos: jnp.ndarray   # (T, 3)
    base_quat: jnp.ndarray  # (T, 4)
    q_mes: jnp.ndarray      # (T, 12)
    v_mes: jnp.ndarray      # (T, 12)


def replay(cfg: Config, model, sim_state: SimState, q_des, v_des, tau_ff,
           P=None, D=None, terrain=None) -> Tuple[SimState, ReplayLog]:
    """Replay T ticks of logged commands (arrays (T, 12)) through the
    simulator with the joint PD law of the device facade
    (scripts/PyBulletSimulator.py:679-692). Returns final state + log."""
    dtype = sim_state.q.dtype
    T = q_des.shape[0]
    if P is None:
        P = jnp.full((T, 12), cfg.joint_P, dtype)
    if D is None:
        D = jnp.full((T, 12), cfg.joint_D, dtype)

    def loop(ss, inp):
        P_k, D_k, qd, vd, tf = inp
        ss, _ = step(cfg, model, ss, P_k, D_k, qd, vd, tf,
                     terrain=terrain)
        return ss, ReplayLog(base_pos=ss.q[0:3], base_quat=ss.q[3:7],
                             q_mes=ss.q[7:], v_mes=ss.v[6:])

    ss, logs = lax.scan(loop, sim_state,
                        (jnp.asarray(P, dtype), jnp.asarray(D, dtype),
                         jnp.asarray(q_des, dtype),
                         jnp.asarray(v_des, dtype),
                         jnp.asarray(tau_ff, dtype)))
    return ss, logs


def replay_from_npz(path: str, cfg: Config = None, dtype=jnp.float32):
    """Replay a RolloutLog .npz (utils/logger.py save_npz) end to end."""
    from qrw_tpu.models.solo12 import make_solo12
    from qrw_tpu.ops import rbd
    from qrw_tpu.utils.logger import load_npz
    if cfg is None:
        cfg = Config()
    data = load_npz(path)
    model = rbd.to_jax(make_solo12())
    ss = init_sim_state(cfg, dtype=dtype)
    run = jax.jit(lambda ss, q, v, t: replay(cfg, model, ss, q, v, t))
    return run(ss, jnp.asarray(data["q_des"], dtype),
               jnp.asarray(data["v_des"], dtype),
               jnp.asarray(data["tau_ff"], dtype))
