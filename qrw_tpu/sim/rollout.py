"""Closed-loop rollout: controller + in-graph simulator under lax.scan.

This is the TPU-native equivalent of the reference's main control loop
(scripts/main_solo12_control.py:180-242): device measurement -> controller
tick -> joint PD command -> physics step, repeated for N ticks — but as
ONE jitted program whose per-scenario state is a pytree, so `jax.vmap`
turns it into thousands of simultaneous rollouts and `shard_map` spreads
them over a TPU mesh (see parallel/).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from qrw_tpu.core.controller import (Controller, ControllerState, Result,
                                     compute, init_state, make_controller)
from qrw_tpu.sim.physics import SimState, init_sim_state, step


class RolloutCarry(NamedTuple):
    ctl_state: ControllerState
    sim_state: SimState


class RolloutLog(NamedTuple):
    """Per-tick signals (the structured-logging core of the reference's
    LoggerControl/LoggerSensors, scripts/LoggerControl.py:18-96)."""
    base_pos: jnp.ndarray      # (T, 3) ground-truth base position
    base_quat: jnp.ndarray     # (T, 4) ground-truth base orientation
    base_vel: jnp.ndarray      # (T, 3) base-frame linear velocity
    rpy_vel: jnp.ndarray       # (T, 3) angular velocity
    q_mes: jnp.ndarray         # (T, 12) joint encoder positions
    v_mes: jnp.ndarray         # (T, 12) joint encoder velocities
    q_des: jnp.ndarray         # (T, 12) WBC joint position targets
    v_des: jnp.ndarray         # (T, 12) WBC joint velocity targets
    tau_ff: jnp.ndarray        # (T, 12) feedforward torques
    tau_applied: jnp.ndarray   # (T, 12) PD+ff torques applied by the sim
    f_mpc: jnp.ndarray         # (T, 12) first-step MPC forces
    f_wbc: jnp.ndarray         # (T, 12) WBC QP output forces
    feet_pos_ref: jnp.ndarray  # (T, 3, 4) swing-trajectory foot targets
    feet_p_cmd: jnp.ndarray    # (T, 3, 4) foot position refs (base frame)
    feet_v_cmd: jnp.ndarray    # (T, 3, 4) foot velocity refs (base frame)
    feet_a_cmd: jnp.ndarray    # (T, 3, 4) foot acceleration refs
    feet_pos_mes: jnp.ndarray  # (T, 3, 4) IK-model foot positions
    feet_vel_mes: jnp.ndarray  # (T, 3, 4) IK-model foot velocities
    q_est: jnp.ndarray         # (T, 19) controller hybrid state estimate
    v_est: jnp.ndarray         # (T, 18) estimator velocity
    est_hp_vel: jnp.ndarray    # (T, 3) velocity comp-filter HP part
    est_lp_vel: jnp.ndarray    # (T, 3) velocity comp-filter LP part
    est_hp_pos: jnp.ndarray    # (T, 3) position comp-filter HP part
    est_lp_pos: jnp.ndarray    # (T, 3) position comp-filter LP part
    est_fk_vel: jnp.ndarray    # (T, 3) FK velocity input to the filter
    est_fk_xyz: jnp.ndarray    # (T, 3) FK position input to the filter
    x_f_mpc: jnp.ndarray       # (T, 24, N) full MPC predicted plan
    gait_row0: jnp.ndarray     # (T, 4) current contact state
    mpc_xref: jnp.ndarray      # (T, 12, N+1) latest MPC solve inputs
    mpc_fsteps: jnp.ndarray    # (T, N_gait, 12) (offline re-solve capture)
    v_ref: jnp.ndarray         # (T, 6) commanded reference velocity
    error: jnp.ndarray         # (T,) security latch
    error_code: jnp.ndarray    # (T,) int32


def rollout(ctl: Controller, carry: RolloutCarry, n_ticks: int,
            k0=0, v_ref_schedule=None, f_ext_schedule=None,
            perfect_estimator: bool = False,
            terrain=None, joystick_schedule=None,
            with_logs: bool = True) -> Tuple[RolloutCarry, RolloutLog]:
    """Run `n_ticks` closed-loop control ticks starting at tick `k0`.

    v_ref_schedule: optional (n_ticks, 6) velocity commands (defaults to
    the predefined profile cfg.velID). f_ext_schedule: optional
    (n_ticks, 3) world-frame base force (fault injection, sim/faults.py).
    terrain: optional sim.terrain.Terrain height field.
    joystick_schedule: optional (n_ticks,) int32 gait-switch codes
    (src/Gait.cpp:197-219: 1 pacing, 2 bounding, 3 trot, 4 static;
    0 = no change)."""
    cfg = ctl.cfg

    def loop(carry, inp):
        k, v_ref, f_ext, jcode = inp
        cs, ss, device = carry
        cs, result, telem = compute(ctl, cs, device, k, v_ref6=v_ref,
                                    joystick_code=jcode,
                                    perfect_estimator=perfect_estimator,
                                    return_telemetry=True)
        ss, device = step(cfg, ctl.model, ss, result.P, result.D,
                          result.q_des, result.v_des, result.tau_ff,
                          f_ext=f_ext, terrain=terrain)
        log = RolloutLog(
            base_pos=ss.q[0:3], base_quat=ss.q[3:7],
            base_vel=ss.v[0:3], rpy_vel=ss.v[3:6],
            q_mes=ss.q[7:], v_mes=ss.v[6:],
            q_des=result.q_des, v_des=result.v_des,
            tau_ff=result.tau_ff, tau_applied=ss.joint_torques,
            f_mpc=cs.x_f_mpc[12:, 0], f_wbc=telem.f_wbc,
            feet_pos_ref=cs.foot_traj.position,
            feet_p_cmd=cs.feet_p_cmd, feet_v_cmd=cs.feet_v_cmd,
            feet_a_cmd=telem.feet_a_cmd,
            feet_pos_mes=telem.feet_pos_mes,
            feet_vel_mes=telem.feet_vel_mes,
            q_est=cs.q, v_est=cs.v,
            est_hp_vel=cs.estimator.hp_vel, est_lp_vel=cs.estimator.lp_vel,
            est_hp_pos=cs.estimator.hp_pos, est_lp_pos=cs.estimator.lp_pos,
            est_fk_vel=cs.estimator.fk_lin_vel,
            est_fk_xyz=cs.estimator.fk_xyz,
            x_f_mpc=cs.x_f_mpc, gait_row0=cs.gait.current[0],
            mpc_xref=cs.last_xref, mpc_fsteps=cs.last_fsteps,
            v_ref=v_ref, error=cs.error, error_code=cs.error_code,
        ) if with_logs else None
        return (cs, ss, device), log

    ks = k0 + jnp.arange(n_ticks)
    if v_ref_schedule is None:
        from qrw_tpu.core.joystick import v_ref_profile
        v_ref_schedule = jax.vmap(
            lambda k: v_ref_profile(k, cfg.velID, carry.sim_state.q.dtype)
        )(ks)
    if f_ext_schedule is None:
        f_ext_schedule = jnp.zeros((n_ticks, 3), carry.sim_state.q.dtype)
    if joystick_schedule is None:
        joystick_schedule = jnp.zeros((n_ticks,), jnp.int32)

    # initial measurements: one zero-torque, zero-time step is avoided by
    # synthesizing directly from the sim state
    ss0 = carry.sim_state
    from qrw_tpu.core.estimator import DeviceData as DD
    device0 = DD(
        base_lin_acc=jnp.zeros(3, ss0.q.dtype),
        base_ang_vel=ss0.v[3:6],
        base_quat=ss0.q[3:7],
        q_mes=ss0.q[7:],
        v_mes=ss0.v[6:],
        dummy_pos=ss0.q[0:3],
        b_base_vel=ss0.v[0:3],
    )
    (cs, ss, _), logs = lax.scan(loop,
                                 (carry.ctl_state, ss0, device0),
                                 (ks, v_ref_schedule, f_ext_schedule,
                                  joystick_schedule))
    return RolloutCarry(ctl_state=cs, sim_state=ss), logs


def make_rollout(cfg=None, dtype=jnp.float32, gait: str = "trot",
                 terrain=None, **cfg_kw):
    """Convenience constructor: (controller, initial carry). Pass the
    same `terrain` used for the rollout so the robot starts settled on
    it (scripts/PyBulletSimulator.py:222-265)."""
    from qrw_tpu.config import Config
    if cfg is None:
        cfg = Config(**cfg_kw)
    ctl = make_controller(cfg)
    carry = RolloutCarry(ctl_state=init_state(ctl, dtype, gait=gait),
                         sim_state=init_sim_state(cfg, terrain=terrain,
                                                  dtype=dtype))
    return ctl, carry
