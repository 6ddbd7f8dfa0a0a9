"""Main controller: the full 500 Hz tick as one pure, jittable function.

Re-design of the reference Controller (scripts/Controller.py:200-330) —
the per-tick pipeline

  velocity command -> estimator -> hybrid state update -> gait roll ->
  footstep planner -> swing trajectories -> state planner -> MPC (every
  k_mpc ticks, via lax.cond) -> WBC target assembly -> frame transforms ->
  whole-body controller -> joint PD setpoints + feedforward torques ->
  security check

— with every mutable reference attribute moved into an explicit
ControllerState pytree. `compute` jits and vmaps over scenario batches;
the dual-rate MPC runs under lax.cond so only every k_mpc-th tick pays
for the QP solve, reproducing the synchronous path of the reference
(scripts/MPC_Wrapper.py:128-148). The quirks of the reference are kept
deliberately (and marked): the one-tick-stale foot position/velocity used
in the Coriolis terms (scripts/Controller.py:286-296) and the "perfect
odometry" hybrid x/y/yaw integration (scripts/Controller.py:381-426).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qrw_tpu.config import Config
from qrw_tpu.core import gait as gait_mod
from qrw_tpu.core import mpc as mpc_mod
from qrw_tpu.core import mpc_ddp
from qrw_tpu.core import mpc_ddp_planner
from qrw_tpu.core import wbc as wbc_mod
from qrw_tpu.core.estimator import (DeviceData, EstimatorState,
                                    init_estimator_state, run_filter)
from qrw_tpu.core.foot_trajectory import (FootTrajState,
                                          make_foot_traj_state,
                                          update_foot_trajectory)
from qrw_tpu.core.footstep import (FootstepState, make_footstep_state,
                                   update_footsteps)
from qrw_tpu.core.joystick import v_ref_profile
from qrw_tpu.core.state_planner import compute_reference_states
from qrw_tpu.models.solo12 import H_INIT, make_solo12
from qrw_tpu.ops import qp, rbd
from qrw_tpu.ops.rotations import rot_z, rpy_to_quat, rpy_to_rot

SHOULDERS = np.array([[0.1946, 0.1946, -0.1946, -0.1946],
                      [0.14695, -0.14695, 0.14695, -0.14695],
                      [0.0, 0.0, 0.0, 0.0]])


class Result(NamedTuple):
    """Joint-level command sent to the device (scripts/Controller.py:16-28,
    306-310)."""
    P: jnp.ndarray       # (12,) proportional gains
    D: jnp.ndarray       # (12,) derivative gains
    q_des: jnp.ndarray   # (12,)
    v_des: jnp.ndarray   # (12,)
    tau_ff: jnp.ndarray  # (12,)


class ControllerState(NamedTuple):
    gait: gait_mod.GaitState
    footstep: FootstepState
    foot_traj: FootTrajState
    estimator: EstimatorState
    mpc: mpc_mod.MPCState
    x_f_mpc: jnp.ndarray        # (24, N) latest MPC plan
    x_f_next: jnp.ndarray       # (24, N) in-flight plan (async MPC mode)
    last_xref: jnp.ndarray      # (12, N+1) inputs of the latest MPC solve
    last_fsteps: jnp.ndarray    # (N_gait, 12) (for offline re-solves,
                                # crocoddyl_eval-style, SURVEY.md 4.3)
    wbc: wbc_mod.WBCState
    q: jnp.ndarray              # (19,) hybrid state estimate
    v: jnp.ndarray              # (18,)
    h_v: jnp.ndarray            # (18,) velocity in horizontal frame
    yaw_estim: jnp.ndarray      # ()
    qdes: jnp.ndarray           # (12,) previous WBC joint targets
    vdes: jnp.ndarray           # (12,)
    feet_p_cmd: jnp.ndarray     # (3, 4) previous-tick foot refs (base frame)
    feet_v_cmd: jnp.ndarray     # (3, 4)
    planner_target: jnp.ndarray  # (3, 4) optimized touchdowns (world
                                # frame) from the footstep-optimizing MPC
    error: jnp.ndarray          # () bool — security latch
    error_code: jnp.ndarray     # () int32 (1 pos, 2 vel, 3 torque)


class Controller(NamedTuple):
    """Static controller context: config + model + solver settings."""
    cfg: Config
    model: rbd.JaxModel
    patterns: jnp.ndarray
    mpc_settings: qp.QPSettings
    wbc_settings: qp.QPSettings


def make_controller(cfg: Config,
                    mpc_settings: Optional[qp.QPSettings] = None,
                    wbc_settings: Optional[qp.QPSettings] = None
                    ) -> Controller:
    if mpc_settings is None:
        mpc_settings = qp.QPSettings(
            sigma=cfg.osqp_sigma, alpha=cfg.osqp_alpha, rho=cfg.osqp_rho,
            eps_abs=cfg.osqp_eps_abs, eps_rel=cfg.osqp_eps_rel,
            max_iter=cfg.mpc_max_iter,
            adaptive_rho_interval=cfg.osqp_adaptive_rho_interval,
            adaptive_rho_tolerance=cfg.osqp_adaptive_rho_tolerance)
    if wbc_settings is None:
        wbc_settings = qp.QPSettings(eps_abs=cfg.wbc_eps_abs,
                                     eps_rel=cfg.wbc_eps_rel,
                                     max_iter=cfg.wbc_max_iter)
    return Controller(cfg=cfg, model=rbd.to_jax(make_solo12()),
                      patterns=gait_mod.gait_patterns(cfg),
                      mpc_settings=mpc_settings, wbc_settings=wbc_settings)


def init_state(ctl: Controller, dtype=jnp.float32,
               gait: str = "trot") -> ControllerState:
    cfg = ctl.cfg
    q_init = jnp.asarray(cfg.q_init, dtype)
    q = jnp.concatenate([
        jnp.asarray([0.0, 0.0, cfg.h_ref, 0.0, 0.0, 0.0, 1.0], dtype),
        q_init])
    # initial foot positions under the shoulders at ground level
    p0 = jnp.asarray(np.vstack([SHOULDERS[:2], np.zeros((1, 4))]), dtype)
    return ControllerState(
        gait=jax.tree.map(lambda a: a.astype(dtype)
                          if a.dtype != bool else a,
                          gait_mod.make_gait(cfg, gait)),
        footstep=make_footstep_state(cfg, jnp.asarray(SHOULDERS, dtype)),
        foot_traj=make_foot_traj_state(p0),
        estimator=init_estimator_state(cfg, H_INIT, dtype),
        # type_MPC selects the QP (OSQP-equivalent) or DDP (Crocoddyl-
        # equivalent) backend (scripts/MPC_Wrapper.py:59-64);
        # mpc_planner selects the footstep-optimizing DDP variant
        # (scripts/crocoddyl_class/MPC_crocoddyl_planner.py)
        mpc=(mpc_ddp_planner.init_planner_state(cfg, dtype)
             if cfg.mpc_planner
             else mpc_mod.init_mpc_state(cfg, dtype) if cfg.type_MPC
             else mpc_ddp.init_ddp_state(cfg, dtype)),
        x_f_mpc=jnp.zeros((24, cfg.n_steps), dtype),
        x_f_next=jnp.zeros((24, cfg.n_steps), dtype),
        last_xref=jnp.zeros((12, cfg.n_steps + 1), dtype),
        last_fsteps=jnp.zeros((cfg.N_gait, 12), dtype),
        wbc=wbc_mod.init_wbc_state(dtype),
        q=q, v=jnp.zeros(18, dtype), h_v=jnp.zeros(18, dtype),
        yaw_estim=jnp.zeros((), dtype),
        qdes=q_init, vdes=jnp.zeros(12, dtype),
        feet_p_cmd=jnp.zeros((3, 4), dtype),
        feet_v_cmd=jnp.zeros((3, 4), dtype),
        planner_target=p0,
        error=jnp.asarray(False),
        error_code=jnp.zeros((), jnp.int32),
    )


class Telemetry(NamedTuple):
    """Extra per-tick signals for structured logging (the LoggerControl
    arrays the Result/state don't carry, scripts/LoggerControl.py:18-96)."""
    f_wbc: jnp.ndarray         # (12,) WBC QP output forces (f_cmd + delta)
    feet_pos_mes: jnp.ndarray  # (3, 4) foot positions at the IK config
    feet_vel_mes: jnp.ndarray  # (3, 4) foot velocities (base frame)
    feet_a_cmd: jnp.ndarray    # (3, 4) commanded foot accelerations


class PreMPC(NamedTuple):
    """Pipeline values computed BEFORE the MPC solve of one tick
    (joystick -> estimator -> state update -> gait -> planners). The
    split lets a fleet driver run the per-scenario pipeline under vmap
    and route all scenarios' (xref, fsteps) through ONE lane-major
    batched MPC solve (core/mpc_lane) instead of vmapping the
    per-problem solver — the production fleet architecture."""
    est: NamedTuple             # estimator output (state + filtered sigs)
    v_ref: jnp.ndarray          # (18,)
    q: jnp.ndarray              # (19,)
    v: jnp.ndarray              # (18,)
    h_v: jnp.ndarray            # (18,)
    yaw_estim: jnp.ndarray
    oRh: jnp.ndarray            # (3, 3)
    oTh: jnp.ndarray            # (3,)
    gait: gait_mod.GaitState
    fs_state: FootstepState
    ft_state: FootTrajState
    fsteps: jnp.ndarray         # (N_gait, 12) MPC footstep input
    xref: jnp.ndarray           # (12, N+1) MPC reference input


def compute_pre(ctl: Controller, state: ControllerState,
                device: DeviceData, k, v_ref6=None, joystick_code=0,
                perfect_estimator: bool = False, est_fk=None) -> PreMPC:
    """First half of a control tick: everything up to (and producing)
    the MPC inputs (scripts/Controller.py:200-244). est_fk: optional
    precomputed estimator FK (core/estimator.run_filter's `fk`)."""
    cfg = ctl.cfg
    model = ctl.model
    dtype = state.q.dtype
    k = jnp.asarray(k)
    k_mpc = cfg.k_mpc

    # ---- velocity command -------------------------------------------------
    if v_ref6 is None:
        v_ref6 = v_ref_profile(k, cfg.velID, dtype)
    v_ref = jnp.concatenate([v_ref6.astype(dtype), jnp.zeros(12, dtype)])

    # ---- estimator --------------------------------------------------------
    est = run_filter(cfg, model, state.estimator, k, state.gait.current,
                     device, state.foot_traj.position,
                     perfect=perfect_estimator, fk=est_fk)

    # ---- hybrid state update (Controller.updateState) ---------------------
    cy, sy = jnp.cos(state.yaw_estim), jnp.sin(state.yaw_estim)
    dxy = jnp.stack([cy * v_ref[0] - sy * v_ref[1],
                     sy * v_ref[0] + cy * v_ref[1]]) * cfg.dt_wbc
    q = state.q.at[0:2].add(dxy)
    q = q.at[2].set(est.q_filt[2])
    yaw_estim = state.yaw_estim + v_ref[5] * cfg.dt_wbc
    quat = rpy_to_quat(jnp.stack([est.rpy[0], est.rpy[1], yaw_estim]))
    q = q.at[3:7].set(quat)
    q = q.at[7:].set(est.q_filt[7:])
    v = est.v_filt
    hRb = rpy_to_rot(jnp.stack([est.rpy[0], est.rpy[1],
                                jnp.zeros((), dtype)]))
    h_v = jnp.concatenate([hRb @ v[0:3], hRb @ v[3:6], v[6:]])
    oRh = rot_z(yaw_estim)
    oTh = jnp.stack([q[0], q[1], jnp.zeros((), dtype)])

    # ---- gait -------------------------------------------------------------
    gait = gait_mod.update_gait(state.gait, k, k_mpc, joystick_code,
                                ctl.patterns.astype(dtype))

    # ---- footstep planner -------------------------------------------------
    refresh = ((k % k_mpc) == 0) & (k != 0)
    fs_state, o_target, fsteps = update_footsteps(
        cfg, jnp.asarray(SHOULDERS, dtype), gait, state.footstep, refresh,
        (k_mpc - k % k_mpc).astype(dtype), q[0:7], h_v[0:6], v_ref[0:6])

    # ---- swing trajectories ----------------------------------------------
    # With the footstep-optimizing MPC, the touchdown targets come from
    # the previous planner solve instead of the Raibert heuristic (the
    # reference's planner feeds its optimized fsteps back the same way,
    # MPC_crocoddyl_planner.get_fsteps -> foot trajectory generator)
    swing_target = state.planner_target if cfg.mpc_planner else o_target
    ft_state = update_foot_trajectory(cfg, gait, state.foot_traj, k,
                                      swing_target)

    # ---- reference states -------------------------------------------------
    xref = compute_reference_states(q[0:7], h_v[0:6], v_ref[0:6],
                                    dt_mpc=cfg.dt_mpc, n_steps=cfg.n_steps,
                                    h_ref=cfg.h_ref)
    return PreMPC(est=est, v_ref=v_ref, q=q, v=v, h_v=h_v,
                  yaw_estim=yaw_estim, oRh=oRh, oTh=oTh, gait=gait,
                  fs_state=fs_state, ft_state=ft_state, fsteps=fsteps,
                  xref=xref)


def compute(ctl: Controller, state: ControllerState, device: DeviceData,
            k, v_ref6=None, joystick_code=0,
            perfect_estimator: bool = False,
            return_telemetry: bool = False):
    """One control tick (Controller.compute, scripts/Controller.py:200).

    k: tick counter (traced ok). v_ref6: optional explicit (6,) velocity
    command; defaults to the predefined profile cfg.velID. Returns
    (new_state, Result), or (new_state, Result, Telemetry) when
    return_telemetry=True (static). Composition: compute_pre -> the
    dual-rate MPC under lax.cond -> compute_post."""
    cfg = ctl.cfg
    dtype = state.q.dtype
    k = jnp.asarray(k)
    k_mpc = cfg.k_mpc
    pre = compute_pre(ctl, state, device, k, v_ref6, joystick_code,
                      perfect_estimator)
    gait, xref, fsteps = pre.gait, pre.xref, pre.fsteps
    oRh, oTh = pre.oRh, pre.oTh

    # ---- MPC (solve every k_mpc ticks, keep latest plan otherwise) --------
    def stale_roll(plan):
        """Staleness compensation of the async path (scripts/
        MPC_Wrapper.py:89-103): shift the force plan one step left and,
        on a gait-phase change, rebuild the terminal forces by equal
        weight distribution over the final stance feet."""
        rolled = plan.at[12:, :].set(jnp.roll(plan[12:, :], -1, axis=1))
        g = gait.current
        n_rows = jnp.sum(jnp.any(g > 0, axis=1).astype(jnp.int32))
        last = g[jnp.maximum(n_rows - 1, 0)]               # (4,)
        changed = jnp.any(last != g[0])
        F = cfg.mass * cfg.gravity / jnp.maximum(jnp.sum(last), 1.0)
        term = (jnp.zeros((4, 3), dtype).at[:, 2].set(F * last)
                .reshape(12))
        return jnp.where(changed & (k > 2),
                         rolled.at[12:, -1].set(term), rolled)

    def run_mpc(_):
        new_target = state.planner_target
        if cfg.mpc_planner:
            l_feet = oRh.T @ (state.foot_traj.position - oTh[:, None])
            res = mpc_ddp_planner.solve_mpc_planner(
                cfg, xref, fsteps, l_feet, state.mpc,
                cycle=(k // k_mpc).astype(jnp.int32))
            new_target = oRh @ res.o_target + oTh[:, None]
        elif cfg.type_MPC:
            res = mpc_mod.solve_mpc(cfg, xref, fsteps, state.mpc,
                                    ctl.mpc_settings)
        elif cfg.mpc_every_tick:
            # 500 Hz MPC (crocoddyl_eval/test_5): first node covers the
            # time remaining to the next gait boundary; the warm start
            # is only shifted on the boundary itself.
            dt_first = (k_mpc - (k % k_mpc)).astype(dtype) * cfg.dt_wbc
            res = mpc_ddp.solve_mpc_ddp(cfg, xref, fsteps, state.mpc,
                                        dt_first=dt_first,
                                        shift_warm=(k % k_mpc) == 0)
        else:
            res = mpc_ddp.solve_mpc_ddp(cfg, xref, fsteps, state.mpc)
        if cfg.mpc_async:
            # one-period-stale consumption: use the previously computed
            # plan (rolled); the fresh solve is applied next period
            used = jnp.where(k == 0, res.x_f_applied,
                             stale_roll(state.x_f_next))
            return used, res.x_f_applied, res.state, new_target
        return res.x_f_applied, res.x_f_applied, res.state, new_target

    def keep_mpc(_):
        return (state.x_f_mpc, state.x_f_next, state.mpc,
                state.planner_target)

    solve_now = (jnp.asarray(True) if cfg.mpc_every_tick
                 else (k % k_mpc) == 0)
    x_f_mpc, x_f_next, mpc_state, planner_target = lax.cond(
        solve_now, run_mpc, keep_mpc, None)

    return compute_post(ctl, state, pre, k, x_f_mpc, x_f_next, mpc_state,
                        planner_target, return_telemetry=return_telemetry)


class WBCInputs(NamedTuple):
    """Assembled whole-body-controller inputs of one tick — the cut
    point between the batch-major glue and the (possibly lane-major)
    WBC in the fleet driver (sim/fleet.py)."""
    qj: jnp.ndarray          # (12,) reference joint positions
    b_v: jnp.ndarray         # (18,)
    f_cmd: jnp.ndarray       # (12,)
    contacts: jnp.ndarray    # (4,)
    feet_p_cmd: jnp.ndarray  # (3, 4)
    feet_v_cmd: jnp.ndarray  # (3, 4)
    feet_a_cmd: jnp.ndarray  # (3, 4)


def wbc_inputs(ctl: Controller, state: ControllerState, pre: PreMPC,
               x_f_mpc) -> WBCInputs:
    """WBC target assembly + base-frame foot references
    (scripts/Controller.py:258-296)."""
    cfg = ctl.cfg
    dtype = state.q.dtype
    v_ref, xref, ft_state = pre.v_ref, pre.xref, pre.ft_state
    oRh, oTh = pre.oRh, pre.oTh

    # ---- WBC target assembly (scripts/Controller.py:258-269) -------------
    x_f_wbc = x_f_mpc[:, 0]
    x_f_wbc = x_f_wbc.at[0].set(cfg.dt_wbc * xref[6, 1])
    x_f_wbc = x_f_wbc.at[1].set(cfg.dt_wbc * xref[7, 1])
    x_f_wbc = x_f_wbc.at[2].set(cfg.h_ref)
    x_f_wbc = x_f_wbc.at[3:5].set(0.0)
    x_f_wbc = x_f_wbc.at[5].set(cfg.dt_wbc * xref[11, 1])
    x_f_wbc = x_f_wbc.at[6:12].set(xref[6:, 1])

    # ---- foot references in base frame (scripts/Controller.py:286-296) ----
    # NOTE: acceleration and velocity Coriolis terms intentionally use the
    # PREVIOUS tick's feet_p_cmd / feet_v_cmd, like the reference.
    w_ref = v_ref[3:6]
    prev_p = state.feet_p_cmd
    prev_v = state.feet_v_cmd
    feet_a_cmd = (oRh.T @ ft_state.acceleration
                  - jnp.cross(w_ref[None, :],
                              jnp.cross(w_ref[None, :], prev_p.T)).T
                  - 2.0 * jnp.cross(w_ref[None, :], prev_v.T).T)
    feet_v_cmd = oRh.T @ ft_state.velocity
    feet_v_cmd = (feet_v_cmd - v_ref[0:3, None]
                  - jnp.cross(w_ref[None, :], prev_p.T).T)
    h_ref_vec = jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype),
                           jnp.asarray(cfg.h_ref, dtype)])
    feet_p_cmd = oRh.T @ (ft_state.position - h_ref_vec[:, None]
                          - oTh[:, None])
    b_v = jnp.concatenate([v_ref[0:6], state.vdes])
    return WBCInputs(qj=state.qdes, b_v=b_v, f_cmd=x_f_wbc[12:24],
                     contacts=pre.gait.current[0],
                     feet_p_cmd=feet_p_cmd, feet_v_cmd=feet_v_cmd,
                     feet_a_cmd=feet_a_cmd)


def compute_post(ctl: Controller, state: ControllerState, pre: PreMPC,
                 k, x_f_mpc, x_f_next, mpc_state, planner_target,
                 return_telemetry: bool = False, wbc_res=None):
    """Second half of a control tick: WBC target assembly, frame
    transforms, whole-body controller, security check, state update
    (scripts/Controller.py:258-330,341-365). x_f_mpc is the plan the WBC
    consumes this tick — the internal lax.cond result in `compute`, or
    the lane-major batched solve's per-scenario slice in the fleet
    driver (sim/fleet.py). `wbc_res`: optional precomputed WBCResult for
    the exact `wbc_inputs(...)` of this tick (the fleet's lane-major WBC
    path); None runs the per-robot WBC here."""
    cfg = ctl.cfg
    dtype = state.q.dtype
    k = jnp.asarray(k)
    k_mpc = cfg.k_mpc
    est, xref = pre.est, pre.xref
    gait, fs_state, ft_state = pre.gait, pre.fs_state, pre.ft_state
    q, v, h_v, yaw_estim = pre.q, pre.v, pre.h_v, pre.yaw_estim
    fsteps = pre.fsteps

    inp = wbc_inputs(ctl, state, pre, x_f_mpc)
    feet_p_cmd, feet_v_cmd = inp.feet_p_cmd, inp.feet_v_cmd
    feet_a_cmd = inp.feet_a_cmd

    # ---- whole-body controller -------------------------------------------
    if wbc_res is None:
        wbc_res = wbc_mod.compute_wbc(
            cfg, ctl.model, state.wbc, inp.qj, inp.b_v, inp.f_cmd,
            inp.contacts, feet_p_cmd, feet_v_cmd, feet_a_cmd,
            ctl.wbc_settings)

    # ---- security check (scripts/Controller.py:341-365) -------------------
    q_sec = jnp.asarray(np.tile(np.asarray(Config().q_security), 4), dtype)
    err_pos = jnp.any(jnp.abs(est.q_filt[7:]) > q_sec)
    err_vel = jnp.any(jnp.abs(est.v_secu) > cfg.v_security)
    err_tau = jnp.any(jnp.abs(wbc_res.tau_ff) > cfg.tau_security)
    new_err = state.error | err_pos | err_vel | err_tau
    code = jnp.where(state.error, state.error_code,
                     jnp.where(err_pos, 1,
                               jnp.where(err_vel, 2,
                                         jnp.where(err_tau, 3, 0)))
                     .astype(jnp.int32))

    ones = jnp.ones(12, dtype)
    zeros = jnp.zeros(12, dtype)
    result = Result(
        P=jnp.where(new_err, zeros, cfg.joint_P * ones),
        D=jnp.where(new_err, cfg.damping_D * ones, cfg.joint_D * ones),
        q_des=jnp.where(new_err, zeros, wbc_res.qdes),
        v_des=jnp.where(new_err, zeros, wbc_res.vdes),
        tau_ff=jnp.where(new_err, zeros,
                         cfg.tau_ff_scale * wbc_res.tau_ff),
    )

    new_state = ControllerState(
        gait=gait, footstep=fs_state, foot_traj=ft_state,
        estimator=est.state, mpc=mpc_state, x_f_mpc=x_f_mpc,
        x_f_next=x_f_next,
        last_xref=jnp.where((k % k_mpc) == 0, xref, state.last_xref),
        last_fsteps=jnp.where((k % k_mpc) == 0, fsteps,
                              state.last_fsteps),
        wbc=wbc_res.state, q=q, v=v, h_v=h_v, yaw_estim=yaw_estim,
        qdes=wbc_res.qdes, vdes=wbc_res.vdes,
        feet_p_cmd=feet_p_cmd, feet_v_cmd=feet_v_cmd,
        planner_target=planner_target,
        error=new_err, error_code=code)
    if return_telemetry:
        telem = Telemetry(f_wbc=wbc_res.f_with_delta,
                          feet_pos_mes=wbc_res.feet_pos.T,
                          feet_vel_mes=wbc_res.feet_vel.T,
                          feet_a_cmd=feet_a_cmd)
        return new_state, result, telem
    return new_state, result
