"""Host-driven 500 Hz control loop against the device facade.

Parity with the reference entry loop (scripts/main_solo12_control.py:
91-290) for hardware-in-the-loop use: the controller runs as one jitted
tick on the accelerator while the host drives a masterboard-shaped
device (qrw_tpu.sim.device.SimDevice in simulation; a real driver would
expose the same methods). Reproduces the reference's safety sequence:

  * startup divergence abort — desired-vs-measured joint gap > 0.15 rad
    on the first tick kills the run (scripts/main_solo12_control.py:
    190-195);
  * masterboard timeout detection ends the loop
    (scripts/main_solo12_control.py:180,287-290);
  * graceful shutdown — 2.5 s damping descent (P=0, D=0.1) then zero
    torques (scripts/main_solo12_control.py:255-290).

For pure-simulation throughput use qrw_tpu.sim.rollout instead (whole
loop in one lax.scan, vmap over scenarios).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core.controller import compute, init_state, make_controller
from qrw_tpu.sim.device import SimDevice


class HostLoopResult(NamedTuple):
    n_ticks: int
    error: bool              # controller security latch tripped
    startup_abort: bool      # first-tick joint-gap abort
    timeout: bool            # masterboard timeout
    q_log: np.ndarray        # (n, 19) sim ground-truth configuration
    tau_log: np.ndarray      # (n, 12) feedforward torques


def run_host_loop(cfg: Optional[Config] = None, n_ticks: int = 500,
                  device: Optional[SimDevice] = None, gait: str = "trot",
                  realtime: bool = False, shutdown: bool = False,
                  clone: Optional[SimDevice] = None,
                  gamepad=None, dtype=jnp.float32) -> HostLoopResult:
    """Run the controller against a host-driven device for n_ticks.

    clone: optional second device receiving identical commands (the
    reference's -c clone-robot mirroring,
    scripts/main_solo12_control.py:66-88,140-152).
    gamepad: optional runtime.gamepad.GamepadReader; its freshest frame
    drives the velocity command via core.joystick.gamepad_update."""
    cfg = cfg if cfg is not None else Config()
    if device is None:
        device = SimDevice(cfg, dtype=dtype)
        device.Init(q_init=cfg.q_init)

    ctl = make_controller(cfg)
    state = init_state(ctl, dtype, gait=gait)
    tick = jax.jit(lambda s, d, k, v, jc: compute(ctl, s, d, k,
                                                  v_ref6=v,
                                                  joystick_code=jc))
    gp_state = None
    gp_update = None
    if gamepad is not None:
        from qrw_tpu.core.joystick import gamepad_update, init_gamepad_state
        gp_state = init_gamepad_state(dtype)
        gp_update = jax.jit(
            lambda s, ax, bt: gamepad_update(cfg, s, ax, bt))

    q_log = np.zeros((n_ticks, 19))
    tau_log = np.zeros((n_ticks, 12))
    startup_abort = timeout = error = False
    k = 0
    for k in range(n_ticks):
        if device.hardware.IsTimeout():
            timeout = True
            break
        device.UpdateMeasurment()
        if gamepad is not None:
            frame = gamepad.read()
            # frame layout: runtime.gamepad.FRAME_SIZE — axes then
            # [start, back, L1, 4 gait buttons]
            gp_state = gp_update(gp_state,
                                 jnp.asarray(frame[0:4], dtype),
                                 jnp.asarray(frame[7:11], dtype))
            v_ref6 = gp_state.v_ref
            j_code = gp_state.gait_code
        else:
            from qrw_tpu.core.joystick import v_ref_profile
            v_ref6 = v_ref_profile(jnp.asarray(k), cfg.velID, dtype)
            j_code = jnp.asarray(0, jnp.int32)
        state, result = tick(state, device.device_data,
                             jnp.asarray(k, jnp.int32), v_ref6, j_code)
        result = jax.device_get(result)

        # startup security check (scripts/main_solo12_control.py:190-195)
        if k == 0 and np.max(np.abs(
                np.asarray(result.q_des) - device.q_mes)) > 0.15:
            startup_abort = True
            break
        if bool(np.asarray(jax.device_get(state.error))):
            error = True
            break

        for dev in (device,) if clone is None else (device, clone):
            dev.SetDesiredJointPDgains(result.P, result.D)
            dev.SetDesiredJointPosition(result.q_des)
            dev.SetDesiredJointVelocity(result.v_des)
            dev.SetDesiredJointTorque(result.tau_ff)
            dev.SendCommand(WaitEndOfCycle=realtime and dev is device)
        q_log[k] = np.asarray(jax.device_get(device.sim_state.q))
        tau_log[k] = np.asarray(result.tau_ff)

    if shutdown or error:
        _damping_shutdown(device, cfg)
    device.Stop()
    return HostLoopResult(n_ticks=k + 1, error=error,
                          startup_abort=startup_abort, timeout=timeout,
                          q_log=q_log[:k + 1], tau_log=tau_log[:k + 1])


def _damping_shutdown(device: SimDevice, cfg: Config,
                      duration_s: float = 2.5, D: float = 0.1):
    """Damping descent then zero torques
    (scripts/main_solo12_control.py:255-290)."""
    device.SetDesiredJointPDgains(np.zeros(12), np.full(12, D))
    device.SetDesiredJointPosition(np.zeros(12))
    device.SetDesiredJointVelocity(np.zeros(12))
    device.SetDesiredJointTorque(np.zeros(12))
    for _ in range(int(duration_s / cfg.dt_wbc)):
        device.UpdateMeasurment()
        device.SendCommand(WaitEndOfCycle=False)
    device.SetDesiredJointPDgains(np.zeros(12), np.zeros(12))
    device.SendCommand(WaitEndOfCycle=False)


class PipelinedLoopResult(NamedTuple):
    n_ticks: int
    error: bool
    depth: int
    periods_ms: np.ndarray   # (n,) wall time between command applies
    q_log: np.ndarray        # (n, 19)


def run_host_loop_pipelined(cfg: Optional[Config] = None,
                            n_ticks: int = 500,
                            device: Optional[SimDevice] = None,
                            gait: str = "trot", depth: int = 2,
                            dtype=jnp.float32) -> PipelinedLoopResult:
    """Double-buffered host dispatch: the deployment-shape loop when the
    accelerator sits behind a link with non-trivial round-trip time.

    The plain host loop (run_host_loop) serializes
    measure -> dispatch -> FETCH -> apply, so every tick pays a full
    link round trip (scripts/main_solo12_control.py:180-242 has the
    same shape against the masterboard). This loop keeps `depth` ticks
    in flight: tick k is dispatched asynchronously with the freshest
    measurement, its outputs start copying host-ward immediately, and
    the command APPLIED at tick k is the result of tick k-depth — whose
    transfer has had `depth` periods to complete. Commands are
    depth-tick stale, exactly the reference's own async-MPC staleness
    contract (scripts/MPC_Wrapper.py:89-103) applied at the WBC rate.
    The effective period is then max(compute, RTT/depth-ish) instead of
    compute + RTT; the bench reports its p50/p99."""
    import time as _time
    from collections import deque

    cfg = cfg if cfg is not None else Config()
    if device is None:
        device = SimDevice(cfg, dtype=dtype)
        device.Init(q_init=cfg.q_init)
    ctl = make_controller(cfg)
    state = init_state(ctl, dtype, gait=gait)
    tick = jax.jit(lambda s, d, k, v: compute(ctl, s, d, k, v_ref6=v))
    from qrw_tpu.core.joystick import v_ref_profile

    # precompute the whole command profile host-side: the loop then
    # ships one small array per tick instead of dispatching profile ops
    sched = np.stack([np.asarray(v_ref_profile(k, cfg.velID, dtype))
                      for k in range(n_ticks)])

    inflight = deque()
    periods = []
    q_log = np.zeros((n_ticks, 19))
    error = False
    t_last = None
    applied = 0
    for k in range(n_ticks + depth):
        if k < n_ticks:
            device.UpdateMeasurment()
            state, result = tick(state, device.device_data,
                                 jnp.asarray(k, jnp.int32),
                                 jnp.asarray(sched[k]))
            # start the host-ward copies NOW; they arrive while later
            # ticks dispatch/compute
            for leaf in result:
                leaf.copy_to_host_async()
            inflight.append(result)
        if len(inflight) > depth or k >= n_ticks:
            if not inflight:
                break
            res = inflight.popleft()
            res_np = jax.tree.map(np.asarray, res)
            device.SetDesiredJointPDgains(res_np.P, res_np.D)
            device.SetDesiredJointPosition(res_np.q_des)
            device.SetDesiredJointVelocity(res_np.v_des)
            device.SetDesiredJointTorque(res_np.tau_ff)
            device.SendCommand(WaitEndOfCycle=False)
            now = _time.perf_counter()
            if t_last is not None:
                periods.append((now - t_last) * 1e3)
            t_last = now
            q_log[applied] = np.asarray(device.sim_state.q)
            applied += 1
    error = bool(np.asarray(jax.device_get(state.error)))
    device.Stop()
    return PipelinedLoopResult(
        n_ticks=applied, error=error, depth=depth,
        periods_ms=np.asarray(periods), q_log=q_log[:applied])
