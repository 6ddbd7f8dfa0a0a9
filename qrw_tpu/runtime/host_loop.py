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
