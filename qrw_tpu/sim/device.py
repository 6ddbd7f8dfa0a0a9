"""Masterboard-compatible device facade over the on-device simulator.

The reference's L4 device abstraction is a masterboard-shaped API that
the 500 Hz host loop drives identically in simulation and on the real
Solo-12 (scripts/PyBulletSimulator.py:525-730: Init / UpdateMeasurment /
SetDesiredJointTorque / SetDesiredJointPDgains / SetDesiredJointPosition
/ SetDesiredJointVelocity / SendCommand / Stop, with a `Hardware` dummy,
scripts/PyBulletSimulator.py:497-522). This module provides the same
surface for users who drive the loop from the host: a `SimDevice` whose
SendCommand dispatches one jitted physics tick (qrw_tpu.sim.physics.step)
to the accelerator, synthesizes the same measurements, and optionally
paces to real time with the native busy-wait pacer (the reference's
real-time wait, scripts/PyBulletSimulator.py:702-706).

For throughput this facade is the WRONG tool — use sim.rollout (the
whole closed loop inside one lax.scan) and batch with vmap. The facade
exists for API parity: hardware-in-the-loop style host loops, the
warm-up tick (`DummyDevice`, scripts/Controller.py:30-47,189-198), and
the calibration ramp (`put_on_the_floor`,
scripts/main_solo12_control.py:36-63).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core.estimator import DeviceData
from qrw_tpu.models.solo12 import make_solo12
from qrw_tpu.ops import rbd
from qrw_tpu.sim import physics


class Hardware:
    """Dummy hardware status object (scripts/PyBulletSimulator.py:497-522)."""

    def __init__(self):
        self.is_timeout = False
        self._imu_data = np.zeros(3)

    def IsTimeout(self) -> bool:
        return self.is_timeout

    def imu_data_attitude(self, i: int) -> float:
        return float(self._imu_data[i])


class SimDevice:
    """Drop-in device for host-driven control loops.

    Same call protocol as the reference device
    (scripts/main_solo12_control.py:180-213):

        device.Init(calibrateEncoders=True, q_init=q, ...)
        while running:
            device.UpdateMeasurment()
            ... controller ...
            device.SetDesiredJointPDgains(P, D)
            device.SetDesiredJointPosition(q_des)
            device.SetDesiredJointVelocity(v_des)
            device.SetDesiredJointTorque(tau_ff)
            device.SendCommand(WaitEndOfCycle=True)
        device.Stop()
    """

    def __init__(self, cfg: Optional[Config] = None, dtype=jnp.float32,
                 terrain=None):
        self.cfg = cfg if cfg is not None else Config()
        self.dtype = dtype
        self.terrain = terrain
        self.model = rbd.to_jax(make_solo12())
        self.nb_motors = 12
        self.hardware = Hardware()
        self.is_timeout = False
        # desired-command mailboxes (SetDesired* targets)
        self.P = np.zeros(12)
        self.D = np.zeros(12)
        self.q_des = np.zeros(12)
        self.v_des = np.zeros(12)
        self.tau_ff = np.zeros(12)
        self._pacer = None
        self._step = None
        self._state = None
        self._device_data = None

    # -- lifecycle -----------------------------------------------------------

    def Init(self, calibrateEncoders: bool = False, q_init=None,
             envID: int = 0, use_flat_plane: bool = True,
             enable_pyb_GUI: bool = False, dt: float = 0.002):
        """Build the sim world and compile the tick
        (PyBulletSimulator.Init, scripts/PyBulletSimulator.py:557-586).
        envID/use_flat_plane select the terrain when none was passed."""
        del calibrateEncoders, enable_pyb_GUI  # no-op in simulation
        cfg = self.cfg
        if dt != cfg.dt_wbc:
            cfg = cfg.replace(dt_wbc=dt)
            self.cfg = cfg
        if self.terrain is None and (envID == 1 or not use_flat_plane):
            from qrw_tpu.sim.terrain import make_terrain
            self.terrain = make_terrain(
                cfg.replace(envID=envID, use_flat_plane=use_flat_plane),
                dtype=self.dtype)
        self._state = physics.init_sim_state(
            cfg, q_init=None if q_init is None
            else jnp.asarray(np.asarray(q_init).ravel(), self.dtype),
            dtype=self.dtype)
        terrain = self.terrain

        def tick(state, P, D, q_des, v_des, tau_ff, f_ext):
            return physics.step(cfg, self.model, state, P, D, q_des,
                                v_des, tau_ff, f_ext=f_ext,
                                terrain=terrain)

        self._step = jax.jit(tick)
        self._f_ext = jnp.zeros(3, self.dtype)
        self.UpdateMeasurment()

    def Stop(self):
        """Release the pacer (the reference disconnects the client,
        scripts/PyBulletSimulator.py:724-729)."""
        if self._pacer is not None:
            self._pacer.close()
            self._pacer = None

    # -- measurements --------------------------------------------------------

    def UpdateMeasurment(self):
        """Refresh measurement attributes from the last sim state
        (scripts/PyBulletSimulator.py:588-631). [sic: reference spelling]"""
        if self._device_data is None:
            # first call: synthesize a rest measurement
            q, v = self._state.q, self._state.v
            self._device_data = DeviceData(
                base_lin_acc=jnp.zeros(3, self.dtype),
                base_ang_vel=v[3:6], base_quat=q[3:7], q_mes=q[7:],
                v_mes=v[6:], dummy_pos=q[0:3], b_base_vel=v[0:3])
        d = jax.device_get(self._device_data)
        self.baseLinearAcceleration = np.asarray(d.base_lin_acc)
        self.baseAngularVelocity = np.asarray(d.base_ang_vel)
        self.baseOrientation = np.asarray(d.base_quat)
        self.q_mes = np.asarray(d.q_mes)
        self.v_mes = np.asarray(d.v_mes)
        self.dummyPos = np.asarray(d.dummy_pos)
        self.b_baseVel = np.asarray(d.b_base_vel)
        return d

    @property
    def device_data(self) -> DeviceData:
        """The measurement pytree the jitted controller consumes."""
        return self._device_data

    @property
    def sim_state(self):
        return self._state

    # -- command mailboxes ---------------------------------------------------

    def SetDesiredJointTorque(self, tau):
        self.tau_ff = np.asarray(tau).ravel().copy()

    def SetDesiredJointPDgains(self, P, D):
        self.P = np.broadcast_to(np.asarray(P).ravel(), (12,)).copy()
        self.D = np.broadcast_to(np.asarray(D).ravel(), (12,)).copy()

    def SetDesiredJointPosition(self, q_des):
        self.q_des = np.asarray(q_des).ravel().copy()

    def SetDesiredJointVelocity(self, v_des):
        self.v_des = np.asarray(v_des).ravel().copy()

    def ApplyExternalForce(self, force):
        """World-frame force on the base for the next ticks (fault
        injection, scripts/PyBulletSimulator.py:402-431)."""
        self._f_ext = jnp.asarray(np.asarray(force).ravel(), self.dtype)

    # -- actuation -----------------------------------------------------------

    def SendCommand(self, WaitEndOfCycle: bool = True):
        """Apply PD+feedforward torques and advance one dt_wbc tick
        (scripts/PyBulletSimulator.py:672-706). WaitEndOfCycle paces the
        host loop to real time with the native busy-wait pacer."""
        a = lambda x: jnp.asarray(x, self.dtype)
        self._state, self._device_data = self._step(
            self._state, a(self.P), a(self.D), a(self.q_des),
            a(self.v_des), a(self.tau_ff), self._f_ext)
        if WaitEndOfCycle:
            if self._pacer is None:
                from qrw_tpu.runtime.ipc import Pacer
                self._pacer = Pacer(self.cfg.dt_wbc)
            jax.block_until_ready(self._state.q)
            self._pacer.wait()


class DummyDevice:
    """Fake device for the controller warm-up tick
    (scripts/Controller.py:30-47,189-198)."""

    def __init__(self, cfg: Optional[Config] = None, dtype=jnp.float32):
        cfg = cfg if cfg is not None else Config()
        st = physics.init_sim_state(cfg, dtype=dtype)
        q, v = st.q, st.v
        self._data = DeviceData(
            base_lin_acc=jnp.zeros(3, dtype), base_ang_vel=v[3:6],
            base_quat=q[3:7], q_mes=q[7:], v_mes=v[6:],
            dummy_pos=q[0:3], b_base_vel=v[0:3])
        self.baseLinearAcceleration = np.zeros(3)
        self.baseAngularVelocity = np.zeros(3)
        self.baseOrientation = np.asarray(q[3:7])
        self.q_mes = np.asarray(q[7:])
        self.v_mes = np.zeros(12)
        self.dummyPos = np.asarray(q[0:3])
        self.b_baseVel = np.zeros(3)
        self.hardware = Hardware()

    @property
    def device_data(self) -> DeviceData:
        return self._data


def put_on_the_floor(device: SimDevice, q_init, duration_s: float = 2.0,
                     Kp: float = 6.0, Kd: float = 0.3):
    """Calibration ramp to the initial configuration
    (scripts/main_solo12_control.py:36-63): PD-track q_init for
    duration_s before handing control to the walking controller. The
    reference gates on a keyboard press (real robot); in simulation the
    ramp just runs."""
    q_init = np.asarray(q_init).ravel()
    n = int(duration_s / device.cfg.dt_wbc)
    device.SetDesiredJointPDgains(np.full(12, Kp), np.full(12, Kd))
    device.SetDesiredJointPosition(q_init)
    device.SetDesiredJointVelocity(np.zeros(12))
    device.SetDesiredJointTorque(np.zeros(12))
    for _ in range(n):
        device.UpdateMeasurment()
        device.SendCommand(WaitEndOfCycle=False)
    return np.max(np.abs(device.q_mes - q_init))
