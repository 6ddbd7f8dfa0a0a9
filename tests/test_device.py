"""Device facade + host-driven control loop (reference L4 parity:
scripts/PyBulletSimulator.py:525-730, scripts/main_solo12_control.py:
91-290)."""

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.runtime.host_loop import run_host_loop
from qrw_tpu.sim.device import DummyDevice, SimDevice, put_on_the_floor

CFG = Config()


def test_device_protocol_and_measurements():
    dev = SimDevice(CFG, dtype=jnp.float64)
    dev.Init(q_init=CFG.q_init)
    d = dev.UpdateMeasurment()
    assert dev.q_mes.shape == (12,)
    np.testing.assert_allclose(dev.q_mes, np.asarray(CFG.q_init))
    assert not dev.hardware.IsTimeout()
    # PD-hold the initial pose for 50 ticks: robot settles, doesn't fall
    dev.SetDesiredJointPDgains(np.full(12, 6.0), np.full(12, 0.3))
    dev.SetDesiredJointPosition(np.asarray(CFG.q_init))
    dev.SetDesiredJointVelocity(np.zeros(12))
    dev.SetDesiredJointTorque(np.zeros(12))
    for _ in range(50):
        dev.UpdateMeasurment()
        dev.SendCommand(WaitEndOfCycle=False)
    assert abs(dev.dummyPos[2] - 0.24) < 0.05
    assert np.max(np.abs(dev.q_mes - np.asarray(CFG.q_init))) < 0.3
    del d


def test_put_on_the_floor_converges():
    dev = SimDevice(CFG, dtype=jnp.float64)
    dev.Init(q_init=CFG.q_init)
    gap = put_on_the_floor(dev, CFG.q_init, duration_s=1.0)
    assert gap < 0.15  # reference startup-abort threshold


def test_dummy_device_warmup():
    dd = DummyDevice(CFG, dtype=jnp.float64)
    assert dd.device_data.q_mes.shape == (12,)
    np.testing.assert_allclose(np.asarray(dd.device_data.q_mes),
                               np.asarray(CFG.q_init))


def test_host_loop_walks_and_matches_rollout_contract():
    res = run_host_loop(CFG, n_ticks=120, dtype=jnp.float64)
    assert not res.startup_abort and not res.error and not res.timeout
    assert res.n_ticks == 120
    # base stays near the reference height throughout
    assert np.all(np.abs(res.q_log[:, 2] - CFG.h_ref) < 0.06)
    assert np.max(np.abs(res.tau_log)) < CFG.tau_security


def test_host_loop_startup_abort():
    """Reference startup security check
    (scripts/main_solo12_control.py:190-195): a device whose measured
    joints are far from the controller's first command aborts."""
    q_far = np.asarray(CFG.q_init) + 0.8
    dev = SimDevice(CFG, dtype=jnp.float64)
    dev.Init(q_init=q_far)
    res = run_host_loop(CFG, n_ticks=10, device=dev, dtype=jnp.float64)
    assert res.startup_abort
    assert res.n_ticks == 1
