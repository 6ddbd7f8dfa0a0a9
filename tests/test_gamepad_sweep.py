"""Gamepad runtime (scripts/gamepadClient.py parity), clone-robot
mirroring (scripts/main_solo12_control.py:66-88), and the batched
velocity-envelope sweep (scripts/crocoddyl_eval/test_4 parity)."""

import matplotlib

matplotlib.use("Agg")

import time

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.eval.speed_sweep import plot_envelope, run_sweep
from qrw_tpu.runtime.gamepad import (FRAME_SIZE, GamepadReader,
                                     SyntheticGamepad)
from qrw_tpu.runtime.host_loop import run_host_loop
from qrw_tpu.sim.device import SimDevice

CFG = Config()


def test_gamepad_reader_publishes_frames():
    frames = np.zeros((4, FRAME_SIZE))
    frames[:, 0] = [0.1, 0.2, 0.3, 0.4]       # left-stick x ramp
    frames[:, 7] = [0, 0, 1, 1]               # gait button 0 pressed late
    gp = GamepadReader(source=SyntheticGamepad(frames), period_s=0.001)
    try:
        deadline = time.time() + 5.0
        got = None
        while time.time() < deadline:
            f = gp.read()
            if f[0] > 0:
                got = f
                break
            time.sleep(0.005)
        assert got is not None, "no frame published"
        assert got[0] in frames[:, 0]
        assert gp.axes.shape == (4,) and gp.buttons.shape == (7,)
    finally:
        gp.stop()


def test_host_loop_with_gamepad_and_clone():
    frames = np.zeros((1, FRAME_SIZE))
    frames[0, 0] = 0.5                         # push the stick forward
    gp = GamepadReader(source=SyntheticGamepad(frames), period_s=0.001)
    clone = SimDevice(CFG, dtype=jnp.float64)
    clone.Init(q_init=CFG.q_init)
    try:
        res = run_host_loop(CFG, n_ticks=60, gamepad=gp, clone=clone,
                            dtype=jnp.float64)
    finally:
        gp.stop()
    assert not res.startup_abort and not res.error
    # the clone received identical commands: its sim advanced and its
    # joint state matches the primary's log closely (identical physics)
    clone.UpdateMeasurment()
    q_clone = np.asarray(clone.q_mes)
    np.testing.assert_allclose(q_clone, res.q_log[-1, 7:], atol=1e-6)


def test_speed_sweep_small_grid():
    res = run_sweep(CFG, vx_grid=np.array([0.0, 0.4]),
                    wyaw_grid=np.array([0.0]), n_ticks=400,
                    ramp_ticks=150, dtype=jnp.float64)
    assert res.success.shape == (2, 1)
    assert bool(res.success[0, 0]), "standing cell must survive"
    assert res.h_err[0, 0] < 0.03
    fig = plot_envelope(res, show=False)
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_multi_simu_ramp_profile():
    """v_ref_multi_simu (scripts/Joystick.py:289-315): zero until
    k = 48*k_mpc, linear ramp with |v|-scaled slope, saturation at the
    target."""
    from qrw_tpu.core.joystick import v_ref_multi_simu
    k_mpc = 10
    k0 = k_mpc * 16 * 3
    vx, vy, wy = 0.5, -0.2, 0.4
    v = np.asarray(v_ref_multi_simu(0, vx, vy, wy, k_mpc))
    assert np.allclose(v, 0.0)
    v = np.asarray(v_ref_multi_simu(k0, vx, vy, wy, k_mpc))
    assert np.allclose(v, 0.0)
    # halfway up the x ramp: beta_x = 0.5e4 ticks
    v = np.asarray(v_ref_multi_simu(k0 + 2500, vx, vy, wy, k_mpc))
    assert abs(v[0] - 0.25) < 1e-9
    # yaw ramps faster (beta_w = 0.4*2500 = 1000)
    assert abs(v[5] - wy) < 1e-9
    # saturated far along
    v = np.asarray(v_ref_multi_simu(k0 + 100000, vx, vy, wy, k_mpc))
    assert np.allclose(v[[0, 1, 5]], [vx, vy, wy])
    assert np.allclose(v[2:5], 0.0)


def test_analysis_profile_tables():
    """update_for_analysis keyframes (scripts/Joystick.py:317-326):
    ramp to the analysed velocity by n_analysis, hold for n_steady."""
    from qrw_tpu.core.joystick import analysis_tables, v_ref_from_tables
    des = np.array([0.9, 0.0, 0.0, 0.0, 0.0, 0.3])
    ks, vt = analysis_tables(des, 1500, 800)
    assert list(ks) == [0, 500, 1500, 2300]
    v = np.asarray(v_ref_from_tables(200, ks, vt))
    assert np.allclose(v, 0.0)
    v = np.asarray(v_ref_from_tables(1500, ks, vt))
    assert np.allclose(v, des)
    v = np.asarray(v_ref_from_tables(5000, ks, vt))
    assert np.allclose(v, des)
    # cubic transition is monotone here and hits the midpoint at mid-ramp
    v = np.asarray(v_ref_from_tables(1000, ks, vt))
    assert np.allclose(v, des * 0.5)


def test_v_ref_profile_delegates_to_tables():
    from qrw_tpu.core.joystick import (profile_tables, v_ref_from_tables,
                                       v_ref_profile)
    ks, vt = profile_tables(2)
    for k in (0, 3500, 7000, 12000, 40000):
        a = np.asarray(v_ref_profile(k, 2))
        b = np.asarray(v_ref_from_tables(k, ks, vt))
        assert np.allclose(a, b)
