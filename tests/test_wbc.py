"""Tests for the whole-body controller (IK + box QP) and the estimator."""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core import wbc
from qrw_tpu.core.estimator import (DeviceData, init_estimator_state,
                                    run_filter)
from qrw_tpu.models.solo12 import H_INIT, Q_INIT, make_solo12
from qrw_tpu.ops import rbd

CFG = Config()
MODEL = rbd.to_jax(make_solo12())
Q0 = jnp.asarray(Q_INIT)
MG4 = CFG.mass * CFG.gravity / 4.0


def _goals_at_current():
    kin = rbd.frame_kinematics(MODEL, jnp.zeros(3),
                               jnp.asarray([0., 0., 0., 1.]), Q0,
                               jnp.zeros(6), jnp.zeros(12))
    return kin.pos.T  # (3, 4)


def test_wbc_equilibrium():
    """4-stance, feet at their goals, f_cmd = mg/4: no corrections needed;
    torques equal the static torques tau = -J' f."""
    pg = _goals_at_current()
    f_cmd = jnp.asarray(np.tile([0.0, 0.0, MG4], 4))
    contacts = jnp.ones(4)
    st = wbc.init_wbc_state(jnp.float64)
    res = wbc.compute_wbc(CFG, MODEL, st, Q0, jnp.zeros(18), f_cmd, contacts,
                          pg, jnp.zeros((3, 4)), jnp.zeros((3, 4)))
    # IK outputs: no error, no motion
    np.testing.assert_allclose(np.asarray(res.qdes), np.asarray(Q0),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.vdes), 0.0, atol=1e-9)
    # delta-f stays small: f_cmd already balances gravity
    np.testing.assert_allclose(np.asarray(res.f_with_delta),
                               np.asarray(f_cmd), atol=0.15)
    # feedforward torques match the static mapping tau = g_joints - J' f
    g_j = rbd.rnea(MODEL, jnp.asarray([0., 0., 0., 1.]), Q0, jnp.zeros(18),
                   jnp.zeros(18))[6:]
    J = rbd.foot_jacobians(MODEL, jnp.asarray([0., 0., CFG.h_ref]),
                           jnp.asarray([0., 0., 0., 1.]), Q0)
    Jc = np.asarray(J).reshape(12, 18)[:, 6:]
    tau_expect = np.asarray(g_j) - Jc.T @ np.asarray(res.f_with_delta)
    np.testing.assert_allclose(np.asarray(res.tau_ff), tau_expect, atol=2e-2)
    # torques within the security envelope
    assert np.all(np.abs(np.asarray(res.tau_ff)) < CFG.tau_security)


def test_wbc_swing_foot_tracking():
    """A swing foot with a position error gets a PD acceleration mapped
    through the leg Jacobian inverse."""
    pg = _goals_at_current()
    pg = pg.at[2, 1].add(0.02)   # FR foot goal 2 cm higher
    f_cmd = jnp.asarray(np.tile([0.0, 0.0, 4 * MG4 / 3], 4))
    f_cmd = f_cmd.at[3:6].set(0.0)
    contacts = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    st = wbc.init_wbc_state(jnp.float64)
    res = wbc.compute_wbc(CFG, MODEL, st, Q0, jnp.zeros(18), f_cmd, contacts,
                          pg, jnp.zeros((3, 4)), jnp.zeros((3, 4)))
    # commanded joint acceleration moves the FR foot toward the goal
    J = rbd.foot_jacobians(MODEL, jnp.zeros(3), jnp.asarray([0., 0., 0., 1.]),
                           Q0)
    a_foot = np.asarray(J[1, :, 9:12]) @ np.asarray(res.ddq_cmd[9:12])
    assert a_foot[2] > 1.0   # strong upward acceleration (Kp=100 * 0.02)
    # qdes reflects the position step toward the goal
    assert float(res.qdes[4] - Q0[4]) != 0.0


def test_wbc_contact_counter():
    st = wbc.init_wbc_state(jnp.float64)
    pg = _goals_at_current()
    f = jnp.zeros(12)
    c1 = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    for _ in range(3):
        res = wbc.compute_wbc(CFG, MODEL, st, Q0, jnp.zeros(18), f, c1,
                              pg, jnp.zeros((3, 4)), jnp.zeros((3, 4)))
        st = res.state
    np.testing.assert_array_equal(np.asarray(st.k_since_contact),
                                  [3, 3, 0, 0])
    res = wbc.compute_wbc(CFG, MODEL, st, Q0, jnp.zeros(18), f,
                          jnp.asarray([0.0, 1.0, 1.0, 0.0]), pg,
                          jnp.zeros((3, 4)), jnp.zeros((3, 4)))
    np.testing.assert_array_equal(np.asarray(res.state.k_since_contact),
                                  [0, 4, 1, 0])


# ----------------------------------------------------------------------
# Estimator
# ----------------------------------------------------------------------

def _device_static(h):
    return DeviceData(
        base_lin_acc=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        base_quat=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        q_mes=Q0,
        v_mes=jnp.zeros(12),
        dummy_pos=jnp.asarray([0.0, 0.0, h]),
        b_base_vel=jnp.zeros(3),
    )


def test_estimator_static_converges_to_height():
    from qrw_tpu.core import gait as G
    cfg = CFG
    gait = G.make_gait(cfg, "static")
    st = init_estimator_state(cfg, H_INIT, jnp.float64)
    dev = _device_static(H_INIT)
    goals = jnp.zeros((3, 4))
    step = jax.jit(lambda s, k: run_filter(cfg, MODEL, s, k, gait.current,
                                           dev, goals))
    out = None
    for k in range(400):
        out = step(st, k)
        st = out.state
    q = np.asarray(out.q_filt)
    # base height converges to the FK height, horizontal position to 0
    np.testing.assert_allclose(q[2], H_INIT, atol=1e-4)
    np.testing.assert_allclose(q[0:2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.v_filt), 0.0, atol=1e-8)
    np.testing.assert_allclose(q[3:7], [0, 0, 0, 1], atol=1e-12)


def test_estimator_yaw_offset_removed():
    from qrw_tpu.core import gait as G
    yaw = 0.5
    dev = _device_static(H_INIT)._replace(
        base_quat=jnp.asarray([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)]))
    gait = G.make_gait(CFG, "static")
    st = init_estimator_state(CFG, H_INIT, jnp.float64)
    out = run_filter(CFG, MODEL, st, 0, gait.current, dev, jnp.zeros((3, 4)))
    np.testing.assert_allclose(np.asarray(out.rpy), 0.0, atol=1e-12)


def test_estimator_velocity_tracks_joint_odometry():
    """Constant joint motion with zero IMU: the FK velocity drives the
    filtered velocity once contacts are trusted."""
    from qrw_tpu.core import gait as G
    gait = G.make_gait(CFG, "static")
    st = init_estimator_state(CFG, H_INIT, jnp.float64)
    vj = np.zeros(12)
    vj[1::3] = 0.3   # all HFE rotate
    dev = _device_static(H_INIT)._replace(v_mes=jnp.asarray(vj))
    out = None
    for k in range(300):
        out = run_filter(CFG, MODEL, st, k, gait.current, dev,
                         jnp.zeros((3, 4)))
        st = out.state
    # the base must appear to move forward (feet sweep backwards)
    assert float(out.v_filt[0]) > 0.05
