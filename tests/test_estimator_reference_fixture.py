"""Numeric fixture parity: core/estimator.py vs the reference's own filter math.

The MPC has an independent row-by-row reconstruction of src/MPC.cpp
(tests/test_mpc.py); this file gives the estimator the same treatment.
`ReferenceEstimator` below executes the numpy filter equations of
scripts/Estimator.py:466-629 VERBATIM in their original order — the
ComplementaryFilter cascade (scripts/Estimator.py:205-231,519-557), the
per-contact-foot FK fusion with the >=16-tick trust margin and the
foot-radius rolling correction (scripts/Estimator.py:400-445), the
adaptive alpha schedule (scripts/Estimator.py:503-517), the reference's
own quaternion conversions (scripts/Estimator.py:672-714), and the
output low-pass filters including the v_secu direction quirk
(scripts/Estimator.py:594-624). The only substitution is the Pinocchio
fixed-base FK, whose foot positions/velocities are injected from
ops/rbd.frame_kinematics (itself cross-validated against the reference
model in tests/test_rbd.py) — the filter math runs unchanged.

Both estimators consume the SAME 1,000-tick signal stream captured from
a closed-loop rollout running the real (non-perfect) estimator, and
must produce identical q_filt / v_filt / v_secu trajectories. A sign or
convention slip anywhere in core/estimator.py (e.g. the v_secu LP
direction, alpha_pos, the lever-arm cross products) fails this test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.config import Config
from qrw_tpu.core.controller import compute
from qrw_tpu.core.estimator import (init_estimator_state, run_filter)
from qrw_tpu.models.solo12 import H_INIT
from qrw_tpu.ops import rbd
from qrw_tpu.sim.physics import step
from qrw_tpu.sim.rollout import make_rollout

T_CAPTURE = 1000


# ----------------------------------------------------------------------
# The reference's own math, numpy, in the reference's order
# ----------------------------------------------------------------------

def _quaternionToRPY(quat):
    """scripts/Estimator.py:686-714 (arctan2(0, x) == 0 covers the
    reference's explicit != 0 special cases)."""
    qx, qy, qz, qw = quat
    rotateX = np.arctan2(2.0 * (qy * qz + qw * qx),
                         qw * qw - qx * qx - qy * qy + qz * qz)
    rotateYa0 = -2.0 * (qx * qz - qw * qy)
    if rotateYa0 >= 1.0:
        rotateY = np.pi / 2.0
    elif rotateYa0 <= -1.0:
        rotateY = -np.pi / 2.0
    else:
        rotateY = np.arcsin(rotateYa0)
    rotateZ = np.arctan2(2.0 * (qx * qy + qw * qz),
                         qw * qw + qx * qx - qy * qy - qz * qz)
    return np.array([rotateX, rotateY, rotateZ])


def _EulerToQuaternion(rpy):
    """scripts/Estimator.py:672-684."""
    roll, pitch, yaw = rpy
    sr, cr = np.sin(roll / 2.0), np.cos(roll / 2.0)
    sp, cp = np.sin(pitch / 2.0), np.cos(pitch / 2.0)
    sy, cy = np.sin(yaw / 2.0), np.cos(yaw / 2.0)
    return np.array([sr * cp * cy - cr * sp * sy,
                     cr * sp * cy + sr * cp * sy,
                     cr * cp * sy - sr * sp * cy,
                     cr * cp * cy + sr * sp * sy])


def _quat_to_mat(q):
    """pin.Quaternion(q).toRotationMatrix() for [x, y, z, w]."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class _ComplementaryFilter:
    """scripts/Estimator.py:184-231."""

    def __init__(self, dt, fc):
        self.dt = dt
        y = 1 - np.cos(2 * np.pi * fc * dt)
        self.alpha = -y + np.sqrt(y * y + 2 * y)
        self.HP_x = np.zeros(3)
        self.LP_x = np.zeros(3)

    def compute(self, x, dx, alpha=None):
        if alpha is not None:
            self.alpha = alpha
        self.HP_x = self.alpha * (self.HP_x + dx * self.dt)
        self.LP_x = self.alpha * self.LP_x + (1.0 - self.alpha) * x
        return self.HP_x + self.LP_x


class ReferenceEstimator:
    """scripts/Estimator.py:246-629, complementary-filter branch, with
    the Pinocchio FK quantities (fixed-base foot positions / frame
    velocities) injected per tick instead of computed by pin.*."""

    def __init__(self, dt, h_init):
        self.dt = dt
        y = 1 - np.cos(2 * np.pi * 50.0 * dt)
        self.alpha_v = -y + np.sqrt(y * y + 2 * y)
        y = 1 - np.cos(2 * np.pi * 6.0 * dt)
        self.alpha_secu = -y + np.sqrt(y * y + 2 * y)
        self.filter_xyz_vel = _ComplementaryFilter(dt, 3.0)
        self.filter_xyz_pos = _ComplementaryFilter(dt, 500.0)
        self.filter_xyz_pos.LP_x[2] = h_init
        self.FK_lin_vel = np.zeros(3)
        self.FK_xyz = np.array([0.0, 0.0, h_init])
        self.xyz_mean_feet = np.zeros(3)
        self.k_since_contact = np.zeros(4)
        self._1Mi_translation = np.array([0.1163, 0.0, 0.02])
        self.q_filt = np.zeros(19)
        self.v_filt = np.zeros(18)
        self.v_secu = np.zeros(12)
        self.k_log = 0
        self.offset_yaw_IMU = 0.0

    @staticmethod
    def cross3(left, right):
        return np.array([left[1] * right[2] - left[2] * right[1],
                         left[2] * right[0] - left[0] * right[2],
                         left[0] * right[1] - left[1] * right[0]])

    def run_filter(self, gait, device, goals, kin_pos, kin_vel):
        """One tick (scripts/Estimator.py:466-629). kin_pos/kin_vel:
        (4, 3) fixed-base foot positions and frame point velocities at
        the measured joint state — the injected FK."""
        feet_status = np.array(gait[0], copy=True)
        remaining_steps = 1
        while np.array_equal(feet_status, gait[remaining_steps, :]):
            remaining_steps += 1

        # get_data_IMU (scripts/Estimator.py:347-372)
        IMU_lin_acc = np.array(device["base_lin_acc"])
        IMU_ang_vel = np.array(device["base_ang_vel"])
        RPY = _quaternionToRPY(np.array(device["base_quat"]))
        if self.k_log <= 1:
            self.offset_yaw_IMU = RPY[2]
        RPY[2] -= self.offset_yaw_IMU
        IMU_ang_pos = _EulerToQuaternion(RPY)

        actuators_pos = np.array(device["q_mes"])
        actuators_vel = np.array(device["v_mes"])

        self.k_since_contact += feet_status
        self.k_since_contact *= feet_status

        # get_data_FK (scripts/Estimator.py:400-445): velocity model at
        # identity base orientation; position model at IMU_ang_pos
        oRb_xyz = _quat_to_mat(IMU_ang_pos)
        cpt = 0
        vel_est = np.zeros(3)
        xyz_est = np.zeros(3)
        for i in np.where(feet_status == 1)[0]:
            if self.k_since_contact[i] >= 16:
                # BaseVelocityFromKinAndIMU (scripts/Estimator.py:642-670)
                vel_estimated_baseframe = (
                    self.cross3(kin_pos[i], IMU_ang_vel) - kin_vel[i])
                xyz_estimated = -(oRb_xyz @ kin_pos[i])
                cpt += 1
                vel_est += vel_estimated_baseframe
                xyz_est += xyz_estimated
                r_foot = 0.025
                if i <= 1:
                    vel_est[0] += r_foot * (actuators_vel[1 + 3 * i]
                                            - actuators_vel[2 + 3 * i])
                else:
                    vel_est[0] += r_foot * (actuators_vel[1 + 3 * i]
                                            + actuators_vel[2 + 3 * i])
        if cpt > 0:
            self.FK_lin_vel = vel_est / cpt
            self.FK_xyz = xyz_est / cpt

        # get_xyz_feet (scripts/Estimator.py:447-464)
        cpt = 0
        xyz_feet = np.zeros(3)
        for i in np.where(feet_status == 1)[0]:
            cpt += 1
            xyz_feet += goals[:, i]
        if cpt > 0:
            self.xyz_mean_feet = xyz_feet / cpt

        # adaptive alpha (scripts/Estimator.py:503-517)
        a = np.ceil(np.max(self.k_since_contact) / 10) - 1
        b = remaining_steps
        n = 1
        v_max, v_min = 1.00, 0.97
        c = ((a + b) - 2 * n) * 0.5
        if (a <= (n - 1)) or (b <= n):
            alpha = v_max
        else:
            alpha = v_min + (v_max - v_min) * np.abs(c - (a - n)) / c

        # complementary cascade (scripts/Estimator.py:519-552)
        oRb = _quat_to_mat(IMU_ang_pos)
        cross_product = self.cross3(self._1Mi_translation, IMU_ang_vel)
        i_FK_lin_vel = self.FK_lin_vel + cross_product
        oi_FK_lin_vel = oRb @ i_FK_lin_vel
        oi_filt_lin_vel = self.filter_xyz_vel.compute(
            oi_FK_lin_vel, oRb @ IMU_lin_acc, alpha=alpha)
        i_filt_lin_vel = oRb.T @ oi_filt_lin_vel
        b_filt_lin_vel = i_filt_lin_vel - cross_product
        ob_filt_lin_vel = oRb @ b_filt_lin_vel
        filt_lin_pos = self.filter_xyz_pos.compute(
            self.FK_xyz + self.xyz_mean_feet, ob_filt_lin_vel,
            alpha=np.array([0.995, 0.995, 0.9]))
        filt_lin_vel = b_filt_lin_vel

        # outputs (scripts/Estimator.py:594-624), non-perfect mode
        self.q_filt[0:3] = filt_lin_pos
        self.q_filt[3:7] = IMU_ang_pos
        self.q_filt[7:] = actuators_pos
        self.v_filt[0:3] = ((1 - self.alpha_v) * self.v_filt[0:3]
                            + self.alpha_v * filt_lin_vel)
        self.v_filt[3:6] = IMU_ang_vel
        self.v_filt[6:] = actuators_vel
        self.v_secu = ((1 - self.alpha_secu) * actuators_vel
                       + self.alpha_secu * self.v_secu)
        self.k_log += 1
        return (self.q_filt.copy(), self.v_filt.copy(),
                self.v_secu.copy())


# ----------------------------------------------------------------------
# Capture + dual replay
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def captured():
    """1,000 ticks of closed-loop signals with the REAL estimator in the
    loop: per tick, the exact run_filter inputs (device measurements,
    previous gait matrix, previous foot goals — the call order of
    compute_pre, core/controller.py)."""
    cfg = Config()
    ctl, carry = make_rollout(cfg, dtype=jnp.float64)

    def loop(c, k):
        cs, ss, dev = c
        inputs = (dev, cs.gait.current, cs.foot_traj.position)
        cs, res = compute(ctl, cs, dev, k, perfect_estimator=False)
        ss, dev = step(cfg, ctl.model, ss, res.P, res.D, res.q_des,
                       res.v_des, res.tau_ff)
        return (cs, ss, dev), inputs

    from qrw_tpu.sim.rollout import RolloutCarry  # noqa: F401
    ss0 = carry.sim_state
    from qrw_tpu.core.estimator import DeviceData
    dev0 = DeviceData(
        base_lin_acc=jnp.zeros(3, jnp.float64), base_ang_vel=ss0.v[3:6],
        base_quat=ss0.q[3:7], q_mes=ss0.q[7:], v_mes=ss0.v[6:],
        dummy_pos=ss0.q[0:3], b_base_vel=ss0.v[0:3])
    (_, _, _), (devs, gaits, goals) = jax.lax.scan(
        loop, (carry.ctl_state, ss0, dev0), jnp.arange(T_CAPTURE))
    return cfg, ctl, devs, gaits, goals


def test_estimator_matches_reference_equations(captured):
    cfg, ctl, devs, gaits, goals = captured

    # ---- ours: run_filter over the captured stream --------------------
    est0 = init_estimator_state(cfg, H_INIT, jnp.float64)

    def est_loop(s, inp):
        k, dev, gait, goal = inp
        out = run_filter(cfg, ctl.model, s, k, gait, dev, goal,
                         perfect=False)
        return out.state, (out.q_filt, out.v_filt, out.v_secu)

    _, (q_ours, v_ours, vs_ours) = jax.lax.scan(
        est_loop, est0, (jnp.arange(T_CAPTURE), devs, gaits, goals))
    q_ours, v_ours, vs_ours = map(np.asarray, (q_ours, v_ours, vs_ours))

    # ---- injected FK: fixed-base kinematics at the measured state -----
    kin = jax.vmap(lambda qm, vm: rbd.frame_kinematics(
        ctl.model, jnp.zeros(3, jnp.float64),
        jnp.asarray([0., 0., 0., 1.], jnp.float64), qm,
        jnp.zeros(6, jnp.float64), vm))(devs.q_mes, devs.v_mes)
    kin_pos = np.asarray(kin.pos)
    kin_vel = np.asarray(kin.vel)

    # ---- reference equations on the same stream -----------------------
    ref = ReferenceEstimator(cfg.dt_wbc, H_INIT)
    q_ref = np.zeros_like(q_ours)
    v_ref = np.zeros_like(v_ours)
    vs_ref = np.zeros_like(vs_ours)
    devs_np = jax.tree.map(np.asarray, devs._asdict())
    gaits_np = np.asarray(gaits)
    goals_np = np.asarray(goals)
    for k in range(T_CAPTURE):
        dev_k = {key: val[k] for key, val in devs_np.items()}
        q_ref[k], v_ref[k], vs_ref[k] = ref.run_filter(
            gaits_np[k], dev_k, goals_np[k], kin_pos[k], kin_vel[k])

    # The capture exercises the full behavior space: both contact
    # configurations trusted and untrusted, alpha off its rails, and
    # nonzero velocity commands (velID ramp).
    assert gaits_np[:, 0].std() > 0          # contact states change
    assert np.abs(v_ours[:, 0:3]).max() > 0.05

    tol = 1e-9  # f64 replay of identical math
    assert np.max(np.abs(q_ours - q_ref)) < tol
    assert np.max(np.abs(v_ours - v_ref)) < tol
    assert np.max(np.abs(vs_ours - vs_ref)) < tol


def test_estimator_quaternion_convention_matches_reference():
    """ops/rotations quaternion conversions vs the reference's formulas
    on random orientations (scripts/Estimator.py:672-714)."""
    from qrw_tpu.ops.rotations import quat_to_rpy, rpy_to_quat
    rng = np.random.default_rng(0)
    for _ in range(50):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        rpy_ref = _quaternionToRPY(q)
        rpy_ours = np.asarray(quat_to_rpy(jnp.asarray(q)))
        np.testing.assert_allclose(rpy_ours, rpy_ref, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(rpy_to_quat(jnp.asarray(rpy_ref))),
            _EulerToQuaternion(rpy_ref), atol=1e-12)
