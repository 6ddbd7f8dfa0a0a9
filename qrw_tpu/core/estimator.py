"""State estimator: IMU + leg-odometry fusion at 500 Hz.

Pure-function re-design of the reference Estimator (scripts/Estimator.py):

  * complementary-filter cascade — high-pass on integrated IMU acceleration
    + low-pass on the forward-kinematics velocity estimate, evaluated at
    the IMU location in the world frame (scripts/Estimator.py:519-557);
  * per-contact-foot base velocity from kinematics
    v = (p_foot x omega) - v_foot (BaseVelocityFromKinAndIMU,
    scripts/Estimator.py:642-670) with the foot-radius rolling correction
    (scripts/Estimator.py:434-438);
  * forward-geometry base position from contact feet
    (scripts/Estimator.py:387-445) plus mean foot goal offset;
  * adaptive IMU/FK trust schedule around contact switches
    (scripts/Estimator.py:503-517);
  * output low-pass filters: velocity at 50 Hz, security velocity at 6 Hz
    (scripts/Estimator.py:254-262, 594-624);
  * perfect-estimator mode taking ground truth from the simulator
    (scripts/Estimator.py:595-604).

The Pinocchio FK calls are replaced by the qrw_tpu fixed-base kinematics
kernel; all per-foot loops become masked reductions. The 18-state Kalman
variant (KFilterBis) is provided in core/kalman.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from qrw_tpu.config import Config
from qrw_tpu.core.kalman import KF18State, kf18_init, kf18_step
from qrw_tpu.ops import rbd
from qrw_tpu.ops.rotations import quat_to_rot, quat_to_rpy, rpy_to_quat


def filter_alpha(dt: float, fc: float) -> float:
    """Discrete complementary/low-pass gain for cut frequency fc
    (scripts/Estimator.py:193-194)."""
    y = 1.0 - math.cos(2.0 * math.pi * fc * dt)
    return -y + math.sqrt(y * y + 2.0 * y)


class DeviceData(NamedTuple):
    """Per-tick measurements from the device (simulator or masterboard)."""
    base_lin_acc: jnp.ndarray   # (3,) IMU linear acceleration, base frame
    base_ang_vel: jnp.ndarray   # (3,) gyroscope, base frame
    base_quat: jnp.ndarray      # (4,) IMU orientation [x, y, z, w]
    q_mes: jnp.ndarray          # (12,) joint encoder positions
    v_mes: jnp.ndarray          # (12,) joint encoder velocities
    dummy_pos: jnp.ndarray      # (3,) ground-truth base position (sim only)
    b_base_vel: jnp.ndarray     # (3,) ground-truth base velocity, base frame


class EstimatorState(NamedTuple):
    yaw_offset: jnp.ndarray     # () initial IMU yaw, removed from outputs
    k_since_contact: jnp.ndarray  # (4,)
    hp_vel: jnp.ndarray         # (3,) velocity complementary filter HP part
    lp_vel: jnp.ndarray         # (3,) velocity complementary filter LP part
    hp_pos: jnp.ndarray         # (3,) position filter HP part
    lp_pos: jnp.ndarray         # (3,) position filter LP part
    fk_lin_vel: jnp.ndarray     # (3,) last FK velocity estimate
    fk_xyz: jnp.ndarray         # (3,) last FK position estimate
    xyz_mean_feet: jnp.ndarray  # (3,)
    v_filt: jnp.ndarray         # (18,)
    v_secu: jnp.ndarray         # (12,)
    kf: KF18State               # 18-state Kalman (used when kf_enabled)


class EstimatorOutput(NamedTuple):
    q_filt: jnp.ndarray         # (19,) filtered configuration
    v_filt: jnp.ndarray         # (18,) filtered velocity
    v_secu: jnp.ndarray         # (12,) 6 Hz filtered joint velocity
    rpy: jnp.ndarray            # (3,) roll/pitch/yaw (yaw de-offset)
    state: EstimatorState


def init_estimator_state(cfg: Config, h_init: float,
                         dtype=jnp.float32) -> EstimatorState:
    return EstimatorState(
        yaw_offset=jnp.zeros((), dtype),
        k_since_contact=jnp.zeros(4, dtype),
        hp_vel=jnp.zeros(3, dtype),
        lp_vel=jnp.zeros(3, dtype),
        hp_pos=jnp.zeros(3, dtype),
        lp_pos=jnp.asarray([0.0, 0.0, h_init], dtype),
        fk_lin_vel=jnp.zeros(3, dtype),
        fk_xyz=jnp.asarray([0.0, 0.0, h_init], dtype),
        xyz_mean_feet=jnp.zeros(3, dtype),
        v_filt=jnp.zeros(18, dtype),
        v_secu=jnp.zeros(12, dtype),
        kf=kf18_init(h_init, dtype),
    )


def run_filter(cfg: Config, model: rbd.JaxModel, state: EstimatorState,
               k, gait_current, device: DeviceData, goals,
               perfect: bool = False, fk=None) -> EstimatorOutput:
    """One estimator tick (Estimator.run_filter, scripts/Estimator.py:466).

    gait_current: (N_gait, 4) current gait matrix; goals: (3, 4) foot
    target positions on the ground (for the mean-feet offset).
    fk: optional precomputed (pos (4, 3), vel (4, 3)) fixed-base foot
    kinematics at (device.q_mes, device.v_mes) — the fleet driver
    computes them for all scenarios in one lane-major dispatch
    (ops/rbd_lane) and injects them here; None runs the per-robot FK.
    """
    dtype = device.q_mes.dtype
    k = jnp.asarray(k)

    # remaining MPC steps in the current contact phase
    feet_status = gait_current[0]
    same = jnp.all(gait_current[1:] == feet_status[None, :], axis=1)
    remaining = 1 + jnp.sum(jnp.cumprod(same.astype(jnp.int32)))

    # ---- IMU ---------------------------------------------------------------
    rpy_raw = quat_to_rpy(device.base_quat)
    yaw_offset = jnp.where(k <= 1, rpy_raw[2], state.yaw_offset)
    rpy = rpy_raw.at[2].add(-yaw_offset)
    imu_quat = rpy_to_quat(rpy)
    oRb = quat_to_rot(imu_quat)
    imu_r = jnp.asarray(cfg.imu_offset, dtype)

    ksc = (state.k_since_contact + feet_status) * feet_status

    # ---- forward kinematics (fixed-base, identity orientation) -------------
    if fk is None:
        kin = rbd.frame_kinematics(model, jnp.zeros(3, dtype),
                                   jnp.asarray([0., 0., 0., 1.], dtype),
                                   device.q_mes, jnp.zeros(6, dtype),
                                   device.v_mes)
        fk_pos, fk_vel = kin.pos, kin.vel
    else:
        fk_pos, fk_vel = fk
    # per-foot base velocity: (p_foot x omega) - v_foot (base frame)
    vel_feet = (jnp.cross(fk_pos, device.base_ang_vel[None, :])
                - fk_vel)                                       # (4, 3)
    # rolling-radius correction on vx (front: HFE-KFE, hind: HFE+KFE)
    vmes = device.v_mes.reshape(4, 3)
    sign = jnp.asarray([-1.0, -1.0, 1.0, 1.0], dtype)
    vel_feet = vel_feet.at[:, 0].add(
        cfg.foot_radius * (vmes[:, 1] + sign * vmes[:, 2]))
    # per-foot base position (world-aligned via IMU orientation)
    xyz_feet = -jnp.einsum("ab,fb->fa", oRb, fk_pos)            # (4, 3)

    trust = (feet_status > 0) & (ksc >= cfg.contact_security_ticks)
    cnt = jnp.sum(trust.astype(dtype))
    fk_lin_vel = jnp.where(cnt > 0,
                           jnp.sum(jnp.where(trust[:, None], vel_feet, 0.0),
                                   axis=0) / jnp.maximum(cnt, 1.0),
                           state.fk_lin_vel)
    fk_xyz = jnp.where(cnt > 0,
                       jnp.sum(jnp.where(trust[:, None], xyz_feet, 0.0),
                               axis=0) / jnp.maximum(cnt, 1.0),
                       state.fk_xyz)

    in_contact = feet_status > 0
    cnt_c = jnp.sum(in_contact.astype(dtype))
    xyz_mean_feet = jnp.where(
        cnt_c > 0,
        jnp.sum(jnp.where(in_contact[None, :], goals, 0.0), axis=1)
        / jnp.maximum(cnt_c, 1.0),
        state.xyz_mean_feet)

    # ---- adaptive trust schedule (scripts/Estimator.py:503-517) -----------
    a = jnp.ceil(jnp.max(ksc) / 10.0) - 1.0
    b = remaining.astype(dtype)
    n = 1.0
    v_max, v_min = 1.0, 0.97
    c = ((a + b) - 2.0 * n) * 0.5
    near_switch = (a <= (n - 1.0)) | (b <= n)
    alpha = jnp.where(near_switch, v_max,
                      v_min + (v_max - v_min)
                      * jnp.abs(c - (a - n)) / jnp.maximum(c, 1e-9))

    cross = jnp.cross(imu_r, device.base_ang_vel)
    o_acc = oRb @ device.base_lin_acc
    if cfg.kf_enabled:
        # ---- 18-state Kalman filter (scripts/Estimator.py:554-580) --------
        kf, filt_lin_pos, b_filt_vel = kf18_step(
            cfg, state.kf, oRb, o_acc, fk_pos, feet_status,
            device.base_ang_vel)
        hp_vel, lp_vel = state.hp_vel, state.lp_vel
        hp_pos, lp_pos = state.hp_pos, state.lp_pos
    else:
        # ---- complementary filter cascade ---------------------------------
        i_fk_vel = fk_lin_vel + cross              # FK vel at IMU, base
        oi_fk_vel = oRb @ i_fk_vel                 # world frame
        hp_vel = alpha * (state.hp_vel + o_acc * cfg.dt_wbc)
        lp_vel = alpha * state.lp_vel + (1.0 - alpha) * oi_fk_vel
        oi_filt_vel = hp_vel + lp_vel
        b_filt_vel = oRb.T @ oi_filt_vel - cross   # base center, base frame
        ob_filt_vel = oRb @ b_filt_vel             # world frame

        a_pos = jnp.asarray(cfg.alpha_pos, dtype)
        hp_pos = a_pos * (state.hp_pos + ob_filt_vel * cfg.dt_wbc)
        lp_pos = (a_pos * state.lp_pos
                  + (1.0 - a_pos) * (fk_xyz + xyz_mean_feet))
        filt_lin_pos = hp_pos + lp_pos
        kf = state.kf

    # ---- outputs ----------------------------------------------------------
    alpha_v = filter_alpha(cfg.dt_wbc, cfg.fc_vel)
    alpha_secu = filter_alpha(cfg.dt_wbc, cfg.fc_secu)

    lin_vel_src = device.b_base_vel if perfect else b_filt_vel
    v_lin = (1.0 - alpha_v) * state.v_filt[0:3] + alpha_v * lin_vel_src
    v_filt = jnp.concatenate([v_lin, device.base_ang_vel, device.v_mes])

    z_out = (device.dummy_pos[2] - 0.0155) if perfect else filt_lin_pos[2]
    q_filt = jnp.concatenate([
        filt_lin_pos[0:2], jnp.reshape(z_out, (1,)), imu_quat, device.q_mes])

    v_secu = (1.0 - alpha_secu) * device.v_mes + alpha_secu * state.v_secu

    new_state = EstimatorState(
        yaw_offset=yaw_offset, k_since_contact=ksc,
        hp_vel=hp_vel, lp_vel=lp_vel, hp_pos=hp_pos, lp_pos=lp_pos,
        fk_lin_vel=fk_lin_vel, fk_xyz=fk_xyz, xyz_mean_feet=xyz_mean_feet,
        v_filt=v_filt, v_secu=v_secu, kf=kf)
    return EstimatorOutput(q_filt=q_filt, v_filt=v_filt, v_secu=v_secu,
                           rpy=rpy, state=new_state)
