"""Lane-major fleet physics step: the batch-on-lanes twin of sim/physics.

`step_lane` advances a whole fleet's simulator states through one WBC
tick (cfg.sim_substeps substeps) in ONE lane-major dispatch over the
rbd_lane kernels, replacing vmap(sim.physics.step): identical contact
model (compliant normal + anchored friction, sim/physics.py), identical
on-board control law (tau = P (q_des - q) + D (v_des - v) + tau_ff,
scripts/PyBulletSimulator.py:685-692), identical measurement synthesis
(scripts/PyBulletSimulator.py:588-631) — with the batch on the TPU lane
axis throughout, and forward dynamics through the block Schur solve of
ops/rbd_lane.forward_dynamics instead of an 18x18 factorization.

The boundary stays batch-major (the same SimState/DeviceData pytrees as
sim/physics.py, leading batch axis) so callers swap vmap(step) for
step_lane without layout changes; the transposes at the boundary are a
few (B, ~20) arrays per tick. Projectiles (envID=1) are not supported
on this path — the fleet benchmarks run envID=0; vmap(step) remains the
general path. Parity vs vmap(step) is asserted in
tests/test_physics_lane.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from qrw_tpu.config import Config
from qrw_tpu.core.estimator import DeviceData
from qrw_tpu.ops import rbd_lane as rl
from qrw_tpu.sim.physics import SimState


def _quat_mul_lane(q, r):
    """Hamilton product of [x,y,z,w] quaternions (lists of (B,))."""
    x1, y1, z1, w1 = q
    x2, y2, z2, w2 = r
    return [w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2]


def _quat_integrate_lane(q, omega, dt):
    """Exponential-map integration (ops/rotations.quat_integrate),
    lane-major: q list of 4 (B,), omega Vec."""
    w2 = omega[0] ** 2 + omega[1] ** 2 + omega[2] ** 2
    th = jnp.sqrt(w2) * dt
    half = 0.5 * th
    small = th < 1e-8
    k = jnp.where(small, 0.5 * dt,
                  jnp.sin(half) * dt / jnp.maximum(th, 1e-30))
    dq = [omega[0] * k, omega[1] * k, omega[2] * k, jnp.cos(half)]
    out = _quat_mul_lane(q, dq)
    n = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2 + out[3] ** 2)
    return [e / n for e in out]


def step_lane(cfg: Config, lane: rl.LaneModel, state: SimState, P, D,
              q_des, v_des, tau_ff, f_ext=None, terrain=None
              ) -> Tuple[SimState, DeviceData]:
    """One WBC tick for the whole fleet. All inputs batch-major:
    state leaves (B, ...), P/D/q_des/v_des/tau_ff (B, 12), f_ext
    (B, 3) world-frame base force. `lane` is the static LaneModel
    (rl.to_lane, built OUTSIDE any jit trace — its numpy constants fold
    into the graph as literals). Returns (SimState, DeviceData) with
    the same batch-major layout as vmap(sim.physics.step)."""
    assert state.proj is None, "projectiles use the vmap(step) path"
    from qrw_tpu.sim.terrain import height_at
    dtype = state.q.dtype
    B = state.q.shape[0]
    dt = cfg.dt_wbc / cfg.sim_substeps

    def lq(x):
        """(B, 12) -> (4, 3, B)."""
        return jnp.transpose(x.reshape(B, 4, 3), (1, 2, 0))

    def lv(x):
        """(B, k) -> list of k (B,)."""
        return [x[:, i] for i in range(x.shape[1])]

    if f_ext is None:
        f_ext = jnp.zeros((B, 3), dtype)

    q_mes0 = lq(state.q[:, 7:])
    v_mes0 = lq(state.v[:, 6:])
    tau = lq(P) * (lq(q_des) - q_mes0) + lq(D) * (lq(v_des) - v_mes0) \
        + lq(tau_ff)                                    # (4, 3, B)
    fe = lv(f_ext)                                      # world force Vec

    ks = cfg.ground_stiffness
    kd = cfg.ground_damping
    mu = cfg.sim_mu

    def substep(carry, _):
        bp, quat, qj, vlin, w, vj, ax, ay, active = carry
        bp_v = [bp[i] for i in range(3)]
        quat_v = [quat[i] for i in range(4)]
        R0 = rl.quat_to_mat(quat_v)
        vlin_v = [vlin[i] for i in range(3)]
        w_v = [w[i] for i in range(3)]
        kin = rl.frame_kinematics(lane, bp_v, R0, qj, (vlin_v, w_v), vj)
        px, py, pz = kin.pos
        vx, vy, vz = kin.vel

        if terrain is not None:
            ground_h = height_at(terrain, jnp.stack([px, py], axis=-1))
        else:
            ground_h = 0.0

        # ---- compliant contact (sim/physics._contact_forces) ----------
        pen = ground_h - pz
        in_ground = pen > 0.0
        fn = jnp.maximum(0.0, ks * pen - kd * vz)
        fn = jnp.where(in_ground, fn, 0.0)
        new_contact = in_ground & ~active
        axn = jnp.where(new_contact, px, ax)
        ayn = jnp.where(new_contact, py, ay)
        rx = -ks * (px - axn) - kd * vx
        ry = -ks * (py - ayn) - kd * vy
        norm = jnp.sqrt(rx * rx + ry * ry)
        fmax = mu * fn
        scale = jnp.where(norm > fmax, fmax / jnp.maximum(norm, 1e-9),
                          1.0)
        ftx = jnp.where(in_ground, rx * scale, 0.0)
        fty = jnp.where(in_ground, ry * scale, 0.0)
        slide = in_ground & (norm > fmax)
        axn = jnp.where(slide, px + (ftx + kd * vx) / ks, axn)
        ayn = jnp.where(slide, py + (fty + kd * vy) / ks, ayn)
        F = [ftx, fty, fn]                              # (4, B) each

        # ---- generalized contact forces: f_gen = sum_f J_f' F_f -------
        J = rl.foot_jacobians(lane, kin, R0, bp_v)
        F_sum = [jnp.sum(f, axis=0) for f in F]         # world force sum
        base_force = rl.mtv(R0, F_sum)                  # base rows 0:3
        bt = rl.mtv(J.Jb_ang, F)                        # (4, B) entries
        base_torque = [jnp.sum(e, axis=0) for e in bt]
        tau_c = [rl._add(rl._mul(J.Jleg[0][l], F[0]),
                         rl._mul(J.Jleg[1][l], F[1]),
                         rl._mul(J.Jleg[2][l], F[2])) for l in range(3)]
        # external world force on the base (fault injection)
        base_force = rl.vadd(base_force, rl.mtv(R0, fe))

        # ---- forward dynamics -----------------------------------------
        hf, hn, htau = rl.nonlinear_effects(
            lane, R0, qj, (vlin_v, w_v, vj), cfg.gravity)
        blocks = rl.crba(lane, qj)
        rhs6 = [rl._add(base_force[i], rl._neg(hf[i])) for i in range(3)] \
            + [rl._add(base_torque[i], rl._neg(hn[i])) for i in range(3)]
        rhs_j = jnp.stack(tau_c, axis=1) + tau - htau   # (4, 3, B)
        a_base, a_j = rl.forward_dynamics(blocks, rhs6, rhs_j)

        vlin_n = jnp.stack([vlin[i] + dt * a_base[i] for i in range(3)])
        w_n = jnp.stack([w[i] + dt * a_base[3 + i] for i in range(3)])
        vj_n = vj + dt * a_j
        o_vel = rl.mv(R0, [vlin_n[i] for i in range(3)])
        bp_n = jnp.stack([bp[i] + dt * o_vel[i] for i in range(3)])
        quat_n = jnp.stack(_quat_integrate_lane(
            quat_v, [w_n[i] for i in range(3)], dt))
        qj_n = qj + dt * vj_n
        # active := in_ground (sim/physics._contact_forces returns
        # in_ground as the new active; anchors reset on fresh contact)
        return (bp_n, quat_n, qj_n, vlin_n, w_n, vj_n, axn, ayn,
                in_ground), None

    carry0 = (
        jnp.transpose(state.q[:, 0:3]),                 # (3, B)
        jnp.transpose(state.q[:, 3:7]),                 # (4, B)
        lq(state.q[:, 7:]),                             # (4, 3, B)
        jnp.transpose(state.v[:, 0:3]),
        jnp.transpose(state.v[:, 3:6]),
        lq(state.v[:, 6:]),
        jnp.transpose(state.anchors[:, :, 0]),          # (4, B)
        jnp.transpose(state.anchors[:, :, 1]),
        jnp.transpose(state.active),                    # (4, B)
    )
    (bp, quat, qj, vlin, w, vj, ax, ay, active), _ = jax.lax.scan(
        substep, carry0, None, length=cfg.sim_substeps)

    # ---- measurement synthesis (batch-major out) -------------------------
    quat_v = [quat[i] for i in range(4)]
    R0 = rl.quat_to_mat(quat_v)
    vlin_v = [vlin[i] for i in range(3)]
    w_v = [w[i] for i in range(3)]
    o_base_vel = rl.mv(R0, vlin_v)
    imu_r = [float(c) for c in cfg.imu_offset]
    o_imu_vel = rl.vadd(o_base_vel, rl.mv(R0, rl.cross(imu_r, w_v)))
    prev = [state.prev_o_imu_vel[:, i] for i in range(3)]
    base_lin_acc = rl.mtv(
        R0, [(o_imu_vel[i] - prev[i]) / cfg.dt_wbc for i in range(3)])

    def bm(x):
        """(4, 3, B) -> (B, 12)."""
        return jnp.transpose(x, (2, 0, 1)).reshape(B, 12)

    q_out = jnp.concatenate(
        [jnp.transpose(bp), jnp.transpose(quat), bm(qj)], axis=1)
    v_out = jnp.concatenate(
        [jnp.transpose(vlin), jnp.transpose(w), bm(vj)], axis=1)
    anchors = jnp.stack([jnp.transpose(ax), jnp.transpose(ay)], axis=-1)
    device = DeviceData(
        base_lin_acc=jnp.stack(base_lin_acc, axis=1),
        base_ang_vel=jnp.transpose(w),
        base_quat=jnp.transpose(quat),
        q_mes=bm(qj),
        v_mes=bm(vj),
        dummy_pos=jnp.transpose(bp),
        b_base_vel=jnp.transpose(vlin),
    )
    new_state = SimState(
        q=q_out, v=v_out, anchors=anchors,
        active=jnp.transpose(active),
        prev_o_imu_vel=jnp.stack(o_imu_vel, axis=1),
        joint_torques=bm(tau), proj=None)
    return new_state, device
