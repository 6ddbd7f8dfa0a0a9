"""On-device articulated rigid-body simulator with compliant contact.

Replaces PyBullet (scripts/PyBulletSimulator.py) with a fully in-graph
simulator so closed-loop rollouts run on the TPU: whole-robot forward
dynamics from the qrw_tpu CRBA/RNEA kernels, a compliant (penalty +
anchored-friction) ground-contact model at the four feet, and the same
on-board control law as the reference device facade
(tau = P (q_des - q) + D (v_des - v) + tau_ff,
scripts/PyBulletSimulator.py:685-692, applied in torque control).

Measurement synthesis mirrors PyBulletSimulator.UpdateMeasurment
(scripts/PyBulletSimulator.py:588-631): joint encoders, base-frame
gyroscope, gravity-free IMU linear acceleration as the finite difference
of the IMU-point velocity (same r x omega lever-arm convention as the
estimator), ground-truth position/velocity for the perfect-estimator mode.

The contact model is stateful per foot: a normal spring-damper (fn =
kp * penetration - kd * zdot, clamped >= 0) and a tangential anchor
spring clamped to the friction cone, with anchor sliding on saturation —
branch-free, so the whole rollout jits and vmaps over scenarios.
External force schedules support the reference's fault-injection
scenarios (scripts/PyBulletSimulator.py:402-431).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from qrw_tpu.config import Config
from qrw_tpu.core.estimator import DeviceData
from qrw_tpu.ops import lin, rbd
from qrw_tpu.ops.rotations import quat_integrate, quat_to_rot


class Projectiles(NamedTuple):
    """In-graph equivalent of the envID=1 thrown spheres
    (scripts/PyBulletSimulator.py:144-175, 289-298): 0.4 kg balls parked
    beside the course, launched at a fixed velocity when the robot's y
    crosses a per-sphere trigger, then simulated ballistically with
    ground bounce and a compliant sphere-base contact that pushes on the
    robot."""
    pos: jnp.ndarray        # (S, 3) world position
    vel: jnp.ndarray        # (S, 3) world velocity
    launched: jnp.ndarray   # (S,) bool
    trigger_y: jnp.ndarray  # (S,) robot-y threshold that launches
    launch_vel: jnp.ndarray  # (S, 3)


def init_projectiles(dtype=jnp.float32) -> Projectiles:
    """The reference's two spheres (positions :160-173, triggers/launch
    velocities :289-298)."""
    return Projectiles(
        pos=jnp.asarray([[-0.6, 0.9, 0.1], [0.6, 1.1, 0.1]], dtype),
        vel=jnp.zeros((2, 3), dtype),
        launched=jnp.zeros(2, bool),
        trigger_y=jnp.asarray([0.9, 1.1], dtype),
        launch_vel=jnp.asarray([[2.5, 0.0, 2.0], [-2.5, 0.0, 2.0]], dtype),
    )


PROJ_MASS = 0.4        # kg (scripts/PyBulletSimulator.py:160)
PROJ_RADIUS = 0.05     # sphere_smooth.obj at meshScale 0.1
BASE_RADIUS = 0.15     # effective robot-body contact radius
PROJ_STIFF = 2000.0    # compliant sphere-body contact stiffness [N/m]


def step_projectiles(cfg: Config, proj: Projectiles, base_pos, dt):
    """One dt of projectile dynamics. Returns (new_proj, force_on_base)."""
    dtype = proj.pos.dtype
    launched = proj.launched | (base_pos[1] >= proj.trigger_y)
    vel = jnp.where(proj.launched[:, None], proj.vel, 0.0)
    vel = jnp.where((launched & ~proj.launched)[:, None],
                    proj.launch_vel, vel)
    # gravity + ground bounce while launched
    vel = vel.at[:, 2].add(jnp.where(launched, -cfg.gravity * dt, 0.0))
    hit_ground = (proj.pos[:, 2] <= PROJ_RADIUS) & (vel[:, 2] < 0)
    vel = vel.at[:, 2].set(jnp.where(hit_ground, -0.5 * vel[:, 2],
                                     vel[:, 2]))
    # compliant contact with the robot body
    d = proj.pos - base_pos[None, :]
    dist = jnp.linalg.norm(d, axis=1)
    overlap = (PROJ_RADIUS + BASE_RADIUS) - dist
    n = d / jnp.maximum(dist, 1e-6)[:, None]
    fmag = jnp.maximum(overlap, 0.0) * PROJ_STIFF
    f_sphere = fmag[:, None] * n                      # pushes sphere away
    f_base = -jnp.sum(f_sphere, axis=0)               # reaction on robot
    vel = vel + jnp.where(launched[:, None],
                          f_sphere / PROJ_MASS * dt, 0.0)
    pos = proj.pos + jnp.where(launched[:, None], vel * dt, 0.0)
    pos = pos.at[:, 2].set(jnp.maximum(pos[:, 2], PROJ_RADIUS))
    return (proj._replace(pos=pos, vel=vel, launched=launched),
            f_base.astype(dtype))


class SimState(NamedTuple):
    q: jnp.ndarray             # (19,) base pos + quat + joints
    v: jnp.ndarray             # (18,) local base twist + joint rates
    anchors: jnp.ndarray       # (4, 2) tangential contact anchors (world xy)
    active: jnp.ndarray        # (4,) contact active flags
    prev_o_imu_vel: jnp.ndarray  # (3,) previous IMU-point velocity (world)
    joint_torques: jnp.ndarray   # (12,) applied torques (for logging)
    proj: Optional[Projectiles] = None  # envID=1 thrown spheres


def init_sim_state(cfg: Config, q_init=None, height: Optional[float] = None,
                   terrain=None, dtype=jnp.float32) -> SimState:
    """Initial simulator state with contact settling.

    The reference settles the robot onto the ground at startup by probing
    foot-ground contact and adjusting the base height
    (scripts/PyBulletSimulator.py:222-265). The in-graph equivalent:
    sample the terrain height under each foot's neutral (shoulder)
    position and raise the base so the lowest foot just touches —
    branch-free, so terrain scenarios batch like everything else."""
    from qrw_tpu.models.solo12 import H_INIT, make_solo12
    if q_init is None:
        q_init = jnp.asarray(cfg.q_init, dtype)
    h = H_INIT if height is None else height
    if terrain is not None:
        from qrw_tpu.sim.terrain import height_at
        sh = jnp.asarray(make_solo12().shoulders[0:2].T, dtype)   # (4, 2)
        h = h + jnp.max(height_at(terrain, sh))
    q = jnp.concatenate([jnp.stack([jnp.zeros((), dtype),
                                    jnp.zeros((), dtype),
                                    jnp.asarray(h, dtype),
                                    jnp.zeros((), dtype),
                                    jnp.zeros((), dtype),
                                    jnp.zeros((), dtype),
                                    jnp.ones((), dtype)]), q_init])
    return SimState(
        q=q, v=jnp.zeros(18, dtype),
        anchors=jnp.zeros((4, 2), dtype),
        active=jnp.zeros(4, bool),
        prev_o_imu_vel=jnp.zeros(3, dtype),
        joint_torques=jnp.zeros(12, dtype),
        proj=init_projectiles(dtype) if cfg.envID == 1 else None,
    )


def _contact_forces(cfg: Config, state: SimState, pos, vel, ground_h=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World-frame ground forces at the 4 feet + updated anchor state.

    pos/vel: (4, 3) world foot positions / velocities; ground_h: (4,)
    terrain height under each foot (None = flat plane z=0)."""
    if ground_h is None:
        ground_h = jnp.zeros(4, pos.dtype)
    pen = ground_h - pos[:, 2]                        # penetration depth
    in_ground = pen > 0.0
    fn = jnp.maximum(0.0,
                     cfg.ground_stiffness * pen
                     - cfg.ground_damping * vel[:, 2])
    fn = jnp.where(in_ground, fn, 0.0)

    # tangential anchor spring, clamped to the friction cone
    anchors = jnp.where((in_ground & ~state.active)[:, None],
                        pos[:, 0:2], state.anchors)
    raw = (-cfg.ground_stiffness * (pos[:, 0:2] - anchors)
           - cfg.ground_damping * vel[:, 0:2])
    norm = jnp.linalg.norm(raw, axis=1)
    fmax = cfg.sim_mu * fn
    scale = jnp.where(norm > fmax, fmax / jnp.maximum(norm, 1e-9), 1.0)
    ft = raw * scale[:, None]
    ft = jnp.where(in_ground[:, None], ft, 0.0)
    # slide the anchor when the cone saturates (keeps the spring consistent)
    anchors = jnp.where((in_ground & (norm > fmax))[:, None],
                        pos[:, 0:2]
                        + (ft + cfg.ground_damping * vel[:, 0:2])
                        / cfg.ground_stiffness,
                        anchors)
    forces = jnp.concatenate([ft, fn[:, None]], axis=1)   # (4, 3)
    return forces, anchors, in_ground


def step(cfg: Config, model: rbd.JaxModel, state: SimState, P, D, q_des,
         v_des, tau_ff, f_ext=None,
         terrain=None) -> Tuple[SimState, DeviceData]:
    """Advance one WBC tick (dt_wbc) with cfg.sim_substeps physics substeps.

    The PD+feedforward torque is computed once per tick from start-of-tick
    measurements, like the device facade (scripts/PyBulletSimulator.py:
    679-700). f_ext: optional (3,) world force on the base; terrain:
    optional sim.terrain.Terrain height field (None = flat plane)."""
    from qrw_tpu.sim.terrain import height_at
    dtype = state.q.dtype
    dt = cfg.dt_wbc / cfg.sim_substeps
    if f_ext is None:
        f_ext = jnp.zeros(3, dtype)

    q_mes0 = state.q[7:]
    v_mes0 = state.v[6:]
    tau = P * (q_des - q_mes0) + D * (v_des - v_mes0) + tau_ff

    def substep(carry, _):
        q, v, anchors, active, proj = carry
        base_pos, quat, qj = q[0:3], q[3:7], q[7:]
        kin = rbd.frame_kinematics(model, base_pos, quat, qj, v[0:6], v[6:])
        ground_h = (height_at(terrain, kin.pos[:, 0:2])
                    if terrain is not None else None)
        forces, anchors, active = _contact_forces(
            cfg, SimState(q, v, anchors, active,
                          state.prev_o_imu_vel, tau),
            kin.pos, kin.vel, ground_h)
        J = rbd.foot_jacobians(model, base_pos, quat, qj,
                               fk=(kin.R, kin.p))            # (4, 3, 18)
        f_gen = jnp.einsum("fan,fa->n", J, forces)
        f_world = f_ext
        if proj is not None:
            proj, f_proj = step_projectiles(cfg, proj, base_pos, dt)
            f_world = f_world + f_proj
        f_gen = f_gen.at[0:3].add(quat_to_rot(quat).T @ f_world)
        h = rbd.rnea(model, quat, qj, v, jnp.zeros(18, dtype), cfg.gravity)
        M = rbd.crba(model, qj)
        rhs = (f_gen - h).at[6:].add(tau)
        # M is the SPD joint-space inertia. The UNROLLED Cholesky solve
        # (ops/lin.py) keeps the whole factorization elementwise over
        # the vmapped batch: 2.57 ms -> 0.025 ms at B=1024 on v5e vs
        # the LAPACK-style jnp.linalg path (which was itself 2x the LU
        # it replaced) — the largest single win in the fleet physics.
        a = lin.chol_solve(M, rhs)
        v_new = v + dt * a
        R = quat_to_rot(quat)
        q_new = q.at[0:3].add(dt * (R @ v_new[0:3]))
        q_new = q_new.at[3:7].set(quat_integrate(quat, v_new[3:6], dt))
        q_new = q_new.at[7:].add(dt * v_new[6:])
        return (q_new, v_new, anchors, active, proj), None

    (q, v, anchors, active, proj), _ = jax.lax.scan(
        substep, (state.q, state.v, state.anchors, state.active,
                  state.proj),
        None, length=cfg.sim_substeps)

    # ---- measurement synthesis -------------------------------------------
    R = quat_to_rot(q[3:7])
    o_base_vel = R @ v[0:3]
    omega_b = v[3:6]
    imu_r = jnp.asarray(cfg.imu_offset, dtype)
    # same r x omega lever-arm convention as the reference device facade
    # and estimator (scripts/PyBulletSimulator.py:626-628)
    o_imu_vel = o_base_vel + R @ jnp.cross(imu_r, omega_b)
    base_lin_acc = R.T @ (o_imu_vel - state.prev_o_imu_vel) / cfg.dt_wbc

    device = DeviceData(
        base_lin_acc=base_lin_acc,
        base_ang_vel=omega_b,
        base_quat=q[3:7],
        q_mes=q[7:],
        v_mes=v[6:],
        dummy_pos=q[0:3],
        b_base_vel=v[0:3],
    )
    new_state = SimState(q=q, v=v, anchors=anchors, active=active,
                         prev_o_imu_vel=o_imu_vel, joint_torques=tau,
                         proj=proj)
    return new_state, device
