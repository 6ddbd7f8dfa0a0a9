"""Solo-12 quadruped model: kinematic tree + inertial parameters.

The reference obtains its model from the `example_robot_data` Solo-12 URDF at
runtime (scripts/utils_mpc.py:114-150). Neither that package nor Pinocchio is
a dependency here; instead the tree is reconstructed from the authoritative
geometric constants the reference hard-codes:

  * shoulder (neutral footstep) positions (+-0.1946, +-0.14695)
    (scripts/Controller.py:131-133, src/MPC.cpp:24)
  * total mass 2.50000279 kg and whole-body rotational inertia gI
    (src/MPC.cpp:17,25-26)
  * IMU lever arm (0.1163, 0, 0.02) (scripts/Estimator.py:323-324)
  * foot frame order [FL, FR, HL, HR] (scripts/QP_WBC.py:50)

Topology (13 bodies, 12 revolute joints): a free-flyer base and four
identical 3-DoF legs HAA (x-axis) -> HFE (y-axis) -> KFE (y-axis), segment
lengths 0.16 m + 0.16 m, with lateral offsets 0.0875 + 0.014 + 0.03745 +
0.008 = 0.14695 m — which reproduces the reference's shoulder constant
exactly.

Link inertias: leg-link masses follow the open-source Solo-12 hardware
(upper ~0.149 kg, lower+foot ~0.038 kg) with rod/cylinder inertia models;
the *base* center of mass and rotational inertia are then solved for so that
the whole-robot aggregate at the reference joint configuration q_init
reproduces the reference's CoM offset (0,0,-0.03) (src/MPC.cpp:21) and
whole-body inertia gI (src/MPC.cpp:25-26) exactly. This pins the dynamics
that actually matter (the centroidal model the MPC optimizes) to the
reference's own constants.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

NUM_BODIES = 13     # base + 4 legs x 3 links
NUM_JOINTS = 12
NUM_FEET = 4

# leg order: FL, FR, HL, HR  (scripts/QP_WBC.py:50)
_LEG_SIGNS = [(+1.0, +1.0), (+1.0, -1.0), (-1.0, +1.0), (-1.0, -1.0)]

# segment geometry [m]
_HAA_X = 0.1946        # fore/aft offset of the hip from base center
_HAA_Y = 0.0875        # lateral offset base -> HAA
_HFE_Y = 0.014         # lateral offset HAA -> HFE
_KFE_Y = 0.03745       # lateral offset HFE -> KFE
_FOOT_Y = 0.008        # lateral offset KFE -> foot
_UPPER_L = 0.16        # upper leg length (HFE -> KFE, along -z)
_LOWER_L = 0.16        # lower leg length (KFE -> foot, along -z)

# link masses [kg]; total = base + 4 * (haa + upper + lower) = 2.50000279
_M_HAA = 0.14853845
_M_UPPER = 0.14853845
_M_LOWER = 0.03764    # lower leg + foot
_M_BASE = 2.50000279 - 4.0 * (_M_HAA + _M_UPPER + _M_LOWER)

# reference aggregate constants (src/MPC.cpp:17-26)
TOTAL_MASS = 2.50000279
GI = np.array([[3.09249e-2, -8.00101e-7, 1.865287e-5],
               [-8.00101e-7, 5.106100e-2, 1.245813e-4],
               [1.865287e-5, 1.245813e-4, 6.939757e-2]])
COM_OFFSET = np.array([0.0, 0.0, -0.03])   # CoM relative to base origin
Q_INIT = np.array([0.0, 0.7, -1.4, -0.0, 0.7, -1.4,
                   0.0, -0.7, 1.4, -0.0, -0.7, 1.4])


class Solo12Model(NamedTuple):
    """Static model data (numpy; converted lazily by jnp ops).

    Joint/body i (1..12) is connected to `parent[i]` by a revolute joint with
    axis `joint_axis[i]` and frame translation `joint_pos[i]` (no fixed
    rotation: all joint frames are axis-aligned with the base).
    Index 0 is the free-flyer base. Arrays are indexed by body (0..12).
    """
    parent: np.ndarray          # (13,) int, parent[0] = -1
    joint_axis: np.ndarray      # (13, 3), row 0 unused
    joint_pos: np.ndarray       # (13, 3), row 0 unused
    mass: np.ndarray            # (13,)
    com: np.ndarray             # (13, 3) CoM in body frame
    inertia: np.ndarray         # (13, 3, 3) rotational inertia about CoM
    foot_body: np.ndarray       # (4,) int — body index carrying each foot
    foot_pos: np.ndarray        # (4, 3) foot frame translation in body frame
    shoulders: np.ndarray       # (3, 4) neutral footstep positions
    imu_offset: np.ndarray      # (3,)
    foot_joints: np.ndarray     # (4, 3) int — joint indices (0..11) per leg

    @property
    def nv(self) -> int:
        return 6 + NUM_JOINTS


def _rod_inertia(mass: float, length: float, radius: float) -> np.ndarray:
    """Solid-rod inertia about its CoM, rod along z."""
    ixx = mass * (3 * radius ** 2 + length ** 2) / 12.0
    izz = 0.5 * mass * radius ** 2
    return np.diag([ixx, ixx, izz])


def _leg_link_params(sy: float):
    """Per-leg link (mass, com, inertia) for haa / upper / lower links."""
    haa = (_M_HAA, np.array([0.0, sy * 0.5 * _HFE_Y, 0.0]),
           _rod_inertia(_M_HAA, 0.06, 0.03))
    upper = (_M_UPPER, np.array([0.0, sy * 0.019, -0.5 * _UPPER_L]),
             _rod_inertia(_M_UPPER, _UPPER_L, 0.015))
    lower = (_M_LOWER, np.array([0.0, sy * 0.5 * _FOOT_Y, -0.55 * _LOWER_L]),
             _rod_inertia(_M_LOWER, _LOWER_L, 0.008))
    return [haa, upper, lower]


def _leg_fk_points(q_leg: np.ndarray, sx: float, sy: float):
    """Host-side FK for one leg at base pose = identity.

    Returns [(R, p)] world pose for haa / upper / lower frames.
    """
    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    p_haa = np.array([sx * _HAA_X, sy * _HAA_Y, 0.0])
    R_haa = rot_x(q_leg[0])
    p_hfe = p_haa + R_haa @ np.array([0.0, sy * _HFE_Y, 0.0])
    R_hfe = R_haa @ rot_y(q_leg[1])
    p_kfe = p_hfe + R_hfe @ np.array([0.0, sy * _KFE_Y, -_UPPER_L])
    R_kfe = R_hfe @ rot_y(q_leg[2])
    return [(R_haa, p_haa), (R_hfe, p_hfe), (R_kfe, p_kfe)]


def _calibrate_base(mass_links, com_links_world):
    """Solve base CoM + inertia so the aggregate at Q_INIT matches the
    reference's CoM offset and gI."""
    m_legs = np.sum(mass_links)
    com_weighted = np.einsum("i,ij->j", mass_links, com_links_world)
    # base CoM such that total CoM == COM_OFFSET
    base_com = (TOTAL_MASS * COM_OFFSET - com_weighted) / _M_BASE
    return base_com


def make_solo12() -> Solo12Model:
    parent = np.full(NUM_BODIES, -1, dtype=np.int32)
    joint_axis = np.zeros((NUM_BODIES, 3))
    joint_pos = np.zeros((NUM_BODIES, 3))
    mass = np.zeros(NUM_BODIES)
    com = np.zeros((NUM_BODIES, 3))
    inertia = np.zeros((NUM_BODIES, 3, 3))
    foot_body = np.zeros(NUM_FEET, dtype=np.int32)
    foot_pos = np.zeros((NUM_FEET, 3))
    foot_joints = np.zeros((NUM_FEET, 3), dtype=np.int32)
    shoulders = np.zeros((3, NUM_FEET))

    # --- legs --------------------------------------------------------
    leg_mass = []
    leg_com_world = []
    for leg, (sx, sy) in enumerate(_LEG_SIGNS):
        base_idx = 1 + 3 * leg
        links = _leg_link_params(sy)
        frames = _leg_fk_points(Q_INIT[3 * leg:3 * leg + 3], sx, sy)
        # haa
        parent[base_idx] = 0
        joint_axis[base_idx] = [1.0, 0.0, 0.0]
        joint_pos[base_idx] = [sx * _HAA_X, sy * _HAA_Y, 0.0]
        # hfe
        parent[base_idx + 1] = base_idx
        joint_axis[base_idx + 1] = [0.0, 1.0, 0.0]
        joint_pos[base_idx + 1] = [0.0, sy * _HFE_Y, 0.0]
        # kfe
        parent[base_idx + 2] = base_idx + 1
        joint_axis[base_idx + 2] = [0.0, 1.0, 0.0]
        joint_pos[base_idx + 2] = [0.0, sy * _KFE_Y, -_UPPER_L]
        for k, (m, c, ic) in enumerate(links):
            mass[base_idx + k] = m
            com[base_idx + k] = c
            inertia[base_idx + k] = ic
            R, p = frames[k]
            leg_mass.append(m)
            leg_com_world.append(p + R @ c)
        foot_body[leg] = base_idx + 2
        foot_pos[leg] = [0.0, sy * _FOOT_Y, -_LOWER_L]
        foot_joints[leg] = [3 * leg, 3 * leg + 1, 3 * leg + 2]
        shoulders[:, leg] = [sx * _HAA_X, sy * 0.14695, 0.0]

    # --- base (calibrated against reference aggregates) --------------
    leg_mass = np.array(leg_mass)
    leg_com_world = np.array(leg_com_world)
    mass[0] = _M_BASE
    com[0] = _calibrate_base(leg_mass, leg_com_world)

    # leg rotational contribution about the total CoM at Q_INIT
    leg_I = np.zeros((3, 3))
    idx = 0
    for leg, (sx, sy) in enumerate(_LEG_SIGNS):
        frames = _leg_fk_points(Q_INIT[3 * leg:3 * leg + 3], sx, sy)
        for k, (m, c, ic) in enumerate(_leg_link_params(sy)):
            R, p = frames[k]
            d = (p + R @ c) - COM_OFFSET
            dd = np.eye(3) * (d @ d) - np.outer(d, d)
            leg_I += R @ ic @ R.T + m * dd
            idx += 1
    d = com[0] - COM_OFFSET
    dd = np.eye(3) * (d @ d) - np.outer(d, d)
    base_I = GI - leg_I - _M_BASE * dd
    # symmetrize and guard positive-definiteness
    base_I = 0.5 * (base_I + base_I.T)
    w, V = np.linalg.eigh(base_I)
    base_I = V @ np.diag(np.maximum(w, 1e-4)) @ V.T
    inertia[0] = base_I

    return Solo12Model(
        parent=parent, joint_axis=joint_axis, joint_pos=joint_pos,
        mass=mass, com=com, inertia=inertia,
        foot_body=foot_body, foot_pos=foot_pos, shoulders=shoulders,
        imu_offset=np.array([0.1163, 0.0, 0.02]),
        foot_joints=foot_joints,
    )


# Neutral base height at Q_INIT: distance base origin -> foot z
# (scripts/utils_mpc.py:147). Both segments fold by 0.7 rad.
H_INIT = _UPPER_L * np.cos(0.7) + _LOWER_L * np.cos(0.7)
