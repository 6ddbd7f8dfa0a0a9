"""Rigid-body dynamics kernels for the Solo-12 (Pinocchio replacement).

Implements, as pure jittable JAX functions over the static Solo-12 tree:
  * forward kinematics + foot frame kinematics (pos/vel/classical drift),
    replacing pin.forwardKinematics / getFrameVelocity / getFrameAcceleration
    as used by scripts/solo12InvKin.py:47-59;
  * LOCAL_WORLD_ALIGNED foot Jacobians, replacing pin.getFrameJacobian
    (scripts/QP_WBC.py:96-101);
  * CRBA joint-space inertia, replacing pin.crba (scripts/QP_WBC.py:91);
  * RNEA inverse dynamics, replacing pin.rnea (scripts/QP_WBC.py:104,116).

Conventions match Pinocchio's free-flyer:
  generalized velocity v = [base linear (base frame), base angular (base
  frame), 12 joint rates]; acceleration = d/dt of v (local spatial
  acceleration for the base). RNEA output rows 0:6 are the base wrench
  [force; torque] in the base frame about the base origin.

Internally the algorithms use Featherstone spatial algebra in body-local
coordinates with angular-first 6-vectors; conversion happens at the API
boundary only. The 13-body tree is unrolled at trace time (static topology),
so XLA sees straight-line fused elementwise/3x3-matmul code — ideal for the
VPU; batching over robots/scenarios is done with jax.vmap outside.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from qrw_tpu.models.solo12 import NUM_BODIES, NUM_FEET, Solo12Model
from qrw_tpu.ops.rotations import quat_to_rot, skew


class JaxModel(NamedTuple):
    parent: tuple            # static python ints for trace-time unrolling
    joint_axis: jnp.ndarray  # (13, 3)
    joint_pos: jnp.ndarray   # (13, 3)
    mass: jnp.ndarray        # (13,)
    com: jnp.ndarray         # (13, 3)
    inertia_o: jnp.ndarray   # (13, 3, 3) inertia about body origin
    foot_body: tuple         # static ints
    foot_pos: jnp.ndarray    # (4, 3)
    shoulders: jnp.ndarray   # (3, 4)
    imu_offset: jnp.ndarray  # (3,)


def to_jax(model: Solo12Model) -> JaxModel:
    # inertia about the body origin: I_o = I_com - m [c]x [c]x
    cx = np.stack([_np_skew(c) for c in model.com])
    inertia_o = model.inertia - model.mass[:, None, None] * (cx @ cx)
    return JaxModel(
        parent=tuple(int(p) for p in model.parent),
        joint_axis=jnp.asarray(model.joint_axis),
        joint_pos=jnp.asarray(model.joint_pos),
        mass=jnp.asarray(model.mass),
        com=jnp.asarray(model.com),
        inertia_o=jnp.asarray(inertia_o),
        foot_body=tuple(int(b) for b in model.foot_body),
        foot_pos=jnp.asarray(model.foot_pos),
        shoulders=jnp.asarray(model.shoulders),
        imu_offset=jnp.asarray(model.imu_offset),
    )


def _np_skew(v):
    return np.array([[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]])


def _axis_rot(axis, q):
    """Rotation of angle q about a unit axis (Rodrigues)."""
    c, s = jnp.cos(q), jnp.sin(q)
    K = skew(axis)
    return jnp.eye(3, dtype=K.dtype) + s * K + (1.0 - c) * (K @ K)


def _cast_model(model: JaxModel, dtype) -> JaxModel:
    """Cast model constants to the computation dtype — under x64 the
    stored arrays are f64, which would silently promote f32 states."""
    return model._replace(
        joint_axis=model.joint_axis.astype(dtype),
        joint_pos=model.joint_pos.astype(dtype),
        mass=model.mass.astype(dtype),
        com=model.com.astype(dtype),
        inertia_o=model.inertia_o.astype(dtype),
        foot_pos=model.foot_pos.astype(dtype),
        shoulders=model.shoulders.astype(dtype),
        imu_offset=model.imu_offset.astype(dtype),
    )


# ----------------------------------------------------------------------
# World-frame kinematics (FK, frame velocities, classical drift)
# ----------------------------------------------------------------------

def fk_world(model: JaxModel, base_pos, base_quat, qj):
    """Forward kinematics: world rotation and origin of each body.

    Returns (R: (13,3,3), p: (13,3))."""
    model = _cast_model(model, qj.dtype)
    R0 = quat_to_rot(base_quat)
    Rs = [R0]
    ps = [base_pos]
    for i in range(1, NUM_BODIES):
        par = model.parent[i]
        Rj = _axis_rot(model.joint_axis[i], qj[i - 1])
        Rs.append(Rs[par] @ Rj)
        ps.append(ps[par] + Rs[par] @ model.joint_pos[i])
    return jnp.stack(Rs), jnp.stack(ps)


class FrameKin(NamedTuple):
    pos: jnp.ndarray    # (4, 3) foot position, world
    vel: jnp.ndarray    # (4, 3) foot point velocity, world axes
    omega: jnp.ndarray  # (4, 3) foot body angular velocity, world axes
    drift: jnp.ndarray  # (4, 3) classical foot acceleration with qdd = 0
    R: jnp.ndarray      # (13, 3, 3) body rotations
    p: jnp.ndarray      # (13, 3) body origins


def frame_kinematics(model: JaxModel, base_pos, base_quat, qj,
                     base_vel_local, vj) -> FrameKin:
    """Foot frame position / velocity / classical drift acceleration.

    `base_vel_local` is the 6-vector [linear; angular] base twist in the base
    frame (Pinocchio free-flyer convention); pass zeros for a fixed base.
    The drift equals getFrameAcceleration(LOCAL_WORLD_ALIGNED).linear
    + omega x vel, i.e. exactly the term subtracted by the reference IK
    (src/InvKin.cpp:48).
    """
    model = _cast_model(model, qj.dtype)
    R0 = quat_to_rot(base_quat)
    w0 = R0 @ base_vel_local[3:6]
    v0 = R0 @ base_vel_local[0:3]
    R = [R0]
    p = [base_pos]
    w = [w0]
    v = [v0]
    # zero *spatial* acceleration (Pinocchio convention: constant local
    # twist) => classical acceleration of the base origin is omega x v
    dw = [jnp.zeros(3, dtype=base_pos.dtype)]
    a = [jnp.cross(w0, v0)]
    for i in range(1, NUM_BODIES):
        par = model.parent[i]
        Rj = _axis_rot(model.joint_axis[i], qj[i - 1])
        Ri = R[par] @ Rj
        r_w = R[par] @ model.joint_pos[i]
        pi = p[par] + r_w
        a_w = R[par] @ model.joint_axis[i]
        qd = vj[i - 1]
        wi = w[par] + a_w * qd
        vi = v[par] + jnp.cross(w[par], r_w)
        dwi = dw[par] + qd * jnp.cross(w[par], a_w)
        ai = a[par] + jnp.cross(dw[par], r_w) + jnp.cross(w[par], jnp.cross(w[par], r_w))
        R.append(Ri); p.append(pi); w.append(wi); v.append(vi)
        dw.append(dwi); a.append(ai)
    pos, vel, om, drift = [], [], [], []
    for f in range(NUM_FEET):
        b = model.foot_body[f]
        rc = R[b] @ model.foot_pos[f]
        pos.append(p[b] + rc)
        vel.append(v[b] + jnp.cross(w[b], rc))
        om.append(w[b])
        drift.append(a[b] + jnp.cross(dw[b], rc)
                     + jnp.cross(w[b], jnp.cross(w[b], rc)))
    return FrameKin(pos=jnp.stack(pos), vel=jnp.stack(vel),
                    omega=jnp.stack(om), drift=jnp.stack(drift),
                    R=jnp.stack(R), p=jnp.stack(p))


def foot_jacobians(model: JaxModel, base_pos, base_quat, qj):
    """LOCAL_WORLD_ALIGNED linear foot Jacobians, (4, 3, 18).

    Columns 0:6 act on the local base twist [linear; angular]
    (Pinocchio convention, scripts/QP_WBC.py:96-101); columns 6:18 on joint
    rates. The (4, 3, 12) actuated sub-block has per-leg 3x3 diagonal
    structure (each foot depends only on its own leg's joints), which the
    IK exploits (src/InvKin.cpp:56).
    """
    model = _cast_model(model, qj.dtype)
    R, p = fk_world(model, base_pos, base_quat, qj)
    axes_w = [None] * NUM_BODIES
    for i in range(1, NUM_BODIES):
        axes_w[i] = R[model.parent[i]] @ model.joint_axis[i]
    Js = []
    for f in range(NUM_FEET):
        b = model.foot_body[f]
        pf = p[b] + R[b] @ model.foot_pos[f]
        J = jnp.zeros((3, 18), dtype=pf.dtype)
        J = J.at[:, 0:3].set(R[0])
        J = J.at[:, 3:6].set(-skew(pf - p[0]) @ R[0])
        i = b
        while i > 0:
            col = jnp.cross(axes_w[i], pf - p[i])
            J = J.at[:, 6 + i - 1].set(col)
            i = model.parent[i]
        Js.append(J)
    return jnp.stack(Js)


# ----------------------------------------------------------------------
# Featherstone spatial algebra (local coordinates, angular-first)
# ----------------------------------------------------------------------

def _xmot(E, r, m):
    """Motion transform child<-parent: m = (omega, v)."""
    w, v = m[:3], m[3:]
    return jnp.concatenate([E @ w, E @ (v - jnp.cross(r, w))])


def _xforce_to_parent(E, r, f):
    """Force transform child->parent: f = (n, f_lin)."""
    n, fl = f[:3], f[3:]
    fl_p = E.T @ fl
    return jnp.concatenate([E.T @ n + jnp.cross(r, fl_p), fl_p])


def _cross_motion(a, b):
    aw, av = a[:3], a[3:]
    bw, bv = b[:3], b[3:]
    return jnp.concatenate([jnp.cross(aw, bw), jnp.cross(aw, bv) + jnp.cross(av, bw)])


def _cross_force(v, f):
    w, vl = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)])


def _apply_inertia(model: JaxModel, i, v6):
    """Spatial inertia of body i applied to motion (omega, v) -> (n, f)."""
    w, vl = v6[:3], v6[3:]
    m = model.mass[i]
    c = model.com[i]
    n = model.inertia_o[i] @ w + m * jnp.cross(c, vl)
    f = m * vl - m * jnp.cross(c, w)
    return jnp.concatenate([n, f])


def _spatial_inertia_mat(model: JaxModel, i):
    """6x6 spatial inertia of body i (angular-first)."""
    m = model.mass[i]
    cx = skew(model.com[i])
    top = jnp.concatenate([model.inertia_o[i], m * cx], axis=1)
    bot = jnp.concatenate([-m * cx, m * jnp.eye(3, dtype=cx.dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _xmat(E, r):
    """6x6 motion transform child<-parent (angular-first)."""
    z = jnp.zeros((3, 3), dtype=E.dtype)
    top = jnp.concatenate([E, z], axis=1)
    bot = jnp.concatenate([-E @ skew(r), E], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _joint_transforms(model: JaxModel, qj):
    Es, rs = [None], [None]
    for i in range(1, NUM_BODIES):
        Es.append(_axis_rot(model.joint_axis[i], qj[i - 1]).T)
        rs.append(model.joint_pos[i])
    return Es, rs


def _reorder_in(v6):
    """[linear; angular] (pinocchio) -> (angular, linear) (featherstone)."""
    return jnp.concatenate([v6[3:6], v6[0:3]])


def _reorder_out(f6):
    """(n, f) featherstone force -> [force; torque] pinocchio."""
    return jnp.concatenate([f6[3:6], f6[0:3]])


def rnea(model: JaxModel, base_quat, qj, v, a, gravity: float = 9.81):
    """Recursive Newton-Euler inverse dynamics.

    v, a: (18,) in Pinocchio free-flyer convention. Returns tau (18,):
    rows 0:6 base wrench [force; torque] in base frame, rows 6:18 joint
    torques — matching pin.rnea as used in scripts/QP_WBC.py:104,116.
    """
    model = _cast_model(model, v.dtype)
    Es, rs = _joint_transforms(model, qj)
    R0 = quat_to_rot(base_quat)
    v0 = _reorder_in(v[:6])
    a0 = _reorder_in(a[:6])
    # gravity pseudo-acceleration in base coordinates
    gvec = jnp.array([0.0, 0.0, gravity], dtype=v.dtype)
    a0 = a0 + jnp.concatenate([jnp.zeros(3, dtype=v.dtype), R0.T @ gvec])

    vs = [v0]
    accs = [a0]
    fs = [None] * NUM_BODIES
    fs[0] = _apply_inertia(model, 0, a0) + _cross_force(v0, _apply_inertia(model, 0, v0))
    for i in range(1, NUM_BODIES):
        par = model.parent[i]
        S = jnp.concatenate([model.joint_axis[i], jnp.zeros(3, dtype=v.dtype)])
        vi = _xmot(Es[i], rs[i], vs[par]) + S * v[6 + i - 1]
        ai = (_xmot(Es[i], rs[i], accs[par]) + S * a[6 + i - 1]
              + _cross_motion(vi, S * v[6 + i - 1]))
        vs.append(vi)
        accs.append(ai)
        fs[i] = _apply_inertia(model, i, ai) + _cross_force(vi, _apply_inertia(model, i, vi))
    tau_j = [None] * 12
    for i in range(NUM_BODIES - 1, 0, -1):
        par = model.parent[i]
        S = jnp.concatenate([model.joint_axis[i], jnp.zeros(3, dtype=v.dtype)])
        tau_j[i - 1] = S @ fs[i]
        fs[par] = fs[par] + _xforce_to_parent(Es[i], rs[i], fs[i])
    return jnp.concatenate([_reorder_out(fs[0]), jnp.stack(tau_j)])


def crba(model: JaxModel, qj):
    """Composite-rigid-body joint-space inertia matrix M (18, 18) in
    Pinocchio free-flyer coordinates (scripts/QP_WBC.py:91). The base
    orientation does not affect M in local coordinates."""
    model = _cast_model(model, qj.dtype)
    Es, rs = _joint_transforms(model, qj)
    Ic = [_spatial_inertia_mat(model, i) for i in range(NUM_BODIES)]
    X = [None] + [_xmat(Es[i], rs[i]) for i in range(1, NUM_BODIES)]
    for i in range(NUM_BODIES - 1, 0, -1):
        par = model.parent[i]
        Ic[par] = Ic[par] + X[i].T @ Ic[i] @ X[i]
    dtype = Ic[0].dtype
    H = jnp.zeros((18, 18), dtype=dtype)
    # base block (featherstone (ang, lin) -> reorder below)
    for i in range(1, NUM_BODIES):
        S = jnp.concatenate([model.joint_axis[i], jnp.zeros(3, dtype=dtype)])
        F = Ic[i] @ S
        H = H.at[6 + i - 1, 6 + i - 1].set(S @ F)
        j = i
        Fj = F
        while model.parent[j] > 0:
            Fj = X[j].T @ Fj
            j = model.parent[j]
            Sj = jnp.concatenate([model.joint_axis[j], jnp.zeros(3, dtype=dtype)])
            val = Fj @ Sj
            H = H.at[6 + i - 1, 6 + j - 1].set(val)
            H = H.at[6 + j - 1, 6 + i - 1].set(val)
        Fb = X[j].T @ Fj  # into base coordinates
        col = _reorder_out(Fb)  # (force, torque) ordering for rows 0:6
        H = H.at[0:6, 6 + i - 1].set(col)
        H = H.at[6 + i - 1, 0:6].set(col)
    Ib = Ic[0]
    # reorder base 6x6 block from (ang, lin) to (lin, ang)
    P = jnp.zeros((6, 6), dtype=dtype)
    P = P.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype))
    P = P.at[3:6, 0:3].set(jnp.eye(3, dtype=dtype))
    H = H.at[0:6, 0:6].set(P @ Ib @ P.T)
    return H


def nonlinear_effects(model: JaxModel, base_quat, qj, v, gravity: float = 9.81):
    """Coriolis + centrifugal + gravity generalized forces (18,):
    rnea(q, v, 0)."""
    return rnea(model, base_quat, qj, v, jnp.zeros(18, dtype=v.dtype), gravity)
