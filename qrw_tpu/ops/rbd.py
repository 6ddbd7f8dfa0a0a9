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
boundary only. The tree is LEG-VECTORIZED: the four legs are identical
three-joint chains hanging off the base (models/solo12.py lays bodies
out leg-major, body 1 + 3*leg + level), so every recursion runs over
THREE sequential tree levels with the four legs batched on a leading
axis — (4, 3) / (4, 3, 3) / (4, 6, 6) tensors instead of per-body
3-vectors. This cuts the op count ~4x versus a per-body unroll (the
per-tick cost of the vmapped fleet pipeline is op-dispatch-bound, not
FLOP-bound) while producing identical values; batching over
robots/scenarios is done with jax.vmap outside.
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
# Leg-vectorized primitives: leading axis = the 4 legs
# ----------------------------------------------------------------------

def _legs_view(a):
    """(13, ...) body array -> (4 legs, 3 levels, ...) view of bodies
    1..12 (leg-major layout, body index 1 + 3*leg + level)."""
    return a[1:].reshape((4, 3) + a.shape[1:])


def _skew_legs(v):
    """(..., 3) -> (..., 3, 3) cross-product matrices."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1)], -2)


def _axis_rot_legs(axes, q):
    """Rodrigues for (4, 3) unit axes and (4,) angles -> (4, 3, 3)."""
    c, s = jnp.cos(q), jnp.sin(q)
    K = _skew_legs(axes)
    K2 = jnp.einsum("fab,fbc->fac", K, K)
    return (jnp.eye(3, dtype=K.dtype)
            + s[:, None, None] * K + (1.0 - c)[:, None, None] * K2)


# ----------------------------------------------------------------------
# World-frame kinematics (FK, frame velocities, classical drift)
# ----------------------------------------------------------------------

def _fk_levels(model: JaxModel, base_pos, base_quat, qj):
    """Shared FK sweep: returns (R0, [R per level (4,3,3)],
    [p per level (4,3)], axes (4,3,3), jpos (4,3,3))."""
    R0 = quat_to_rot(base_quat)
    axes = _legs_view(model.joint_axis)           # (4, 3, 3) leg, lvl, xyz
    jpos = _legs_view(model.joint_pos)
    q = qj.reshape(4, 3)
    Rp = jnp.broadcast_to(R0, (4, 3, 3))
    pp = jnp.broadcast_to(base_pos, (4, 3))
    Rs, ps = [], []
    for l in range(3):
        Rj = _axis_rot_legs(axes[:, l], q[:, l])
        ps.append(pp + jnp.einsum("fab,fb->fa", Rp, jpos[:, l]))
        Rs.append(jnp.einsum("fab,fbc->fac", Rp, Rj))
        Rp, pp = Rs[-1], ps[-1]
    return R0, Rs, ps, axes, jpos


def _assemble13(x0, xs):
    """(x0 (..,), [three (4, ..) levels]) -> (13, ..) body-ordered."""
    legs = jnp.stack(xs, axis=1)                  # (4, 3, ...)
    legs = legs.reshape((12,) + legs.shape[2:])
    return jnp.concatenate([x0[None], legs], axis=0)


def fk_world(model: JaxModel, base_pos, base_quat, qj):
    """Forward kinematics: world rotation and origin of each body.

    Returns (R: (13,3,3), p: (13,3))."""
    model = _cast_model(model, qj.dtype)
    R0, Rs, ps, _, _ = _fk_levels(model, base_pos, base_quat, qj)
    return _assemble13(R0, Rs), _assemble13(base_pos, ps)


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
    dtype = qj.dtype
    axes = _legs_view(model.joint_axis)
    jpos = _legs_view(model.joint_pos)
    q = qj.reshape(4, 3)
    qd = vj.reshape(4, 3)

    R0 = quat_to_rot(base_quat)
    w0 = R0 @ base_vel_local[3:6]
    v0 = R0 @ base_vel_local[0:3]
    # zero *spatial* acceleration (Pinocchio convention: constant local
    # twist) => classical acceleration of the base origin is omega x v
    Rp = jnp.broadcast_to(R0, (4, 3, 3))
    pp = jnp.broadcast_to(base_pos, (4, 3))
    wp = jnp.broadcast_to(w0, (4, 3))
    vp = jnp.broadcast_to(v0, (4, 3))
    dwp = jnp.zeros((4, 3), dtype)
    ap = jnp.broadcast_to(jnp.cross(w0, v0), (4, 3))

    Rs, ps = [], []
    for l in range(3):
        Rj = _axis_rot_legs(axes[:, l], q[:, l])
        r_w = jnp.einsum("fab,fb->fa", Rp, jpos[:, l])
        a_w = jnp.einsum("fab,fb->fa", Rp, axes[:, l])
        qdl = qd[:, l][:, None]
        Ri = jnp.einsum("fab,fbc->fac", Rp, Rj)
        pi = pp + r_w
        wi = wp + a_w * qdl
        vi = vp + jnp.cross(wp, r_w)
        dwi = dwp + qdl * jnp.cross(wp, a_w)
        ai = ap + jnp.cross(dwp, r_w) + jnp.cross(wp, jnp.cross(wp, r_w))
        Rs.append(Ri)
        ps.append(pi)
        Rp, pp, wp, vp, dwp, ap = Ri, pi, wi, vi, dwi, ai

    rc = jnp.einsum("fab,fb->fa", Rp, model.foot_pos)      # (4, 3)
    pos = pp + rc
    vel = vp + jnp.cross(wp, rc)
    drift = (ap + jnp.cross(dwp, rc)
             + jnp.cross(wp, jnp.cross(wp, rc)))
    return FrameKin(pos=pos, vel=vel, omega=wp, drift=drift,
                    R=_assemble13(R0, Rs),
                    p=_assemble13(base_pos, ps))


def foot_jacobians(model: JaxModel, base_pos, base_quat, qj, fk=None):
    """LOCAL_WORLD_ALIGNED linear foot Jacobians, (4, 3, 18).

    Columns 0:6 act on the local base twist [linear; angular]
    (Pinocchio convention, scripts/QP_WBC.py:96-101); columns 6:18 on joint
    rates. The (4, 3, 12) actuated sub-block has per-leg 3x3 diagonal
    structure (each foot depends only on its own leg's joints), which the
    IK exploits (src/InvKin.cpp:56).

    fk: optional (R (13,3,3), p (13,3)) body poses from a prior
    fk_world / frame_kinematics at the SAME configuration — shares the
    kinematic sweep with the caller (the WBC and the simulator both
    need kinematics and Jacobians at one configuration per tick).
    """
    model = _cast_model(model, qj.dtype)
    if fk is None:
        fk = fk_world(model, base_pos, base_quat, qj)
    R13, p13 = fk
    R0, p0 = R13[0], p13[0]
    R_legs = _legs_view(R13)                      # (4, 3, 3, 3)
    p_legs = _legs_view(p13)                      # (4, 3, 3)
    axes = _legs_view(model.joint_axis)

    # world joint axes: parent rotation per level (base, lvl0, lvl1)
    Rpar = jnp.concatenate(
        [jnp.broadcast_to(R0, (4, 1, 3, 3)), R_legs[:, :2]], axis=1)
    axes_w = jnp.einsum("flab,flb->fla", Rpar, axes)       # (4, 3, 3)

    pf = p_legs[:, 2] + jnp.einsum("fab,fb->fa", R_legs[:, 2],
                                   model.foot_pos)          # (4, 3)
    # joint columns: cross(axis_w, pf - p_joint), block-diagonal per leg
    cols = jnp.cross(axes_w, pf[:, None, :] - p_legs)       # (4, 3lvl, 3)
    eye4 = jnp.eye(4, dtype=qj.dtype)
    Jj = (eye4[:, None, :, None]
          * cols.transpose(0, 2, 1)[:, :, None, :]).reshape(4, 3, 12)
    Jb_lin = jnp.broadcast_to(R0, (4, 3, 3))
    Jb_ang = -jnp.einsum("fab,bc->fac", _skew_legs(pf - p0), R0)
    return jnp.concatenate([Jb_lin, Jb_ang, Jj], axis=2)


# ----------------------------------------------------------------------
# Featherstone spatial algebra (local coordinates, angular-first)
# ----------------------------------------------------------------------

def _xmot_legs(E, r, m):
    """Motion transform child<-parent, legs batched: E (4,3,3), r (4,3),
    m (4,6) with m = (omega, v)."""
    w, v = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.einsum("fab,fb->fa", E, w),
         jnp.einsum("fab,fb->fa", E, v - jnp.cross(r, w))], axis=-1)


def _xforce_legs(E, r, f):
    """Force transform child->parent, legs batched: f = (n, f_lin)."""
    n, fl = f[..., :3], f[..., 3:]
    fl_p = jnp.einsum("fba,fb->fa", E, fl)        # E.T @ fl
    n_p = jnp.einsum("fba,fb->fa", E, n) + jnp.cross(r, fl_p)
    return jnp.concatenate([n_p, fl_p], axis=-1)


def _cross_motion_legs(a, b):
    aw, av = a[..., :3], a[..., 3:]
    bw, bv = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bw), jnp.cross(aw, bv) + jnp.cross(av, bw)],
        axis=-1)


def _cross_force_legs(v, f):
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1)


def _apply_inertia_legs(mass, com, inertia_o, v6):
    """Spatial inertia applied to motion, legs batched: mass (4,),
    com (4,3), inertia_o (4,3,3), v6 (4,6) = (omega, v) -> (n, f)."""
    w, vl = v6[..., :3], v6[..., 3:]
    n = (jnp.einsum("fab,fb->fa", inertia_o, w)
         + mass[:, None] * jnp.cross(com, vl))
    f = mass[:, None] * vl - mass[:, None] * jnp.cross(com, w)
    return jnp.concatenate([n, f], axis=-1)


def _apply_inertia_base(model: JaxModel, v6):
    w, vl = v6[:3], v6[3:]
    m = model.mass[0]
    c = model.com[0]
    n = model.inertia_o[0] @ w + m * jnp.cross(c, vl)
    f = m * vl - m * jnp.cross(c, w)
    return jnp.concatenate([n, f])


def _cross_force(v, f):
    w, vl = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(vl, fl),
                            jnp.cross(w, fl)])


def _spatial_inertia_legs(mass, com, inertia_o, dtype):
    """6x6 spatial inertias (angular-first), legs batched -> (4, 6, 6)."""
    cx = _skew_legs(com)
    m = mass[:, None, None]
    top = jnp.concatenate([inertia_o, m * cx], axis=-1)
    bot = jnp.concatenate(
        [-m * cx, m * jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                       (4, 3, 3))], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _xmat_legs(E, r):
    """6x6 motion transforms child<-parent (angular-first) -> (4, 6, 6)."""
    z = jnp.zeros((4, 3, 3), dtype=E.dtype)
    top = jnp.concatenate([E, z], axis=-1)
    bot = jnp.concatenate([-jnp.einsum("fab,fbc->fac", E, _skew_legs(r)),
                           E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _reorder_in(v6):
    """[linear; angular] (pinocchio) -> (angular, linear) (featherstone)."""
    return jnp.concatenate([v6[3:6], v6[0:3]])


def _reorder_out(f6):
    """(n, f) featherstone force -> [force; torque] pinocchio."""
    return jnp.concatenate([f6[3:6], f6[0:3]])


def _joint_frames(model: JaxModel, qj):
    """Per-level joint transforms: Es[l] (4,3,3) child<-parent rotation,
    rs[l] (4,3) joint origins, S[l] (4,6) joint motion subspaces."""
    axes = _legs_view(model.joint_axis)
    jpos = _legs_view(model.joint_pos)
    q = qj.reshape(4, 3)
    z3 = jnp.zeros((4, 3), qj.dtype)
    Es = [_axis_rot_legs(axes[:, l], q[:, l]).swapaxes(-1, -2)
          for l in range(3)]
    rs = [jpos[:, l] for l in range(3)]
    Ss = [jnp.concatenate([axes[:, l], z3], axis=-1) for l in range(3)]
    return Es, rs, Ss


def rnea(model: JaxModel, base_quat, qj, v, a, gravity: float = 9.81):
    """Recursive Newton-Euler inverse dynamics.

    v, a: (18,) in Pinocchio free-flyer convention. Returns tau (18,):
    rows 0:6 base wrench [force; torque] in base frame, rows 6:18 joint
    torques — matching pin.rnea as used in scripts/QP_WBC.py:104,116.
    """
    model = _cast_model(model, v.dtype)
    dtype = v.dtype
    Es, rs, Ss = _joint_frames(model, qj)
    mass = _legs_view(model.mass)                 # (4, 3)
    com = _legs_view(model.com)                   # (4, 3, 3)
    Io = _legs_view(model.inertia_o)              # (4, 3, 3, 3)
    vj = v[6:].reshape(4, 3)
    aj = a[6:].reshape(4, 3)

    R0 = quat_to_rot(base_quat)
    v0 = _reorder_in(v[:6])
    a0 = _reorder_in(a[:6])
    # gravity pseudo-acceleration in base coordinates
    gvec = jnp.array([0.0, 0.0, gravity], dtype=dtype)
    a0 = a0 + jnp.concatenate([jnp.zeros(3, dtype=dtype), R0.T @ gvec])

    vp = jnp.broadcast_to(v0, (4, 6))
    ap = jnp.broadcast_to(a0, (4, 6))
    vs, fs = [], []
    for l in range(3):
        Sd = Ss[l] * vj[:, l][:, None]
        vi = _xmot_legs(Es[l], rs[l], vp) + Sd
        ai = (_xmot_legs(Es[l], rs[l], ap) + Ss[l] * aj[:, l][:, None]
              + _cross_motion_legs(vi, Sd))
        fi = (_apply_inertia_legs(mass[:, l], com[:, l], Io[:, l], ai)
              + _cross_force_legs(
                  vi, _apply_inertia_legs(mass[:, l], com[:, l],
                                          Io[:, l], vi)))
        vs.append(vi)
        fs.append(fi)
        vp, ap = vi, ai

    f0 = (_apply_inertia_base(model, a0)
          + _cross_force(v0, _apply_inertia_base(model, v0)))
    tau = [None] * 3
    f_acc = fs[2]
    for l in (2, 1, 0):
        tau[l] = jnp.sum(Ss[l] * f_acc, axis=-1)          # (4,)
        if l > 0:
            f_acc = fs[l - 1] + _xforce_legs(Es[l], rs[l], f_acc)
        else:
            f0 = f0 + jnp.sum(_xforce_legs(Es[0], rs[0], f_acc), axis=0)
    tau_j = jnp.stack(tau, axis=1).reshape(12)            # leg-major
    return jnp.concatenate([_reorder_out(f0), tau_j])


def crba(model: JaxModel, qj):
    """Composite-rigid-body joint-space inertia matrix M (18, 18) in
    Pinocchio free-flyer coordinates (scripts/QP_WBC.py:91). The base
    orientation does not affect M in local coordinates."""
    model = _cast_model(model, qj.dtype)
    dtype = qj.dtype
    Es, rs, Ss = _joint_frames(model, qj)
    mass = _legs_view(model.mass)
    com = _legs_view(model.com)
    Io = _legs_view(model.inertia_o)
    X = [_xmat_legs(Es[l], rs[l]) for l in range(3)]
    Ic = [_spatial_inertia_legs(mass[:, l], com[:, l], Io[:, l], dtype)
          for l in range(3)]
    # composite inertias up the chain (legs batched)
    for l in (2, 1):
        Ic[l - 1] = Ic[l - 1] + jnp.einsum(
            "fba,fbc,fcd->fad", X[l], Ic[l], X[l])
    from_base = jnp.einsum("fba,fbc,fcd->fad", X[0], Ic[0], X[0])
    Icb = _spatial_inertia_mat_base(model, dtype) + jnp.sum(from_base,
                                                            axis=0)

    # joint-joint block: per-leg 3x3, pairs (i, j<=i) via propagated F
    Hleg = jnp.zeros((4, 3, 3), dtype)
    cols_b = []                                   # base coupling per level
    for i in (2, 1, 0):
        F = jnp.einsum("fab,fb->fa", Ic[i], Ss[i])        # (4, 6)
        Hleg = Hleg.at[:, i, i].set(jnp.sum(Ss[i] * F, axis=-1))
        for j in range(i - 1, -1, -1):
            F = jnp.einsum("fba,fb->fa", X[j + 1], F)     # X' F
            val = jnp.sum(F * Ss[j], axis=-1)
            Hleg = Hleg.at[:, i, j].set(val)
            Hleg = Hleg.at[:, j, i].set(val)
        Fb = jnp.einsum("fba,fb->fa", X[0], F)            # into base
        cols_b.append(Fb)
    cols_b = jnp.stack([cols_b[2], cols_b[1], cols_b[0]], axis=1)
    # (4 legs, 3 lvls, 6): featherstone (n, f) -> pinocchio [force; torque]
    cols_b = jnp.concatenate([cols_b[..., 3:6], cols_b[..., 0:3]],
                             axis=-1)

    eye4 = jnp.eye(4, dtype=dtype)
    Hjj = (eye4[:, None, :, None] * Hleg[:, :, None, :]).reshape(12, 12)
    Hbj = cols_b.reshape(12, 6).T                          # (6, 12)
    P = jnp.zeros((6, 6), dtype=dtype)
    P = P.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype))
    P = P.at[3:6, 0:3].set(jnp.eye(3, dtype=dtype))
    Hbb = P @ Icb @ P.T
    top = jnp.concatenate([Hbb, Hbj], axis=1)
    bot = jnp.concatenate([Hbj.T, Hjj], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _spatial_inertia_mat_base(model: JaxModel, dtype):
    m = model.mass[0]
    cx = skew(model.com[0])
    top = jnp.concatenate([model.inertia_o[0], m * cx], axis=1)
    bot = jnp.concatenate([-m * cx, m * jnp.eye(3, dtype=dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def nonlinear_effects(model: JaxModel, base_quat, qj, v, gravity: float = 9.81):
    """Coriolis + centrifugal + gravity generalized forces (18,):
    rnea(q, v, 0)."""
    return rnea(model, base_quat, qj, v, jnp.zeros(18, dtype=v.dtype), gravity)
