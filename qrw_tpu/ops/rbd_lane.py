"""Lane-major (batch-on-lanes) Solo-12 rigid-body kernels.

The fleet's per-tick pipeline is dominated by per-robot spatial algebra:
batch-major (B, 3, 3) / (B, 18, 18) tensors put the TINY matrix dims on
the TPU lane axis (last-two-dims tiling), so every 3-wide contraction
runs at <10% lane utilization and lowers to slow tiny-dim convolution
fusions — measured ~16 us for a (1024, 4, 3, 3) x (1024, 4, 3) matvec
whose bandwidth cost is ~0.5 us. This module is the lane-major twin of
ops/rbd.py (the exact treatment that took the MPC solver from 10k to
197k solves/s, core/mpc_lane): every quantity keeps the BATCH on the
last axis and the small structural dims become python-level structure —
vectors are length-3 python lists of (..., B) arrays, matrices 3x3
nested lists — so the whole kernel is one fusable elementwise DAG over
full (B,)-wide lanes with zero layout ops and zero tiny-dim reductions.

Python-number entries (0.0 / 1.0 / model constants) participate
symbolically: `_mul`/`_add` fold them at trace time, so the fixed-base
call (identity base rotation) and every structurally-zero slot of the
Solo-12 tree (axis-aligned joint frames, x/y/y revolute axes —
models/solo12.py) costs nothing. The algorithms and conventions are
identical to ops/rbd.py (Pinocchio free-flyer semantics, replacing
pin.forwardKinematics / getFrameJacobian / crba / rnea as used by
scripts/solo12InvKin.py:47-59, scripts/QP_WBC.py:91-116); parity is
asserted against ops/rbd.py in tests/test_rbd_lane.py.

Leg chain specialization (models/solo12.py): levels rotate about
x (HAA), y (HFE), y (KFE) with no fixed frame rotations, so level
rotations compose in closed form and Ry(q2) Ry(q3) = Ry(q2 + q3).

Shapes: qj (4, 3, B) [leg, level, lane]; per-leg scalars (4, B);
outputs keep the same convention. Forward dynamics solves
M a = rhs through the block structure of the Solo-12 mass matrix
(joint-joint block is per-leg 3x3 block-diagonal): per-leg closed-form
3x3 inverses + a 6x6 Schur complement on the base — O(100) lane ops
instead of an 18x18 factorization.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from qrw_tpu.ops.rbd import JaxModel, _legs_view

# ----------------------------------------------------------------------
# Scalar micro-DSL: python numbers fold at trace time
# ----------------------------------------------------------------------


def _mul(a, b):
    if isinstance(a, (int, float)):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if isinstance(b, (int, float)):
            return a * b
    if isinstance(b, (int, float)):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def _add(*terms):
    out = 0.0
    for t in terms:
        if isinstance(t, (int, float)) and t == 0.0:
            continue
        out = t if (isinstance(out, float) and out == 0.0) else out + t
    return out


def _neg(a):
    if isinstance(a, (int, float)):
        return -a
    return -a


def vec(x, y, z):
    return [x, y, z]


def mat(rows):
    return [list(r) for r in rows]


EYE3 = mat([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
ZV3 = vec(0.0, 0.0, 0.0)


def mv(M, v):
    """M @ v."""
    return [_add(_mul(M[i][0], v[0]), _mul(M[i][1], v[1]),
                 _mul(M[i][2], v[2])) for i in range(3)]


def mtv(M, v):
    """M' @ v."""
    return [_add(_mul(M[0][i], v[0]), _mul(M[1][i], v[1]),
                 _mul(M[2][i], v[2])) for i in range(3)]


def mm(A, B):
    """A @ B."""
    return [[_add(_mul(A[i][0], B[0][j]), _mul(A[i][1], B[1][j]),
                  _mul(A[i][2], B[2][j])) for j in range(3)]
            for i in range(3)]


def mtm(A, B):
    """A' @ B."""
    return [[_add(_mul(A[0][i], B[0][j]), _mul(A[1][i], B[1][j]),
                  _mul(A[2][i], B[2][j])) for j in range(3)]
            for i in range(3)]


def vadd(*vs):
    return [_add(*[v[i] for v in vs]) for i in range(3)]


def vsub(a, b):
    return [_add(a[i], _neg(b[i])) for i in range(3)]


def vscale(s, v):
    return [_mul(s, v[i]) for i in range(3)]


def cross(a, b):
    return [_add(_mul(a[1], b[2]), _neg(_mul(a[2], b[1]))),
            _add(_mul(a[2], b[0]), _neg(_mul(a[0], b[2]))),
            _add(_mul(a[0], b[1]), _neg(_mul(a[1], b[0])))]


def dot(a, b):
    return _add(_mul(a[0], b[0]), _mul(a[1], b[1]), _mul(a[2], b[2]))


def rot_x(c, s):
    """Rotation about x by angle with cos c, sin s."""
    return mat([[1.0, 0.0, 0.0], [0.0, c, _neg(s)], [0.0, s, c]])


def rot_y(c, s):
    return mat([[c, 0.0, s], [0.0, 1.0, 0.0], [_neg(s), 0.0, c]])


def quat_to_mat(q):
    """Quaternion [x, y, z, w] (each (..., B)) -> Mat (same as
    ops/rotations.quat_to_rot, normalized)."""
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return mat([[1.0 - (yy + zz), xy - wz, xz + wy],
                [xy + wz, 1.0 - (xx + zz), yz - wx],
                [xz - wy, yz + wx, 1.0 - (xx + yy)]])


def stack_vec(v):
    """Vec of (..., B) -> (..., 3, B) array (broadcasting numbers)."""
    arrs = [a for a in v if not isinstance(a, (int, float))]
    ref = arrs[0]
    v = [jnp.broadcast_to(jnp.asarray(a, ref.dtype), ref.shape)
         if isinstance(a, (int, float)) else a for a in v]
    return jnp.stack(v, axis=-2)


def unstack_vec(a):
    """(..., 3, B) -> Vec."""
    return [a[..., i, :] for i in range(3)]


def unstack_mat(a):
    """(..., 3, 3, B) -> Mat."""
    return [[a[..., i, j, :] for j in range(3)] for i in range(3)]


def stack_mat(M, dtype, shape):
    """Mat -> (..., 3, 3, B); numbers broadcast to `shape`."""
    rows = []
    for i in range(3):
        row = [jnp.broadcast_to(jnp.asarray(e, dtype), shape)
               if isinstance(e, (int, float)) else e for e in M[i]]
        rows.append(jnp.stack(row, axis=-2))
    return jnp.stack(rows, axis=-3)


# ----------------------------------------------------------------------
# Model constants, leg-major numpy (fold into the graph as literals)
# ----------------------------------------------------------------------

class LaneModel(NamedTuple):
    """Static per-leg constants extracted from JaxModel (numpy floats →
    trace-time literals). Legs indexed FL, FR, HL, HR; levels 0..2."""
    jpos: tuple          # jpos[level] = Vec of (4,) numpy arrays
    axis_kind: tuple     # ('x', 'y', 'y') — asserted from the model
    mass: np.ndarray     # (4, 3) link masses
    com: tuple           # com[level] = Vec of (4,)
    inertia_o: tuple     # inertia_o[level] = Mat of (4,)
    foot_pos: tuple      # Vec of (4,)
    base_mass: float
    base_com: tuple      # Vec of floats
    base_inertia_o: tuple  # Mat of floats


def to_lane(model: JaxModel) -> LaneModel:
    ja = np.asarray(model.joint_axis)
    legs_axis = _legs_view(ja)               # (4, 3, 3)
    kinds = []
    for l in range(3):
        ax = legs_axis[:, l]
        if np.allclose(np.abs(ax), [1.0, 0.0, 0.0]):
            kinds.append("x")
        elif np.allclose(np.abs(ax), [0.0, 1.0, 0.0]):
            kinds.append("y")
        else:  # pragma: no cover - solo12 is x/y/y
            raise ValueError(f"unsupported joint axis {ax}")
        assert np.allclose(ax, ax[0]), "legs share joint axes"
        assert np.allclose(ax[0].sum(), 1.0), "axes are +x / +y"
    jp = np.asarray(model.joint_pos)
    legs_jp = _legs_view(jp)                 # (4, 3, 3)
    com = np.asarray(model.com)
    legs_com = _legs_view(com)
    io = np.asarray(model.inertia_o)
    legs_io = _legs_view(io)
    mass = _legs_view(np.asarray(model.mass))
    fp = np.asarray(model.foot_pos)          # (4, 3)

    def vec_np(a):                           # (4, 3) -> Vec of (4,)
        return [a[:, i].copy() for i in range(3)]

    def mat_np(a):                           # (4, 3, 3) -> Mat of (4,)
        return [[a[:, i, j].copy() for j in range(3)] for i in range(3)]

    return LaneModel(
        jpos=tuple(vec_np(legs_jp[:, l]) for l in range(3)),
        axis_kind=tuple(kinds),
        mass=mass.copy(),
        com=tuple(vec_np(legs_com[:, l]) for l in range(3)),
        inertia_o=tuple(mat_np(legs_io[:, l]) for l in range(3)),
        foot_pos=vec_np(fp),
        base_mass=float(model.mass[0]),
        base_com=[float(c) for c in np.asarray(model.com)[0]],
        base_inertia_o=[[float(io[0, i, j]) for j in range(3)]
                        for i in range(3)],
    )


def solo12_lane() -> LaneModel:
    """The Solo-12 LaneModel (cached). Safe to call inside a jit trace:
    built from pure numpy (jnp arrays created mid-trace become tracers
    and cannot fold into LaneModel constants)."""
    global _SOLO12_LANE
    if _SOLO12_LANE is None:
        from qrw_tpu.models.solo12 import make_solo12
        from qrw_tpu.ops.rbd import _np_skew
        m = make_solo12()
        cx = np.stack([_np_skew(c) for c in m.com])
        inertia_o = m.inertia - m.mass[:, None, None] * (cx @ cx)
        np_model = JaxModel(
            parent=tuple(int(p) for p in m.parent),
            joint_axis=m.joint_axis, joint_pos=m.joint_pos,
            mass=m.mass, com=m.com, inertia_o=inertia_o,
            foot_body=tuple(int(b) for b in m.foot_body),
            foot_pos=m.foot_pos, shoulders=m.shoulders,
            imu_offset=m.imu_offset)
        _SOLO12_LANE = to_lane(np_model)
    return _SOLO12_LANE


_SOLO12_LANE: Optional[LaneModel] = None


def _np_col(a):
    """(4,) numpy constant -> broadcastable against (4, B) lanes."""
    return a[:, None]


def _cast_lane(model: LaneModel, dtype) -> LaneModel:
    """Cast the numpy constants to the lane dtype — under x64 the stored
    f64 arrays would silently promote f32 lane arrays (ops/rbd has the
    same guard)."""
    np_dtype = np.dtype(dtype)

    def cv(v):
        return [e.astype(np_dtype) for e in v]

    def cmt(M):
        return [[e.astype(np_dtype) for e in row] for row in M]

    return model._replace(
        jpos=tuple(cv(v) for v in model.jpos),
        mass=model.mass.astype(np_dtype),
        com=tuple(cv(v) for v in model.com),
        inertia_o=tuple(cmt(m) for m in model.inertia_o),
        foot_pos=cv(model.foot_pos),
    )


def _level_rot(kind: str, c, s):
    return rot_x(c, s) if kind == "x" else rot_y(c, s)


def _leg_const(v):
    """LaneModel Vec/Mat of (4,) numpy -> entries shaped (4, 1)."""
    if isinstance(v[0], list):
        return [[_np_col(e) for e in row] for row in v]
    return [_np_col(e) for e in v]


# ----------------------------------------------------------------------
# Forward kinematics (world frame) + foot frame kinematics
# ----------------------------------------------------------------------

class LaneFrameKin(NamedTuple):
    pos: list     # Vec of (4, B) — world foot positions
    vel: list     # Vec of (4, B) — world foot point velocities
    drift: list   # Vec of (4, B) — classical acceleration with qdd = 0
    R: list       # [R0 Mat (B,), R1..R3 Mat (4, B)] body rotations
    p: list       # [p0 Vec (B,), p1..p3 Vec (4, B)] body origins
    omega: list   # Vec of (4, B) — foot body angular velocity (world)


def _broadcast_leg(v):
    """Vec of (B,) -> Vec of (4, B) via leading-axis broadcast (numbers
    pass through)."""
    return [e if isinstance(e, (int, float)) else e[None, :] for e in v]


def _broadcast_leg_mat(M):
    return [[e if isinstance(e, (int, float)) else e[None, :]
             for e in row] for row in M]


def frame_kinematics(model: LaneModel, base_pos, R0, qj, base_vel, vj):
    """Foot positions / velocities / drift, lane-major.

    base_pos: Vec of (B,) (or numbers, e.g. fixed base); R0: Mat of (B,)
    (or EYE3); qj, vj: (4, 3, B); base_vel: Vec pair
    (v_lin Vec, omega Vec) in the BASE frame (Pinocchio free-flyer) or
    None for a fixed base. Mirrors ops/rbd.frame_kinematics.
    """
    model = _cast_lane(model, qj.dtype)
    c = jnp.cos(qj)
    s = jnp.sin(qj)
    cl = [c[:, l] for l in range(3)]
    sl = [s[:, l] for l in range(3)]

    Rp = _broadcast_leg_mat(R0)
    pp = _broadcast_leg(base_pos)
    if base_vel is None:
        w0 = v0 = ZV3
        wp, vp = ZV3, ZV3
        ap = ZV3
    else:
        vb, wb = base_vel
        w0 = mv(R0, wb)
        v0 = mv(R0, vb)
        wp = _broadcast_leg(w0)
        vp = _broadcast_leg(v0)
        ap = _broadcast_leg(cross(w0, v0))
    dwp = ZV3

    Rs, ps = [], []
    for l in range(3):
        Rj = _level_rot(model.axis_kind[l], cl[l], sl[l])
        jpos = _leg_const(model.jpos[l])
        axis = vec(1.0, 0.0, 0.0) if model.axis_kind[l] == "x" \
            else vec(0.0, 1.0, 0.0)
        r_w = mv(Rp, jpos)
        a_w = mv(Rp, axis)
        qdl = vj[:, l]
        Ri = mm(Rp, Rj)
        pi = vadd(pp, r_w)
        wi = vadd(wp, vscale(qdl, a_w))
        vi = vadd(vp, cross(wp, r_w))
        dwi = vadd(dwp, vscale(qdl, cross(wp, a_w)))
        ai = vadd(ap, cross(dwp, r_w), cross(wp, cross(wp, r_w)))
        Rs.append(Ri)
        ps.append(pi)
        Rp, pp, wp, vp, dwp, ap = Ri, pi, wi, vi, dwi, ai

    rc = mv(Rp, _leg_const(model.foot_pos))
    pos = vadd(pp, rc)
    vel = vadd(vp, cross(wp, rc))
    drift = vadd(ap, cross(dwp, rc), cross(wp, cross(wp, rc)))
    return LaneFrameKin(pos=pos, vel=vel, drift=drift,
                        R=[R0] + Rs, p=[base_pos] + ps, omega=wp)


class LaneJacobians(NamedTuple):
    """LOCAL_WORLD_ALIGNED linear foot Jacobians in block form
    (ops/rbd.foot_jacobians): the (3, 18) row block per foot is
    [R0 | -skew(pf - p0) R0 | per-leg 3x3], exploiting that foot f
    depends only on leg f's joints (src/InvKin.cpp:56)."""
    Jb_lin: list   # Mat of (B,) — R0 (shared by all feet)
    Jb_ang: list   # Mat of (4, B) — -skew(pf - p0) @ R0 per foot
    Jleg: list     # Mat of (4, B) — actuated 3x3 block per foot


def foot_jacobians(model: LaneModel, kin: LaneFrameKin, R0, base_pos
                   ) -> LaneJacobians:
    pf = kin.pos                                    # Vec (4, B)
    p_legs = kin.p[1:]                              # level origins
    R_legs = kin.R[1:]
    # world joint axes: parent rotation per level (base, lvl0, lvl1)
    Rpars = [_broadcast_leg_mat(R0), R_legs[0], R_legs[1]]
    cols = []
    for l in range(3):
        axis = vec(1.0, 0.0, 0.0) if model.axis_kind[l] == "x" \
            else vec(0.0, 1.0, 0.0)
        a_w = mv(Rpars[l], axis)
        cols.append(cross(a_w, vsub(pf, p_legs[l])))
    # Jleg[i][l] = cols[l][i]
    Jleg = [[cols[l][i] for l in range(3)] for i in range(3)]
    rel = vsub(pf, _broadcast_leg(base_pos))
    # -skew(rel) @ R0
    sk = mat([[0.0, rel[2], _neg(rel[1])],
              [_neg(rel[2]), 0.0, rel[0]],
              [rel[1], _neg(rel[0]), 0.0]])
    Jb_ang = mm(sk, _broadcast_leg_mat(R0))
    return LaneJacobians(Jb_lin=R0, Jb_ang=Jb_ang, Jleg=Jleg)


# ----------------------------------------------------------------------
# RNEA (inverse dynamics) — Featherstone in local coords, lane-major
# ----------------------------------------------------------------------

def _joint_rot_T(model: LaneModel, cl, sl, l):
    """E = R_joint' (child <- parent rotation)."""
    Rj = _level_rot(model.axis_kind[l], cl, sl)
    return [[Rj[j][i] for j in range(3)] for i in range(3)]  # transpose


def _sp_apply_inertia(mass, com, Io, w, v):
    """Spatial inertia applied to a motion (w, v) -> (n, f):
    n = Io w + m c x v ; f = m v - m c x w."""
    n = vadd(mv(Io, w), vscale(mass, cross(com, v)))
    f = vsub(vscale(mass, v), vscale(mass, cross(com, w)))
    return n, f


def rnea(model: LaneModel, R0, qj, v, a, gravity: float = 9.81,
         base_vel_zero: bool = False):
    """Inverse dynamics, lane-major twin of ops/rbd.rnea.

    R0: base rotation Mat (world <- base); qj (4, 3, B);
    v = (v_lin Vec, w Vec, vj (4, 3, B)) in Pinocchio convention;
    a likewise. Returns (f_base Vec, n_base Vec, tau (4, 3, B)) with the
    base wrench [force; torque] in base frame (scripts/QP_WBC.py:104).
    base_vel_zero marks v's base rows as structurally zero."""
    model = _cast_lane(model, qj.dtype)
    v_lin, w_b, vj = v
    a_lin, dw_b, aj = a

    c = jnp.cos(qj)
    s = jnp.sin(qj)

    # gravity pseudo-acceleration in base coords: a0 += R0' g z
    gz = vec(0.0, 0.0, gravity)
    g_b = mtv(R0, gz)
    a0_w = dw_b
    a0_v = vadd(a_lin, g_b)
    v0_w = ZV3 if base_vel_zero else w_b
    v0_v = ZV3 if base_vel_zero else v_lin

    wp = _broadcast_leg(v0_w)
    vp = _broadcast_leg(v0_v)
    awp = _broadcast_leg(a0_w)
    avp = _broadcast_leg(a0_v)

    vs, fs = [], []
    for l in range(3):
        cl, sl = c[:, l], s[:, l]
        E = _joint_rot_T(model, cl, sl, l)
        r = _leg_const(model.jpos[l])
        axis = vec(1.0, 0.0, 0.0) if model.axis_kind[l] == "x" \
            else vec(0.0, 1.0, 0.0)
        qd = vj[:, l]
        qdd = aj[:, l]
        # Xmot: w' = E w ; v' = E (v - r x w)
        wi_ = mv(E, wp)
        vi_ = mv(E, vsub(vp, cross(r, wp)))
        Sd = vscale(qd, axis)
        wi = vadd(wi_, Sd)
        vi = vi_
        # a: transform + S qdd + v x (S qd)  (motion cross)
        awi_ = mv(E, awp)
        avi_ = mv(E, vsub(avp, cross(r, awp)))
        awi = vadd(awi_, vscale(qdd, axis), cross(wi, Sd))
        avi = vadd(avi_, cross(vi, Sd))
        # f = I a + v x* (I v)
        mass = _np_col(model.mass[:, l])
        com = _leg_const(model.com[l])
        Io = _leg_const(model.inertia_o[l])
        n_a, f_a = _sp_apply_inertia(mass, com, Io, awi, avi)
        n_v, f_v = _sp_apply_inertia(mass, com, Io, wi, vi)
        # force cross: n += w x n_v + v x f_v ; f += w x f_v
        ni = vadd(n_a, cross(wi, n_v), cross(vi, f_v))
        fi = vadd(f_a, cross(wi, f_v))
        vs.append((wi, vi))
        fs.append((ni, fi))
        wp, vp, awp, avp = wi, vi, awi, avi

    # base bias force
    bc = model.base_com
    bIo = model.base_inertia_o
    bm = model.base_mass
    n0a = vadd(mv(bIo, a0_w), vscale(bm, cross(bc, a0_v)))
    f0a = vsub(vscale(bm, a0_v), vscale(bm, cross(bc, a0_w)))
    n0v = vadd(mv(bIo, v0_w), vscale(bm, cross(bc, v0_v)))
    f0v = vsub(vscale(bm, v0_v), vscale(bm, cross(bc, v0_w)))
    n0 = vadd(n0a, cross(v0_w, n0v), cross(v0_v, f0v))
    f0 = vadd(f0a, cross(v0_w, f0v))

    taus = [None] * 3
    n_legs = f_legs = None                 # per-leg forces into the base
    n_acc, f_acc = fs[2]
    for l in (2, 1, 0):
        axis_idx = 0 if model.axis_kind[l] == "x" else 1
        taus[l] = n_acc[axis_idx]                      # S . f
        cl, sl = c[:, l], s[:, l]
        E = _joint_rot_T(model, cl, sl, l)
        r = _leg_const(model.jpos[l])
        # Xforce child->parent: f_p = E' f ; n_p = E' n + r x f_p
        f_p = mtv(E, f_acc)
        n_p = vadd(mtv(E, n_acc), cross(r, f_p))
        if l > 0:
            n_acc = vadd(fs[l - 1][0], n_p)
            f_acc = vadd(fs[l - 1][1], f_p)
        else:
            n_legs, f_legs = n_p, f_p                  # (4, B) entries

    # base wrench: base bias (once) + the four legs' transmitted forces
    n_base = vadd(n0, [jnp.sum(e, axis=0) for e in n_legs])
    f_base = vadd(f0, [jnp.sum(e, axis=0) for e in f_legs])
    tau = jnp.stack(taus, axis=1)                  # (4, 3, B)
    return f_base, n_base, tau


def nonlinear_effects(model: LaneModel, R0, qj, v, gravity: float = 9.81):
    """h(q, v) = rnea(q, v, 0) (Coriolis+centrifugal+gravity)."""
    zero_a = (ZV3, ZV3, jnp.zeros_like(qj))
    return rnea(model, R0, qj, v, zero_a, gravity)


# ----------------------------------------------------------------------
# CRBA blocks + block forward dynamics (Schur complement on the base)
# ----------------------------------------------------------------------

class LaneMassBlocks(NamedTuple):
    """Blocks of the free-flyer mass matrix in Pinocchio row order
    [linear; angular; joints] (ops/rbd.crba):
    Mbb (6x6 nested list of (B,)), Mbj[leg-level structure]: list over
    levels of Vec-pairs, Mleg 3x3 nested of (4, B)."""
    Mbb: list     # 6x6 nested list of (B,) arrays/numbers
    Mbj: list     # Mbj[l] = (top Vec (4,B), bot Vec (4,B)) columns:
                  # base [force; torque] coupling of joint level l
    Mleg: list    # 3x3 nested list of (4, B) — per-leg joint block


def crba(model: LaneModel, qj) -> LaneMassBlocks:
    """Composite-rigid-body mass matrix blocks, lane-major twin of
    ops/rbd.crba (scripts/QP_WBC.py:91)."""
    model = _cast_lane(model, qj.dtype)
    c = jnp.cos(qj)
    s = jnp.sin(qj)

    Es, rs, axes = [], [], []
    for l in range(3):
        Es.append(_joint_rot_T(model, c[:, l], s[:, l], l))
        rs.append(_leg_const(model.jpos[l]))
        axes.append(0 if model.axis_kind[l] == "x" else 1)

    # composite spatial inertias up the chain, as (mass, h=m*com, Io)
    # with the parallel-axis transform applied explicitly:
    #   parent += X' I_child X  for motion transform X = (E, r)
    def transform_inertia(E, r, m, h, Io):
        """I' = X^* I X for child->parent: rotate by E', shift by r.
        Using the (m, h, I) parameterization of spatial inertia:
          m' = m ; h' = E' h + m r ;
          I' = E' Io E + r x (E' h)x' + (E' h + m r) x r x' ...
        Derived from I_o' = R I_o R' - m [c']x [c']x + ... ; simpler to
        use the standard formulas on (m, c, I_o):
        c' = E' c + r ; I_o' = E' I_o E - m ([c']x [c']x - [E'c+r]x...)
        We keep I about the BODY ORIGIN (I_o), for which the transform
        is: I_o' = E' I_o E + m ( r x (E'c)' cross-terms ).
        Implemented via the two-step: shift I_o (about child origin) is
        already about child origin; rotating to parent axes: R = E',
        I_r = R I_o R'; origin shift by r with CoM at c_r = R c:
        I_o'(parent origin) = I_r + m [r]x [r]x' ... use:
        I_about_new = I_about_old_origin_rotated
                      + m ( (r . (r + 2 c_r)) eye  - outer(r, r + c_r)
                            - outer(c_r, r) )  [standard parallel axis
        between origins with CoM offset]."""
        Rt = [[E[j][i] for j in range(3)] for i in range(3)]  # E'
        c_r = mv(Rt, h)          # E' (m c) = m * rotated com
        I_r = mm(Rt, mm(Io, E))  # E' Io E
        # parallel-axis between origins: with CoM h_r (mass-scaled),
        # I_new = I_r + m [r]x[r]x - ( [r]x[h_r]x + [h_r]x[r]x ) ...
        # Using the identity for inertia about origin:
        #   I_o = I_c - m [c]x[c]x  (ops/rbd.to_jax)
        # => I_new = I_r - [r]x[c_r]x - [c_r]x[r]x - m [r]x[r]x
        # with [a]x[b]x = outer(b, a) - (a.b) eye
        def skew_prod(a, b):
            """[a]x [b]x = b a' - (a.b) I."""
            d = dot(a, b)
            return [[_add(_mul(b[i], a[j]),
                          _neg(d) if i == j else 0.0)
                     for j in range(3)] for i in range(3)]

        mr = vscale(m, r)
        t1 = skew_prod(r, c_r)
        t2 = skew_prod(c_r, r)
        t3 = skew_prod(r, mr)
        I_new = [[_add(I_r[i][j], _neg(t1[i][j]), _neg(t2[i][j]),
                       _neg(t3[i][j])) for j in range(3)]
                 for i in range(3)]
        h_new = vadd(c_r, mr)
        return m, h_new, I_new

    # leaf level inertias (m, h=m*com, Io) per level
    level_inertia = []
    for l in range(3):
        m = _np_col(model.mass[:, l])
        com = _leg_const(model.com[l])
        h = vscale(m, com)
        Io = _leg_const(model.inertia_o[l])
        level_inertia.append((m, h, Io))

    Ic = [None] * 3
    Ic[2] = level_inertia[2]
    for l in (2, 1):
        m, h, Io = transform_inertia(Es[l], rs[l], *Ic[l])
        mp, hp, Iop = level_inertia[l - 1]
        Ic[l - 1] = (_add(m, mp), vadd(h, hp),
                     [[_add(Io[i][j], Iop[i][j]) for j in range(3)]
                      for i in range(3)])

    # base composite: base link + transformed leg composites
    m0, h0, Io0 = transform_inertia(Es[0], rs[0], *Ic[0])
    bm = model.base_mass
    bh = vscale(bm, model.base_com)
    bIo = model.base_inertia_o
    m_tot = _add(bm, jnp.sum(m0, axis=0))
    h_tot = [_add(bh[i], jnp.sum(h0[i], axis=0)) for i in range(3)]
    I_tot = [[_add(bIo[i][j], jnp.sum(Io0[i][j], axis=0))
              for j in range(3)] for i in range(3)]

    # Mbb in Pinocchio order [linear; angular]:
    #   [[m I, -[h]x ], [[h]x, I_o]]  (force rows: f = m a - h x dw ...)
    hx = mat([[0.0, _neg(h_tot[2]), h_tot[1]],
              [h_tot[2], 0.0, _neg(h_tot[0])],
              [_neg(h_tot[1]), h_tot[0], 0.0]])
    Mbb = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            Mbb[i][j] = m_tot if i == j else 0.0
            Mbb[i][3 + j] = _neg(hx[i][j])
            Mbb[3 + i][j] = hx[i][j]
            Mbb[3 + i][3 + j] = I_tot[i][j]

    # joint-space blocks: F = Ic S propagated down; S = e_axis (angular)
    Mleg = [[0.0] * 3 for _ in range(3)]
    Mbj = [None] * 3
    for i in (2, 1, 0):
        m, h, Io = Ic[i]
        ax = axes[i]
        e = [1.0 if k == ax else 0.0 for k in range(3)]
        # F = I S for pure angular S: n = Io e ; f = -h x e = e x h
        Fn = [Io[k][ax] for k in range(3)]
        Ff = cross(e, h)
        Mleg[i][i] = Fn[ax]
        for j in range(i - 1, -1, -1):
            # X' F (child->parent force transform): f_p = E' f,
            # n_p = E' n + r x f_p
            E, r = Es[j + 1], rs[j + 1]
            Ff_p = mtv(E, Ff)
            Fn_p = vadd(mtv(E, Fn), cross(r, Ff_p))
            Fn, Ff = Fn_p, Ff_p
            val = Fn[axes[j]]
            Mleg[i][j] = val
            Mleg[j][i] = val
        E, r = Es[0], rs[0]
        Ff_b = mtv(E, Ff)
        Fn_b = vadd(mtv(E, Fn), cross(r, Ff_b))
        # pinocchio row order: [force; torque]
        Mbj[i] = (Ff_b, Fn_b)
    return LaneMassBlocks(Mbb=Mbb, Mbj=Mbj, Mleg=Mleg)


def _inv3_sym(M):
    """Closed-form inverse of symmetric 3x3 Mat (entries (..., B))."""
    a, b, c = M[0][0], M[0][1], M[0][2]
    e, f = M[1][1], M[1][2]
    i = M[2][2]
    A = _add(_mul(e, i), _neg(_mul(f, f)))
    B_ = _add(_mul(c, f), _neg(_mul(b, i)))
    C = _add(_mul(b, f), _neg(_mul(c, e)))
    det = _add(_mul(a, A), _mul(b, B_), _mul(c, C))
    inv_det = 1.0 / det
    E = _add(_mul(a, i), _neg(_mul(c, c)))
    F = _add(_mul(b, c), _neg(_mul(a, f)))
    I_ = _add(_mul(a, e), _neg(_mul(b, b)))
    return [[_mul(inv_det, A), _mul(inv_det, B_), _mul(inv_det, C)],
            [_mul(inv_det, B_), _mul(inv_det, E), _mul(inv_det, F)],
            [_mul(inv_det, C), _mul(inv_det, F), _mul(inv_det, I_)]]


def chol6(M):
    """Unrolled Cholesky of a 6x6 nested-list SPD matrix (entries
    (..., B)) -> lower-triangular nested list."""
    n = 6
    A = [[M[i][j] for j in range(n)] for i in range(n)]
    L = [[0.0] * n for _ in range(n)]
    for j in range(n):
        d = jnp.sqrt(A[j][j])
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            L[i][j] = _mul(A[i][j], inv_d)
        for i in range(j + 1, n):
            for k in range(j + 1, i + 1):
                A[i][k] = _add(A[i][k], _neg(_mul(L[i][j], L[k][j])))
    return L


def chol6_solve(L, b):
    """Solve L L' x = b for 6-vectors (python lists of (..., B))."""
    n = 6
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = _add(acc, _neg(_mul(L[i][j], y[j])))
        y[i] = _mul(acc, 1.0 / L[i][i])
    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = y[i]
        for j in range(i + 1, n):
            acc = _add(acc, _neg(_mul(L[j][i], x[j])))
        x[i] = _mul(acc, 1.0 / L[i][i])
    return x


def forward_dynamics(blocks: LaneMassBlocks, rhs_base, rhs_j):
    """Solve M a = rhs through the Solo-12 block structure.

    rhs_base: list of 6 (B,) arrays [force; torque] rows;
    rhs_j: (4, 3, B). Returns (a_base list of 6, a_j (4, 3, B)).

    M = [[Mbb, Mbj], [Mbj', diag(Mleg)]] with Mleg per-leg 3x3: solve
    the per-leg blocks in closed form, form the 6x6 Schur complement
    S = Mbb - sum_legs Mbj Mleg^-1 Mbj', factor it with an unrolled
    Cholesky, back-substitute. All lane-elementwise; no 18x18 factor."""
    Minv = _inv3_sym(blocks.Mleg)                    # entries (4, B)
    # columns of Mbj as 6-vectors: col l = [Ff_l; Fn_l]
    cols = [blocks.Mbj[l][0] + blocks.Mbj[l][1] for l in range(3)]
    # (each `+` concatenates the two Vec lists -> list of 6 entries)

    rj = [rhs_j[:, l] for l in range(3)]             # (4, B) each

    # u = Mleg^-1 rhs_j ; w = Mleg^-1 Mbj' (6 columns per leg-level)
    def leg_solve(vecs):
        """apply Minv to a 3-list of (4, B)."""
        return [
            _add(_mul(Minv[i][0], vecs[0]), _mul(Minv[i][1], vecs[1]),
                 _mul(Minv[i][2], vecs[2])) for i in range(3)]

    u = leg_solve(rj)                                # (3 levels)(4, B)

    # Schur rhs: rhs_base - sum_legs Mbj u
    srhs = []
    for r in range(6):
        acc = 0.0
        for l in range(3):
            acc = _add(acc, _mul(cols[l][r], u[l]))
        srhs.append(_add(rhs_base[r], _neg(jnp.sum(acc, axis=0))))

    # Schur matrix: Mbb - sum_legs (Mbj Minv Mbj')
    # t[l][r] = column r of Minv Mbj' = Minv applied to row vec
    MinvB = [leg_solve([cols[0][r], cols[1][r], cols[2][r]])
             for r in range(6)]                      # [r][l] (4, B)
    S = [[None] * 6 for _ in range(6)]
    for r in range(6):
        for q in range(r, 6):
            acc = 0.0
            for l in range(3):
                acc = _add(acc, _mul(cols[l][r], MinvB[q][l]))
            val = _add(blocks.Mbb[r][q], _neg(jnp.sum(acc, axis=0)))
            S[r][q] = val
            S[q][r] = val

    L = chol6(S)
    a_base = chol6_solve(L, srhs)

    # back-substitute: a_j = Minv (rhs_j - Mbj' a_base)
    bj = []
    for l in range(3):
        acc = 0.0
        for r in range(6):
            acc = _add(acc, _mul(cols[l][r], a_base[r]))
        bj.append(_add(rj[l], _neg(acc)))
    aj = leg_solve(bj)
    a_j = jnp.stack(aj, axis=1)                      # (4, 3, B)
    return a_base, a_j
