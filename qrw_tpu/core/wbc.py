"""Whole-body controller: leg inverse kinematics + 12-var contact-force QP.

Pure-function re-design of the reference WBC stack (scripts/QP_WBC.py,
src/QPWBC.cpp, src/InvKin.cpp, scripts/solo12InvKin.py) on the qrw_tpu
rigid-body kernels instead of Pinocchio:

  * InvKin (src/InvKin.cpp:23-62): task-space PD on the feet of the
    FIXED-BASE model (scripts/solo12InvKin.py:11-12), per-leg 3x3 Jacobian
    block inverses mapping acceleration / velocity / position error to
    joint space.
  * Box QP (src/QPWBC.cpp:481-518): min over contact-force deltas
    1/2 df' H df + df' g with H = A' Q1 A + Q2, A = Y^-1 X, X = Jc[:, :6]',
    gamma = Y^-1 (X f_cmd - rnea6); friction-cone rows G(f_cmd + df) in
    [0, 25]. Y is the *diagonal* of the base block of the CRBA mass matrix
    evaluated at the zero joint configuration — the reference computes M at
    q = 0, not at the current q (scripts/QP_WBC.py:89-93), making Y a
    precomputable constant.
  * Torques (scripts/QP_WBC.py:110-117):
    tau_ff = rnea(q, dq, ddq + ddq_delta)[6:] - Jc[:, 6:]' f_with_delta.

The QP reuses the generic batched ADMM kernel (ops/qp.py) with the
reference's OSQP settings (eps 1e-5, src/QPWBC.cpp:239-240).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.models.solo12 import make_solo12
from qrw_tpu.ops import lin, qp, rbd


# ----------------------------------------------------------------------
# Constant problem data
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def friction_generators(mu: float) -> np.ndarray:
    """(20, 12) block-diagonal G: per foot rows
    [mu fz - fx; mu fz + fx; mu fz - fy; mu fz + fy; fz]
    (the negated C pattern of src/QPWBC.cpp:10-21)."""
    SC = np.array([
        [-1.0, 0.0, mu],
        [1.0, 0.0, mu],
        [0.0, -1.0, mu],
        [0.0, 1.0, mu],
        [0.0, 0.0, 1.0],
    ])
    G = np.zeros((20, 12))
    for i in range(4):
        G[5 * i:5 * i + 5, 3 * i:3 * i + 3] = SC
    return G


@functools.lru_cache(maxsize=1)
def base_inertia_diag() -> np.ndarray:
    """diag(Y): base 6x6 block of the CRBA mass matrix at zero joint
    configuration, diagonalized (scripts/QP_WBC.py:89-93). Evaluated once
    eagerly at import (see module bottom) — computing it lazily inside a
    jit/scan trace would stage it as traced ops instead of a constant."""
    model = rbd.to_jax(make_solo12())
    M = np.asarray(rbd.crba(model, jnp.zeros(12)))
    return np.diag(M[:6, :6]).copy()


class WBCState(NamedTuple):
    k_since_contact: jnp.ndarray   # (4,) ticks since each contact began
    qp_x: jnp.ndarray              # (12,) QP warm start (previous delta-f)
    qp_y: jnp.ndarray              # (20,) QP dual warm start


def init_wbc_state(dtype=jnp.float32) -> WBCState:
    return WBCState(k_since_contact=jnp.zeros(4, dtype),
                    qp_x=jnp.zeros(12, dtype),
                    qp_y=jnp.zeros(20, dtype))


class WBCResult(NamedTuple):
    qdes: jnp.ndarray      # (12,) joint position targets
    vdes: jnp.ndarray      # (12,) joint velocity targets
    tau_ff: jnp.ndarray    # (12,) feedforward torques
    f_with_delta: jnp.ndarray  # (12,) corrected contact forces
    ddq_cmd: jnp.ndarray   # (18,) commanded accelerations (base rows = QP)
    feet_pos: jnp.ndarray  # (4, 3) foot positions at the IK joint config
    feet_vel: jnp.ndarray  # (4, 3) foot velocities (base frame)
    state: WBCState
    qp_iters: jnp.ndarray  # () ADMM iterations of the box QP


def compute_wbc(cfg: Config, model: rbd.JaxModel, state: WBCState,
                qj, b_v18, f_cmd, contacts, pgoals, vgoals, agoals,
                settings: Optional[qp.QPSettings] = None) -> WBCResult:
    """One 500 Hz whole-body step (wbc_controller.compute,
    scripts/QP_WBC.py:52-131).

    qj: (12,) reference joint positions; b_v18: (18,) generalized velocity
    whose base rows are the reference base twist (scripts/Controller.py:
    282-287) and joint rows the previous commanded joint velocities
    f_cmd: (12,) MPC contact forces; contacts: (4,) flags
    pgoals/vgoals/agoals: (3, 4) foot references in the base frame.
    """
    import jax
    with jax.default_matmul_precision("highest"):
        return _compute_wbc(cfg, model, state, qj, b_v18, f_cmd, contacts,
                            pgoals, vgoals, agoals, settings)


def _compute_wbc(cfg, model, state, qj, b_v18, f_cmd, contacts,
                 pgoals, vgoals, agoals, settings):
    dtype = qj.dtype
    vj = b_v18[6:]
    if settings is None:
        settings = qp.QPSettings(eps_abs=cfg.wbc_eps_abs,
                                 eps_rel=cfg.wbc_eps_rel,
                                 max_iter=cfg.wbc_max_iter)

    ksc = (state.k_since_contact + contacts) * contacts

    # ---- inverse kinematics on the fixed-base model ----------------------
    zero3 = jnp.zeros(3, dtype)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)
    kin = rbd.frame_kinematics(model, zero3, ident, qj, jnp.zeros(6, dtype),
                               vj)
    J = rbd.foot_jacobians(model, zero3, ident, qj,
                           fk=(kin.R, kin.p))                # (4, 3, 18)
    Jleg = jnp.stack([J[f, :, 6 + 3 * f:9 + 3 * f]
                      for f in range(4)])                    # (4, 3, 3)

    perr = pgoals.T - kin.pos                                # (4, 3)
    afeet = (cfg.kp_flyingfeet * perr
             - cfg.kd_flyingfeet * (kin.vel - vgoals.T) + agoals.T)
    afeet = jnp.where(contacts[:, None] > 0, 0.0, afeet)
    afeet = afeet - kin.drift                                # (4, 3)

    # adjugate inverse: batched jnp.linalg.inv of 3x3 blocks costs 4.6 ms
    # at B=1024 on v5e; the unrolled form fuses into the surrounding graph
    Jinv = lin.inv3(Jleg)                                    # (4, 3, 3)
    ddq_j = jnp.einsum("fij,fj->fi", Jinv, afeet).reshape(12)
    dq_cmd = jnp.einsum("fij,fj->fi", Jinv, vgoals.T).reshape(12)
    q_step = jnp.einsum("fij,fj->fi", Jinv, perr).reshape(12)

    # ---- box QP on contact-force deltas ----------------------------------
    # The reference evaluates these Jacobians with the base at
    # (0, 0, h_ref) (scripts/QP_WBC.py:96-101), but LOCAL_WORLD_ALIGNED
    # linear foot Jacobians are invariant to base translation (they
    # depend only on relative body positions), so they equal J above
    # (verified to fp roundoff) — no second kinematic sweep needed.
    Jc = jnp.where(contacts[:, None, None] > 0, J, 0.0).reshape(12, 18)

    ddq_cmd = jnp.concatenate([jnp.zeros(6, dtype), ddq_j])
    rnea6 = rbd.rnea(model, ident, qj, b_v18, ddq_cmd, cfg.gravity)[:6]

    Yinv = jnp.asarray(1.0 / base_inertia_diag(), dtype)     # (6,)
    X = Jc[:, 0:6].T                                         # (6, 12)
    A = Yinv[:, None] * X                                    # (6, 12)
    gamma = Yinv * (X @ f_cmd - rnea6)                       # (6,)
    H = (cfg.wbc_q1 * A.T) @ A + cfg.wbc_q2 * jnp.eye(12, dtype=dtype)
    g = (cfg.wbc_q1 * A.T) @ gamma

    G = jnp.asarray(friction_generators(cfg.mu), dtype)
    Gf = G @ f_cmd
    sol = qp.solve(H, g, G, -Gf, -Gf + cfg.fz_max, settings,
                   x0=state.qp_x, y0=state.qp_y)
    df = sol.x
    f_with_delta = f_cmd + df
    ddq_delta = A @ df + gamma                               # (6,)

    # ---- feedforward torques ---------------------------------------------
    ddq_final = ddq_cmd.at[0:6].add(ddq_delta)
    tau_ff = (rbd.rnea(model, ident, qj, b_v18, ddq_final, cfg.gravity)[6:]
              - Jc[:, 6:].T @ f_with_delta)

    new_state = WBCState(k_since_contact=ksc, qp_x=df, qp_y=sol.y)
    return WBCResult(qdes=qj + q_step, vdes=dq_cmd, tau_ff=tau_ff,
                     f_with_delta=f_with_delta,
                     ddq_cmd=ddq_final, feet_pos=kin.pos, feet_vel=kin.vel,
                     state=new_state, qp_iters=sol.iters)


# Prime the constant eagerly (outside any trace) at import time.
base_inertia_diag()
