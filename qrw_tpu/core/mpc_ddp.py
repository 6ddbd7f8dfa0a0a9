"""DDP / iLQR centroidal MPC — the Crocoddyl-backend MPC family.

TPU-native re-design of the reference's second MPC backend
(scripts/crocoddyl_class/MPC_crocoddyl.py + the external
`quadruped_walkgen` C++ action models): a single-rigid-body optimal
control problem over the same N=16 horizon, solved with iterative LQR
instead of a condensed QP. Semantics mirrored from the reference wrapper:

  * state weights derived from the OSQP MPC weights
    (scripts/crocoddyl_class/MPC_crocoddyl.py:44-61),
  * force regularization 0.01 per axis (:64), friction-cone quadratic
    penalty weight 1.0 with the INNER cone approximation mu/sqrt(2)
    (:37-41,:66), fz in [0.2, 25] (:73-74),
  * shoulder-overextension penalty weight 10, limit 0.27 m (:80-82),
  * max 10 DDP iterations, warm start from the previous solution
    shifted one node (:67,:201-208),
  * linear variant uses the yaw of the REFERENCE trajectory in the
    dynamics (same linearization as src/MPC.cpp:439-447); the nonlinear
    variant uses the current iterate's yaw (linearModel flag, :20).

The solver is the generic batched iLQR of ops/ilqr.py (lax.scan
backward Riccati sweep, vmapped parallel line search, Levenberg
regularization on Quu); this module supplies the SRB action-model
closures. Derivatives of the per-node residual costs (friction cone,
shoulder) are exact via autodiff with branch-free active-set masks, so
the whole solve jits with static shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core.mpc import gait_from_fsteps
from qrw_tpu.ops import ilqr
from qrw_tpu.ops.rotations import rot_z, skew

# Reference weight derivation (MPC_crocoddyl.py:44-66)
STATE_WEIGHTS = np.sqrt(np.array(
    [0.5, 0.5, 2.0, 0.11, 0.11, 0.11,
     2.0 * np.sqrt(0.5), 2.0 * np.sqrt(0.5), 2.0 * np.sqrt(2.0),
     0.05 * np.sqrt(0.11), 0.05 * np.sqrt(0.11), 0.05 * np.sqrt(0.11)]))
FORCE_WEIGHT = 0.01
FRICTION_WEIGHT = 1.0
SHOULDER_WEIGHT = 10.0
SHOULDER_HLIM = 0.27
MIN_FZ = 0.2


class DDPSettings(NamedTuple):
    max_iters: int = 10          # reference max_iteration (:67)
    # crocoddyl-style line search schedule (SolverDDP alphas 2^-k)
    alphas: tuple = (1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625,
                     0.0078125, 0.00390625)
    reg_init: float = 1e-9       # Quu Levenberg regularization (adapted)
    reg_min: float = 1e-9
    reg_max: float = 1e4
    reg_inc: float = 10.0        # on rejected iteration (crocoddyl regfactor)
    reg_dec: float = 0.1         # on accepted iteration
    nonlinear: bool = False      # linearModel flag (:20)
    # MPC_crocoddyl_2 variant toggles (scripts/crocoddyl_class/
    # MPC_crocoddyl_2.py:45-48,69-71): implicit integration uses the
    # updated velocity in the position update (P+ = P + dt*V+), and
    # relative_forces regularizes forces about the static gravity
    # distribution mass*g/nb_contacts on stance feet instead of zero.
    implicit_integration: bool = False
    relative_forces: bool = False

    def to_ilqr(self) -> ilqr.ILQRSettings:
        return ilqr.ILQRSettings(
            max_iters=self.max_iters, alphas=self.alphas,
            reg_init=self.reg_init, reg_min=self.reg_min,
            reg_max=self.reg_max, reg_inc=self.reg_inc,
            reg_dec=self.reg_dec)


class DDPState(NamedTuple):
    """Warm start: previous (xs, us) trajectories (MPC_crocoddyl.py:201)."""
    xs: jnp.ndarray   # (N+1, 12)
    us: jnp.ndarray   # (N, 12)


def init_ddp_state(cfg: Config, dtype=jnp.float32) -> DDPState:
    N = cfg.n_steps
    return DDPState(xs=jnp.zeros((N + 1, 12), dtype),
                    us=jnp.zeros((N, 12), dtype))


class DDPResult(NamedTuple):
    x_f_applied: jnp.ndarray  # (24, N) same contract as the QP MPC
    state: DDPState
    cost: jnp.ndarray
    cost_trace: jnp.ndarray   # (max_iters,) accepted cost per DDP iter
    iters: jnp.ndarray


def _dynamics(cfg: Config, x, u, feet_k, gait_k, yaw_lin,
              implicit: bool = False, dt=None):
    """SRB discrete step (same physics as src/MPC.cpp:89,213-232).

    yaw_lin: yaw used for the inertia/lever rotation — reference value
    for the linear model, replaced by x[5] in the nonlinear variant.
    implicit: MPC_crocoddyl_2 semi-implicit Euler (P+ = P + dt*V+,
    scripts/crocoddyl_class/MPC_crocoddyl_2.py:45-48).
    dt: node duration (defaults to cfg.dt_mpc; the 500 Hz MPC mode
    passes a shrunken first-node duration, the dt_tsid first-node
    semantics of scripts/crocoddyl_eval/test_5)."""
    if dt is None:
        dt = cfg.dt_mpc
    dtype = x.dtype
    gI = jnp.asarray(np.asarray(cfg.gI).reshape(3, 3), dtype)
    R = rot_z(yaw_lin)
    I_inv = jnp.linalg.inv(R @ gI @ R.T)
    com = x[0:3] + jnp.asarray([0.0, 0.0, cfg.offset_com_z], dtype)
    lever = feet_k.reshape(4, 3) - com[None, :]              # (4, 3)
    u4 = (u.reshape(4, 3) * gait_k[:, None])                 # gate swing
    f_tot = u4.sum(axis=0)
    tau = jnp.einsum("fab,fb->a", skew(lever), u4)
    acc = jnp.concatenate([f_tot / cfg.mass
                           - jnp.asarray([0., 0., cfg.gravity], dtype),
                           I_inv @ tau])
    v_new = x[6:12] + dt * acc
    xn = x.at[0:6].add(dt * (v_new if implicit else x[6:12]))
    xn = xn.at[6:12].set(v_new)
    return xn


def _u_ref(cfg: Config, gait_k, dtype):
    """Static gravity distribution over stance feet: the relative-forces
    regularization center (quadruped_walkgen relative_forces semantics,
    scripts/crocoddyl_class/MPC_crocoddyl_2.py:69-71)."""
    n_c = jnp.maximum(gait_k.sum(), 1.0)
    fz = cfg.mass * cfg.gravity / n_c
    return (jnp.asarray([0.0, 0.0, 1.0], dtype)[None, :]
            * (fz * gait_k)[:, None]).reshape(12)


def _stage_cost(cfg: Config, x, u, xref_k, feet_k, gait_k, terminal=False,
                relative_forces: bool = False):
    """Running cost of the action model (weights above)."""
    dtype = x.dtype
    w = jnp.asarray(STATE_WEIGHTS, dtype)
    c = 0.5 * jnp.sum((w * (x - xref_k)) ** 2)

    # shoulder over-extension penalty (model.shoulderWeights/hlim)
    sh = jnp.asarray([[0.1946, 0.1946, -0.1946, -0.1946],
                      [0.14695, -0.14695, 0.14695, -0.14695]], dtype)
    R2 = rot_z(x[5])[0:2, 0:2]
    p_sh = x[0:2, None] + R2 @ sh                            # (2, 4)
    feet = feet_k.reshape(4, 3)
    d = jnp.sqrt(jnp.sum((p_sh.T - feet[:, 0:2]) ** 2, axis=1)
                 + x[2] ** 2 + 1e-12)
    viol_sh = jnp.maximum(d - SHOULDER_HLIM, 0.0) * gait_k
    c = c + 0.5 * SHOULDER_WEIGHT * jnp.sum(viol_sh ** 2)

    if terminal:
        return c

    u4 = u.reshape(4, 3)
    u_reg = u - _u_ref(cfg, gait_k, dtype) if relative_forces else u
    c = c + 0.5 * FORCE_WEIGHT ** 2 * jnp.sum((u_reg * _u_mask(gait_k)) ** 2)

    # friction cone penalty, inner approximation mu/sqrt(2)
    mu_i = cfg.mu / np.sqrt(2.0)
    fx, fy, fz = u4[:, 0], u4[:, 1], u4[:, 2]
    r = jnp.stack([fx - mu_i * fz, -fx - mu_i * fz,
                   fy - mu_i * fz, -fy - mu_i * fz,
                   MIN_FZ - fz, fz - cfg.fz_max], axis=1)    # (4, 6)
    viol = jnp.maximum(r, 0.0) * gait_k[:, None]
    c = c + 0.5 * FRICTION_WEIGHT * jnp.sum(viol ** 2)
    return c


def _u_mask(gait_k):
    return jnp.repeat(gait_k, 3)


@functools.partial(jax.jit, static_argnums=(0, 4))
def solve_mpc_ddp(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray,
                  state: Optional[DDPState] = None,
                  settings: DDPSettings = DDPSettings(),
                  dt_first=None, shift_warm=None) -> DDPResult:
    """One DDP MPC solve (MPC_crocoddyl.solve, :184-214). Batch with vmap
    over (xref, fsteps, state).

    dt_first: optional traced duration of the first node — the 500 Hz
    re-solve mode shrinks it to the time remaining until the next gait
    boundary (MPC_crocoddyl_2's dt_tsid first node,
    scripts/crocoddyl_eval/test_5/main.py:85)."""
    N = cfg.n_steps
    dtype = xref.dtype
    if state is None:
        state = init_ddp_state(cfg, dtype)
    gait = gait_from_fsteps(fsteps, N)                       # (N, 4)
    feet = fsteps[:N]                                        # (N, 12)
    x0 = xref[:, 0]
    xref_n = xref[:, 1:].T                                   # (N, 12)

    # warm start: shift previous solution one node (:201-208). The
    # appended terminal node reuses the previous terminal control (gait-
    # remasked) rather than the reference's fixed [0.5, 0.5, 5] guess: a
    # large cold-start guess at one node makes the penalty-blind local
    # quadratic model wildly optimistic and stalls the line search.
    us0 = jnp.concatenate([state.us[1:], state.us[-1:]])
    if shift_warm is not None:
        # 500 Hz re-solve mode: only shift the warm start on gait-roll
        # boundaries; intermediate re-solves refine the same plan.
        us0 = jnp.where(jnp.asarray(shift_warm), us0, state.us)
    us0 = us0 * jax.vmap(_u_mask)(gait)

    def step_k(x, u, k):
        yaw = x[5] if settings.nonlinear else xref_n[k, 5]
        dt = None
        if dt_first is not None:
            dt = jnp.where(k == 0, jnp.asarray(dt_first, dtype),
                           jnp.asarray(cfg.dt_mpc, dtype))
        return _dynamics(cfg, x, u, feet[k], gait[k], yaw,
                         implicit=settings.implicit_integration, dt=dt)

    def cost_k(x, u, k):
        return _stage_cost(cfg, x, u, xref_n[k], feet[k], gait[k],
                           relative_forces=settings.relative_forces)

    def cost_T(x):
        return _stage_cost(cfg, x, jnp.zeros(12, dtype), xref_n[-1],
                           feet[-1], gait[-1], terminal=True)

    def project_u(u, k):
        return u * _u_mask(gait[k])

    res = ilqr.solve(step_k, cost_k, cost_T, x0, us0,
                     settings.to_ilqr(), project_u=project_u)

    x_f = jnp.concatenate([res.xs[1:].T, res.us.T], axis=0)  # (24, N)
    return DDPResult(x_f_applied=x_f,
                     state=DDPState(xs=res.xs, us=res.us),
                     cost=res.cost, cost_trace=res.cost_trace,
                     iters=jnp.asarray(settings.max_iters, jnp.int32))
