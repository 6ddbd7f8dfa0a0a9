"""DDP MPC with joint footstep optimization — the MPC_crocoddyl_planner
family (scripts/crocoddyl_class/MPC_crocoddyl_planner.py + the external
`quadruped_walkgen` ActionModelQuadrupedAugmented/Step C++ models).

The reference augments the 12-dim SRB state with the xy positions of the
four feet (20-dim state, MPC_crocoddyl_planner.py:136-141) and
interleaves "Step" action models at gait-phase boundaries so the DDP
optimizes footstep locations jointly with contact forces
(MPC_crocoddyl_planner.py:310-361). Step nodes have trivial dynamics
(feet teleport by the step control) and their count varies with the gait
phase — a dynamically-sized model list rebuilt every cycle.

TPU-native redesign: instead of inserting extra nodes (dynamic shapes),
every node carries a uniform 20-dim control u = [forces(12); dp(8)] and
the step component is gated by a per-node landing mask

    land[k, i] = contact[k, i] AND NOT contact[k-1, i]

applied *before* the SRB dynamics of node k: p_used = p + land*dp. This
folds each Step node into the augmented node that follows it — the same
optimization problem (the Step node's SRB state is unchanged and its
step cost moves intact), with static shapes, solved by the shared
batched iLQR (ops/ilqr.py). Weights mirror the reference wrapper:
state/force/friction (MPC_crocoddyl_planner.py:50-74), shoulder [0.3,
0.4] per foot (:101), step 0.8 (:108), last-position lock 2.0 with the
10%-of-flight stop-optimization schedule (:111-118), terminal node with
force/friction/shoulder weights zeroed (:349-352). The shoulder cost
target includes the symmetry + centrifugal Raibert terms
(:103-105; heuristic of src/FootstepPlanner.cpp:158-186).
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

# Reference planner weights (MPC_crocoddyl_planner.py:50-117)
STATE_WEIGHTS = np.array(
    [0.3, 0.3, 2.0, 0.9, 1.0, 0.4,
     1.5 * np.sqrt(0.3), 2.0 * np.sqrt(0.3), 1.0 * np.sqrt(2.0),
     0.05 * np.sqrt(0.9), 0.07 * np.sqrt(1.0), 0.05 * np.sqrt(0.4)])
FORCE_WEIGHT = 0.01          # (:70)
FRICTION_WEIGHT = 0.5        # (:74)
SHOULDER_WEIGHTS = np.tile(np.array([0.3, 0.4]), 4)   # (:101)
STEP_WEIGHT = 0.8            # (:108)
LAST_POSITION_WEIGHT = 2.0   # (:111)
STOP_OPTIM = 0.1             # stop optimizing at 10% of flight left (:117)
MIN_FZ = 0.0                 # (:24 min_fz default)

# default foot xy under the shoulders, local frame (:141)
P0_SHOULDERS = np.array([0.1946, 0.15005, 0.1946, -0.15005,
                         -0.1946, 0.15005, -0.1946, -0.15005])


class PlannerSettings(NamedTuple):
    max_iters: int = 10            # (:77)
    symmetry_term: bool = True     # (:104-105)
    centrifugal_term: bool = True
    nonlinear: bool = True         # augmented models use the state yaw


class PlannerState(NamedTuple):
    """Warm-start carry + cross-cycle foot memory (o_fsteps, :127-128)."""
    xs: jnp.ndarray        # (N+1, 20)
    us: jnp.ndarray        # (N, 20)
    last_p: jnp.ndarray    # (8,) footholds predicted by the previous cycle


def init_planner_state(cfg: Config, dtype=jnp.float32) -> PlannerState:
    N = cfg.n_steps
    return PlannerState(xs=jnp.zeros((N + 1, 20), dtype),
                        us=jnp.zeros((N, 20), dtype),
                        last_p=jnp.asarray(P0_SHOULDERS, dtype))


class PlannerResult(NamedTuple):
    x_f_applied: jnp.ndarray   # (24, N) same contract as the other MPCs
    fsteps: jnp.ndarray        # (N, 12) optimized footstep plan
    o_target: jnp.ndarray      # (3, 4) optimized next touchdown per foot
    state: PlannerState
    cost: jnp.ndarray
    cost_trace: jnp.ndarray


def landing_mask(gait: jnp.ndarray, gait_prev0: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) mask of feet that touch down at node k (contact rising edge
    — where the reference inserts a Step model,
    MPC_crocoddyl_planner.py:333-340,427-432)."""
    prev = jnp.concatenate([gait_prev0[None], gait[:-1]], axis=0)
    return gait * (1.0 - prev)


def _shoulder_target(cfg: Config, x, settings: PlannerSettings):
    """Per-foot xy target of the shoulder cost: shoulder projection plus
    the symmetry and centrifugal Raibert terms
    (src/FootstepPlanner.cpp:158-186)."""
    dtype = x.dtype
    sh = jnp.asarray(P0_SHOULDERS, dtype).reshape(4, 2)
    R2 = rot_z(x[5])[0:2, 0:2]
    base = x[0:2][None, :] + sh @ R2.T                       # (4, 2)
    t_stance = 0.5 * cfg.T_gait
    v = x[6:8]
    if settings.symmetry_term:
        base = base + 0.5 * t_stance * v[None, :]
    if settings.centrifugal_term:
        cross = jnp.stack([v[1] * x[11], -v[0] * x[11]])
        base = base + 0.5 * jnp.sqrt(cfg.h_ref / cfg.gravity) * cross
    return base                                              # (4, 2)


def _dynamics(cfg: Config, x, u, gait_k, land_k, yaw_lin):
    """Folded Step + Augmented node: feet landing at node k teleport by
    the step control, then one SRB step with levers from the foot-position
    STATE (the quantity being optimized)."""
    dt = cfg.dt_mpc
    dtype = x.dtype
    p = x[12:20] + u[12:20] * jnp.repeat(land_k, 2)
    gI = jnp.asarray(np.asarray(cfg.gI).reshape(3, 3), dtype)
    R = rot_z(yaw_lin)
    I_inv = jnp.linalg.inv(R @ gI @ R.T)
    com = x[0:3] + jnp.asarray([0.0, 0.0, cfg.offset_com_z], dtype)
    feet = jnp.concatenate([p.reshape(4, 2),
                            jnp.zeros((4, 1), dtype)], axis=1)
    lever = feet - com[None, :]
    f4 = u[0:12].reshape(4, 3) * gait_k[:, None]
    f_tot = f4.sum(axis=0)
    tau = jnp.einsum("fab,fb->a", skew(lever), f4)
    acc = jnp.concatenate([f_tot / cfg.mass
                           - jnp.asarray([0., 0., cfg.gravity], dtype),
                           I_inv @ tau])
    x12 = x[0:12].at[0:6].add(dt * x[6:12])
    x12 = x12.at[6:12].add(dt * acc)
    return jnp.concatenate([x12, p])


def _stage_cost(cfg: Config, x, u, xref_k, gait_k, land_k, lp_w_k, last_p,
                settings: PlannerSettings, terminal=False):
    dtype = x.dtype
    w = jnp.asarray(STATE_WEIGHTS, dtype)
    c = 0.5 * jnp.sum((w * (x[0:12] - xref_k)) ** 2)
    if terminal:  # terminal model zeroes every other weight (:349-352)
        return c

    p = x[12:20] + u[12:20] * jnp.repeat(land_k, 2)

    # shoulder cost on the optimized foot positions, contact feet only
    tgt = _shoulder_target(cfg, x, settings)                 # (4, 2)
    w_sh = jnp.asarray(SHOULDER_WEIGHTS, dtype).reshape(4, 2)
    d = (p.reshape(4, 2) - tgt) * gait_k[:, None]
    c = c + 0.5 * jnp.sum((w_sh * d) ** 2)

    # step-magnitude cost at landing feet (stepWeights, :108)
    c = c + 0.5 * STEP_WEIGHT ** 2 * jnp.sum(
        (u[12:20] * jnp.repeat(land_k, 2)) ** 2)

    # last-position lock near the end of the flight phase (:111-118,498)
    c = c + 0.5 * jnp.sum(lp_w_k * (p - last_p) ** 2)

    # force regularization + friction cone (inner mu/sqrt(2), :45-48)
    f4 = u[0:12].reshape(4, 3)
    c = c + 0.5 * FORCE_WEIGHT ** 2 * jnp.sum(
        (u[0:12] * jnp.repeat(gait_k, 3)) ** 2)
    mu_i = cfg.mu / np.sqrt(2.0)
    fx, fy, fz = f4[:, 0], f4[:, 1], f4[:, 2]
    r = jnp.stack([fx - mu_i * fz, -fx - mu_i * fz,
                   fy - mu_i * fz, -fy - mu_i * fz,
                   MIN_FZ - fz, fz - cfg.fz_max], axis=1)
    viol = jnp.maximum(r, 0.0) * gait_k[:, None]
    c = c + 0.5 * FRICTION_WEIGHT * jnp.sum(viol ** 2)
    return c


@functools.partial(jax.jit, static_argnums=(0, 5))
def solve_mpc_planner(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray,
                      feet_p0: jnp.ndarray,
                      state: Optional[PlannerState] = None,
                      settings: PlannerSettings = PlannerSettings(),
                      cycle=0) -> PlannerResult:
    """One footstep-optimizing DDP solve (MPC_crocoddyl_planner.solve,
    :143-161). Batch with vmap over (xref, fsteps, feet_p0, state).

    xref: (12, N+1); fsteps: (N_gait, 12) heuristic plan — used only for
    the contact schedule and the warm-start foot positions; feet_p0:
    (3, 4) measured current foot positions (local frame); cycle: MPC
    cycle counter — the last-position lock activates after cycle 20
    (start_stop_optim, :121,247-249)."""
    N = cfg.n_steps
    dtype = xref.dtype
    if state is None:
        state = init_planner_state(cfg, dtype)
    gait = gait_from_fsteps(fsteps, N)                       # (N, 4)
    land = landing_mask(gait, gait[0])                       # (N, 4)
    xref_n = xref[:, 1:].T                                   # (N, 12)

    # initial foot state: measured position for contact feet, shoulder
    # default for swing feet (:182-192)
    g0 = gait[0]
    p0 = (jnp.repeat(g0, 2) * feet_p0[0:2].T.reshape(8)
          + jnp.repeat(1.0 - g0, 2) * jnp.asarray(P0_SHOULDERS, dtype))
    x0 = jnp.concatenate([xref[:, 0], p0])

    # last-position lock schedule: for each foot, lock the final
    # `stop_optim` fraction of swing nodes before its NEXT touchdown
    # (updatePositionWeights, :111-118,498-507) — distance-to-landing via
    # a reverse scan
    def next_land(carry, row):
        nxt = jnp.where(row > 0, 0.0, carry + 1.0)
        return nxt, nxt
    _, dist = jax.lax.scan(next_land, jnp.full((4,), float(N), dtype),
                           land.astype(dtype), reverse=True)
    lock_window = max(1.0, STOP_OPTIM * 0.5 * cfg.T_gait / cfg.dt_mpc)
    lock_on = (jnp.asarray(cycle) > 20).astype(dtype)   # start_stop_optim
    lp_w = (LAST_POSITION_WEIGHT ** 2 * lock_on
            * jnp.repeat((1.0 - gait) * (dist <= lock_window), 2, axis=1))

    us0 = jnp.concatenate([state.us[1:], state.us[-1:]])
    umask = jnp.concatenate([jnp.repeat(gait, 3, axis=1),
                             jnp.repeat(land, 2, axis=1)], axis=1)
    us0 = us0 * umask

    def step_k(x, u, k):
        yaw = x[5] if settings.nonlinear else xref_n[k, 5]
        return _dynamics(cfg, x, u, gait[k], land[k], yaw)

    def cost_k(x, u, k):
        return _stage_cost(cfg, x, u, xref_n[k], gait[k], land[k],
                           lp_w[k], state.last_p, settings)

    def cost_T(x):
        return _stage_cost(cfg, x, jnp.zeros(20, dtype), xref_n[-1],
                           gait[-1], land[-1], lp_w[-1], state.last_p,
                           settings, terminal=True)

    def project_u(u, k):
        return u * umask[k]

    ilqr_settings = ilqr.ILQRSettings(max_iters=settings.max_iters)
    res = ilqr.solve(step_k, cost_k, cost_T, x0, us0, ilqr_settings,
                     project_u=project_u)

    # ---- extraction -------------------------------------------------------
    # optimized foot positions per node (POST-step: feet state of node k+1
    # already includes the landing displacement applied at node k)
    p_traj = res.xs[1:, 12:20]                               # (N, 8)
    feet3 = jnp.concatenate(
        [p_traj.reshape(N, 4, 2),
         jnp.zeros((N, 4, 1), dtype)], axis=2)               # (N, 4, 3)
    fsteps_opt = (feet3 * gait[:, :, None]).reshape(N, 12)   # (:474-483)

    # next touchdown target per foot: position at its first landing node
    first_land = jnp.argmax(land > 0, axis=0)                # (4,)
    has_land = jnp.any(land > 0, axis=0)
    p_land = p_traj.reshape(N, 4, 2)[first_land, jnp.arange(4)]  # (4, 2)
    p_cur = feet_p0[0:2].T                                   # (4, 2)
    o_target = jnp.where(has_land[:, None], p_land, p_cur)
    o_target = jnp.concatenate([o_target.T,
                                jnp.zeros((1, 4), dtype)], axis=0)

    # o_fsteps memory for the next cycle's lock cost (:491-495)
    last_p = o_target[0:2].T.reshape(8)

    x_f = jnp.concatenate([res.xs[1:, 0:12].T, res.us[:, 0:12].T], axis=0)
    return PlannerResult(
        x_f_applied=x_f, fsteps=fsteps_opt, o_target=o_target,
        state=PlannerState(xs=res.xs, us=res.us, last_p=last_p),
        cost=res.cost, cost_trace=res.cost_trace)
