"""Contact-sequence gait scheduler as a pure function over a state pytree.

Re-designs the reference's stateful Gait class (src/Gait.cpp) for
jit/vmap: the three N_gait x 4 binary matrices (past / current / desired
contact state per foot, src/Gait.cpp:26-28) live in an explicit GaitState
pytree; rolling (src/Gait.cpp:221-260), gait switching (src/Gait.cpp:197-219)
and phase-duration queries (src/Gait.cpp:142-185) become fixed-shape,
branch-free array programs that XLA fuses into a handful of VPU ops. All
"while row nonzero" scans of the reference become masked cumulative products
over the static N_gait axis, so the same code vectorizes over thousands of
scenarios with jax.vmap.

Contact value is 1.0 (stance) / 0.0 (swing); an all-zero row marks the end
of the used window, exactly like the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config

# joystick gait codes (src/Gait.cpp:197-219)
CODE_NONE = 0
CODE_PACING = 1
CODE_BOUNDING = 2
CODE_TROT = 3
CODE_STATIC = 4


class GaitState(NamedTuple):
    past: jnp.ndarray      # (N_gait, 4) rows: most recent first
    current: jnp.ndarray   # (N_gait, 4) row 0 = current MPC step
    desired: jnp.ndarray   # (N_gait, 4) future pattern (circular prefix)
    new_phase: jnp.ndarray  # () bool — contact set changed at last roll
    is_static: jnp.ndarray  # () bool — static gait requested


# ----------------------------------------------------------------------
# Pattern construction (host-side, static given the config)
# ----------------------------------------------------------------------

def _pattern(cfg: Config, kind: str) -> np.ndarray:
    """Desired-gait matrix for one gait type (src/Gait.cpp:38-108)."""
    n_rows = cfg.N_gait
    steps_period = int(round(cfg.T_gait / cfg.dt_mpc))
    out = np.zeros((n_rows, 4))
    if kind == "walk":
        n = steps_period // 4
        seqs = [(0, 1, 1, 1), (1, 0, 1, 1), (1, 1, 0, 1), (1, 1, 1, 0)]
    elif kind == "trot":
        n = steps_period // 2
        seqs = [(1, 0, 0, 1), (0, 1, 1, 0)]
    elif kind == "pacing":
        n = steps_period // 2
        seqs = [(1, 0, 1, 0), (0, 1, 0, 1)]
    elif kind == "bounding":
        n = steps_period // 2
        seqs = [(1, 1, 0, 0), (0, 0, 1, 1)]
    elif kind == "static":
        n = steps_period
        seqs = [(1, 1, 1, 1)]
    else:
        raise ValueError(kind)
    for i, s in enumerate(seqs):
        out[i * n:(i + 1) * n] = s
    return out


def make_gait(cfg: Config, kind: str = "trot") -> GaitState:
    """Initial gait state: current gait filled cyclically from the desired
    pattern over the MPC horizon, desired aged by the wrap position
    (src/Gait.cpp:110-140)."""
    n_steps = cfg.n_steps
    steps_gait = int(round(cfg.T_gait / cfg.dt_mpc))
    if n_steps > cfg.N_gait or steps_gait > cfg.N_gait:
        raise ValueError(
            f"N_gait={cfg.N_gait} too small for T_mpc/T_gait "
            f"({n_steps}/{steps_gait} rows needed); increase N_gait "
            "(mirrors src/Gait.cpp:30-31)")
    des = _pattern(cfg, kind)
    n_rows = int(np.sum(np.any(des != 0, axis=1)))
    cur = np.zeros_like(des)
    # The controller rolls the gait at k=0 (updateGait with k%k_mpc==0,
    # src/Gait.cpp:187-195 — the reference does the same), which consumes
    # one row before anything is planned. Initialize one row EARLIER in
    # the cycle so the post-roll window starts exactly at a phase
    # boundary: the first swing then starts at t0=0 instead of 25% into
    # the phase (the reference's startup jolt — its first swing-foot
    # reference jumps off the ground mid-profile, which destabilizes
    # short-phase gaits like the 4-phase walk).
    for j in range(n_steps):
        cur[j] = des[(j - 1) % n_rows]
    wrap = (n_steps - 1) % n_rows
    des[:n_rows] = np.roll(des[:n_rows], -wrap, axis=0)
    return GaitState(
        past=jnp.zeros((cfg.N_gait, 4)),
        current=jnp.asarray(cur),
        desired=jnp.asarray(des),
        new_phase=jnp.asarray(False),
        is_static=jnp.asarray(kind == "static"),
    )


def gait_patterns(cfg: Config) -> jnp.ndarray:
    """(5, N_gait, 4) desired matrices indexed by joystick code 0..4
    (code 0 slot holds the trot default and is never selected)."""
    kinds = ["trot", "pacing", "bounding", "trot", "static"]
    return jnp.asarray(np.stack([_pattern(cfg, k) for k in kinds]))


# ----------------------------------------------------------------------
# Pure transitions
# ----------------------------------------------------------------------

def _row_nonzero(m):
    return jnp.any(m != 0.0, axis=-1)


def _prefix_len(m):
    """Number of leading nonzero rows (index of first empty line)."""
    nz = _row_nonzero(m)
    return jnp.sum(jnp.cumprod(nz.astype(jnp.int32)))


def roll_gait(state: GaitState) -> GaitState:
    """One MPC step: current row 0 is pushed onto past, the current window
    shifts by one row and consumes desired row 0, desired circularly shifts
    its nonzero prefix (src/Gait.cpp:221-260)."""
    n = state.current.shape[0]
    idx = jnp.arange(n)

    past = jnp.concatenate([state.current[0:1], state.past[:-1]], axis=0)
    new_phase = jnp.any(state.current[0] != state.current[1])

    n_cur = _prefix_len(state.current)
    shifted = state.current[jnp.minimum(idx + 1, n - 1)]
    cur = jnp.where((idx < n_cur - 1)[:, None], shifted, state.current)
    cur = jnp.where((idx == n_cur - 1)[:, None], state.desired[0][None, :], cur)

    n_des = _prefix_len(state.desired)
    d_shift = state.desired[jnp.minimum(idx + 1, n - 1)]
    des = jnp.where((idx < n_des - 1)[:, None], d_shift, state.desired)
    des = jnp.where((idx == n_des - 1)[:, None], state.desired[0][None, :], des)

    return state._replace(past=past, current=cur, desired=des,
                          new_phase=new_phase)


def change_gait(state: GaitState, code, patterns: jnp.ndarray) -> GaitState:
    """Replace the desired gait according to a joystick code 1..4; code 0
    (or any other value) leaves it untouched (src/Gait.cpp:197-219)."""
    code = jnp.asarray(code)
    active = (code >= 1) & (code <= 4)
    sel = patterns[jnp.clip(code, 0, 4)]
    des = jnp.where(active, sel, state.desired)
    # the reference clears is_static_ on every call and re-sets it only for
    # code 4 (src/Gait.cpp:199,215-218) — i.e. it tracks the last code
    return state._replace(desired=des, is_static=(code == CODE_STATIC))


def update_gait(state: GaitState, k, k_mpc: int, code,
                patterns: jnp.ndarray) -> GaitState:
    """Per-tick gait update: apply gait switch, roll once per k_mpc ticks
    (src/Gait.cpp:187-195). `k_mpc` is static; `k` may be traced."""
    state = change_gait(state, code, patterns)
    do_roll = (jnp.asarray(k) % k_mpc) == 0
    rolled = roll_gait(state)
    return GaitState(*[jnp.where(do_roll, a, b)
                       for a, b in zip(rolled, state)])


# ----------------------------------------------------------------------
# Phase-duration queries (vectorized over all rows x feet at once)
# ----------------------------------------------------------------------

class PhaseInfo(NamedTuple):
    duration: jnp.ndarray   # (N_gait, 4) phase length [s] containing row i
    remaining: jnp.ndarray  # (N_gait, 4) steps from row i to phase end (incl.)


def phase_durations(state: GaitState, value: float, dt_mpc: float) -> PhaseInfo:
    """For every (row i, foot j): the total duration of the contiguous
    swing/stance phase (gait coefficient == value) containing row i, and the
    remaining step count to the phase end.

    Mirrors Gait::getPhaseDuration (src/Gait.cpp:142-185): the forward scan
    continues into the desired gait when it runs off the end of the current
    window; the backward scan continues into the past gait when it reaches
    row 0. Computed for all (i, j) simultaneously with masked running
    counts — the reference's while-loops become static unrolled updates.
    """
    cur, des, past = state.current, state.desired, state.past
    n = cur.shape[0]
    # Prefix lengths: the gait matrices keep their nonzero rows as a
    # contiguous prefix (an all-zero row terminates the used window —
    # the invariant all the reference's while-loops rely on,
    # src/Gait.cpp:142-185; make_gait/roll_gait preserve it), so "row
    # usable" is idx < prefix_len — a broadcast compare instead of a
    # per-element gather (the gather dominated the fleet tick profile).
    idx = jnp.arange(n)
    n_cur = _prefix_len(cur)
    mc = (idx < n_cur)[:, None] & (cur == value)   # row usable & matches
    md = (idx < _prefix_len(des))[:, None] & (des == value)
    mp = (idx < _prefix_len(past))[:, None] & (past == value)

    # F[i] = number of consecutive matching rows at i+1, i+2, ... (current)
    F = [jnp.zeros((4,), dtype=jnp.int32) for _ in range(n)]
    for i in range(n - 2, -1, -1):
        F[i] = jnp.where(mc[i + 1], 1 + F[i + 1], 0)
    F = jnp.stack(F)                       # (n, 4)

    # consecutive matches from row 0 of desired / past
    run_d = jnp.sum(jnp.cumprod(md.astype(jnp.int32), axis=0), axis=0)
    run_p = jnp.sum(jnp.cumprod(mp.astype(jnp.int32), axis=0), axis=0)

    # did the forward scan stop on an empty row (vs a value mismatch)?
    # end row >= prefix length <=> the row there is empty or off the end
    end_idx = idx[:, None] + 1 + F
    hit_end = end_idx >= n_cur
    remaining = 1 + F + jnp.where(hit_end, run_d[None, :], 0)

    # B[i] = number of consecutive matching rows at i-1, i-2, ... (current)
    B = [jnp.zeros((4,), dtype=jnp.int32) for _ in range(n)]
    for i in range(1, n):
        B[i] = jnp.where(mc[i - 1], 1 + B[i - 1], 0)
    B = jnp.stack(B)

    hit_start = (jnp.arange(n)[:, None] - B) == 0
    total = remaining + B + jnp.where(hit_start, run_p[None, :], 0)
    return PhaseInfo(duration=total.astype(cur.dtype) * dt_mpc,
                     remaining=remaining)
