"""Centroidal convex MPC, condensed and batched for the MXU.

Re-design of the reference MPC (src/MPC.cpp) with the key structural
change promised in SURVEY.md section 7: instead of the reference's sparse
QP over X = [states(12N); forces(12N)] with 24N dynamics-equality rows
(src/MPC.cpp:74-146), the states are eliminated *analytically*. The SRB
discrete dynamics x_{k+1} = A x_k + B_k f_k + g with A = I + dt*E and E
strictly nilpotent (E^2 = 0, src/MPC.cpp:89-97) give the closed form
A^p = I + p*dt*E, so the stacked state response is

    dx = G f + h,   G[k, j] = A^(k-1-j) B_j  (block lower triangular),

and the QP becomes 12N = 192 variables with only the friction-pyramid and
force-activation rows left:

    min_f 1/2 f' (G'WG + R) f + (G'W h)' f
    s.t.  friction-cone rows per (step, foot)   (src/MPC.cpp:127-146)
          identity rows: swing-foot forces == 0  (src/MPC.cpp:294-297,
          the S_gait mechanism, here expressed as l = u = 0 box rows)
          0 <= fz <= 25                         (src/MPC.cpp:293-297)

This is mathematically exact (the eliminated constraints are equalities)
and shrinks the per-iteration work ~6x while making the constraint matrix
CONSTANT across problems and solves — on TPU the ADMM iteration becomes
two shared-weight matmuls plus one batched K^-1 matvec.

Cost weights, friction coefficient, force bounds, gravity handling and the
24 x N result layout (states relative to xref columns 1..N, then forces)
match src/MPC.cpp:317-391,569-599 exactly. B_k uses the yaw-rotated
inertia and CoM-offset lever arms of the update path
(src/MPC.cpp:439-461). The condensation is cross-validated against an
independent row-by-row reconstruction of the reference's sparse QP in
tests/test_mpc.py::test_condensation_matches_reference_sparse_formulation.

Solver paths, most to least TPU-native:
  * core/mpc_lane + ops/qp_phase — lane-major phase-grouped matrix-free
    prox-ADMM: the production fleet-throughput path (~89k solves/s/chip).
  * solve_mpc_batch_reduced (this module) + ops/qp_pallas — support-
    reduced QP with a fresh per-problem Cholesky every cycle.
  * solve_mpc_batch_pallas (this module) — the full-size fused Pallas
    ADMM kernel with Newton-Schulz warm refactorization.
  * solve_mpc (this module) + ops/qp — per-problem XLA path with full
    OSQP semantics incl. f64: the in-graph controller solver and the
    reference-tolerance oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.ops import qp
from qrw_tpu.ops.rotations import skew


# ----------------------------------------------------------------------
# Constant problem data (host-side, cached per config)
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def cone_matrix(n_steps: int, mu: float) -> np.ndarray:
    """(32N, 12N) constant constraint matrix: 20N friction rows stacked
    over 12N identity (activation) rows. Row order per (step, foot):
    [fx - mu fz; -fx - mu fz; fy - mu fz; -fy - mu fz; -fz]
    (the C pattern of src/MPC.cpp:135-146)."""
    C = np.array([
        [1.0, 0.0, -mu],
        [-1.0, 0.0, -mu],
        [0.0, 1.0, -mu],
        [0.0, -1.0, -mu],
        [0.0, 0.0, -1.0],
    ])
    F = np.zeros((20 * n_steps, 12 * n_steps))
    for k in range(n_steps):
        for i in range(4):
            F[20 * k + 5 * i:20 * k + 5 * i + 5,
              12 * k + 3 * i:12 * k + 3 * i + 3] = C
    return np.vstack([F, np.eye(12 * n_steps)])


def _state_weights(cfg: Config) -> np.ndarray:
    return np.tile(np.asarray(cfg.w_state), cfg.n_steps)


class MPCState(NamedTuple):
    """Warm-start carry, mirroring OSQP's persistent workspace between
    successive osqp_solve calls (src/MPC.cpp:547-556)."""
    f: jnp.ndarray   # (12N,) previous force solution
    y: jnp.ndarray   # (32N,) previous dual


def init_mpc_state(cfg: Config, dtype=jnp.float32) -> MPCState:
    return MPCState(f=jnp.zeros(12 * cfg.n_steps, dtype),
                    y=jnp.zeros(32 * cfg.n_steps, dtype))


class MPCResult(NamedTuple):
    x_f_applied: jnp.ndarray  # (24, N): predicted states then forces
    state: MPCState
    iters: jnp.ndarray
    converged: jnp.ndarray


def gait_from_fsteps(fsteps: jnp.ndarray, n_steps: int) -> jnp.ndarray:
    """(N, 4) contact flags reconstructed from the footstep matrix — zeros
    in the x coordinate mean swing (MPC::construct_gait,
    src/MPC.cpp:686-701)."""
    return (fsteps[:n_steps, 0::3] != 0.0).astype(fsteps.dtype)


def build_qp(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray):
    """Condensed QP data from the planner outputs.

    xref: (12, N+1) reference states (column 0 = current state x0)
    fsteps: (N_gait, 12) footstep plan rows [foot0 xyz, foot1 xyz, ...]
    Returns (H, qlin, l, u, G, h) — G/h recover dx = G f + h.
    """
    import jax
    with jax.default_matmul_precision("highest"):
        return _build_qp(cfg, xref, fsteps)


def _assemble_common(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray):
    """Shared assembly of both QP builders: per-step input blocks Bl,
    free-response blocks hblk, box bounds (l, u), and the lower-triangular
    index helpers (mask, p). Mirrors the B/NK/bounds construction of
    src/MPC.cpp:213-232,293-297,424-461."""
    N = cfg.n_steps
    dt = cfg.dt_mpc
    dtype = xref.dtype
    gait = gait_from_fsteps(fsteps, N)                      # (N, 4)
    gI = jnp.asarray(np.asarray(cfg.gI).reshape(3, 3), dtype)

    # ---- per-step input matrices (only rows 6:12 of B are nonzero) -------
    yaw = xref[5, :N]                                        # (N,)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    Rz = jnp.stack([jnp.stack([c, -s, z], -1),
                    jnp.stack([s, c, z], -1),
                    jnp.stack([z, z, o], -1)], -2)           # (N, 3, 3)
    RgIR = jnp.einsum("kji,jl,klm->kim", Rz, gI, Rz)         # R' gI R
    I_inv = jnp.linalg.inv(RgIR)                             # (N, 3, 3)

    feet = fsteps[:N].reshape(N, 4, 3)                       # (N, 4, 3)
    com = xref[0:3, :N].T + jnp.asarray(
        [0.0, 0.0, cfg.offset_com_z], dtype)                 # (N, 3)
    lever = feet - com[:, None, :]                           # (N, 4, 3)
    # torque rows: dt * I_inv @ skew(lever); force rows: dt/m
    tor = dt * jnp.einsum("kab,kibc->kaic", I_inv, skew(lever))  # (N,3,4,3)
    frc = (dt / cfg.mass) * jnp.tile(jnp.eye(3, dtype=dtype)[:, None, :],
                                     (1, 4, 1))              # (3, 4, 3)
    Bl = jnp.concatenate([jnp.broadcast_to(frc[None], (N, 3, 4, 3)), tor],
                         axis=1).reshape(N, 6, 12)           # (N, 6, 12)

    # ---- lower-triangular helpers (closed-form powers of A) --------------
    kk = jnp.arange(N)
    p = kk[:, None] - kk[None, :]                            # k-j
    mask = (p >= 0).astype(dtype)                            # j <= k

    # ---- h: free response -------------------------------------------------
    gvec = jnp.zeros(12, dtype).at[8].set(-cfg.gravity * dt)
    xj = xref[:, :N].T                                       # (N, 12)
    Axj = xj.at[:, 0:6].add(dt * xj[:, 6:12])                # A xref_j
    r = Axj + gvec[None, :] - xref[:, 1:N + 1].T             # (N, 12)
    rE = jnp.zeros_like(r).at[:, 0:6].set(r[:, 6:12])        # E r_j
    hblk = (mask[:, :, None] * (r[None] + (p.astype(dtype) * dt)[:, :, None]
                                * rE[None])).sum(axis=1)     # (N, 12)

    # ---- bounds ----------------------------------------------------------
    inf = jnp.asarray(np.inf, dtype)
    l_f = jnp.tile(jnp.asarray([-inf, -inf, -inf, -inf, -cfg.fz_max],
                               dtype), 4 * N)
    u_f = jnp.zeros(20 * N, dtype)
    contact = jnp.repeat(gait.reshape(-1), 3)                # (12N,)
    l_b = jnp.where(contact > 0, -inf, 0.0)
    u_b = jnp.where(contact > 0, inf, 0.0)
    l = jnp.concatenate([l_f, l_b])
    u = jnp.concatenate([u_f, u_b])
    return Bl, hblk, l, u, mask, p


def _build_qp(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray):
    N = cfg.n_steps
    dt = cfg.dt_mpc
    dtype = xref.dtype
    Bl, hblk, l, u, mask, p = _assemble_common(cfg, xref, fsteps)

    # ---- G: dx = G f + h -------------------------------------------------
    # row block k holds dx_{k+1} = sum_{j<=k} A^(k-j) (B_j f_j + r_j)
    top = (mask * p.astype(dtype) * dt)[:, :, None, None] * Bl[None]
    bot = mask[:, :, None, None] * jnp.broadcast_to(Bl[None], (N, N, 6, 12))
    Gblk = jnp.concatenate([top, bot], axis=2)               # (N, N, 12, 12)
    G = Gblk.transpose(0, 2, 1, 3).reshape(12 * N, 12 * N)
    h = hblk.reshape(12 * N)

    # ---- cost ------------------------------------------------------------
    W = jnp.asarray(_state_weights(cfg), dtype)              # (12N,)
    GW = G * W[:, None]
    H = G.T @ GW + cfg.w_force * jnp.eye(12 * N, dtype=dtype)
    qlin = GW.T @ h
    return H, qlin, l, u, G, h


@functools.lru_cache(maxsize=8)
def _h_coeffs(n_steps: int):
    """Closed-form coefficient matrices of the structured H build.

    With G[t, j] = mask(t>=j) [ (t-j) dt Bl_j ; Bl_j ] (see _build_qp),
    H[j,l] = dt^2 S2[j,l] Bl_j' Wtop Bl_l + S0[j,l] Bl_j' Wbot Bl_l where
      S0[j,l] = #{t >= max(j,l)} and S2[j,l] = sum_t (t-j)(t-l)."""
    N = n_steps
    j = np.arange(N)
    mx = np.maximum(j[:, None], j[None, :])
    S0 = (N - mx).astype(np.float64)
    t = np.arange(N)
    tj = (t[None, :] - j[:, None])                     # (j, t): t - j
    mask = (t[None, :] >= mx[..., None])               # (j, l, t)
    S2 = np.einsum("jlt,jt,lt->jl", mask, tj, tj)
    return S0, S2


def build_qp_compact(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray):
    """Structured condensed-QP build: identical (H, qlin, l, u) to
    build_qp but ~60x fewer FLOPs — H comes from two (N,6,12)x(N,6,12)
    einsums with closed-form scalar coefficients instead of
    materializing G (192x192) and a dense G'WG product. Returns
    (H, qlin, l, u, Bl, h); recover the state response with
    recover_dx(cfg, Bl, x, h)."""
    import jax
    with jax.default_matmul_precision("highest"):
        N = cfg.n_steps
        dt = cfg.dt_mpc
        dtype = xref.dtype
        Bl, hblk, l, u, mask, p = _assemble_common(cfg, xref, fsteps)

        # ---- H via the closed form -----------------------------------
        w = jnp.asarray(cfg.w_state, dtype)
        wtop, wbot = w[0:6], w[6:12]
        S0, S2 = _h_coeffs(N)
        S0 = jnp.asarray(S0, dtype)
        S2 = jnp.asarray(S2, dtype)
        M1 = jnp.einsum("jai,a,lak->jlik", Bl, wtop, Bl)  # (N,N,12,12)
        M2 = jnp.einsum("jai,a,lak->jlik", Bl, wbot, Bl)
        Hblk = (dt * dt) * S2[:, :, None, None] * M1 \
            + S0[:, :, None, None] * M2
        H = Hblk.transpose(0, 2, 1, 3).reshape(12 * N, 12 * N)
        H = H + cfg.w_force * jnp.eye(12 * N, dtype=dtype)

        # ---- qlin = G' W h --------------------------------------------
        htop_w = wtop[None, :] * hblk[:, 0:6]             # (N, 6)
        hbot_w = wbot[None, :] * hblk[:, 6:12]
        # T1[j] = sum_{t>=j} (t-j) htop_w[t]; T2[j] = sum_{t>=j} hbot_w[t]
        pm = mask.T * p.T.astype(dtype)                   # (j, t): (t-j)+
        T1 = pm @ htop_w                                  # (N, 6)
        T2 = mask.T @ hbot_w
        qlin = jnp.einsum("jai,ja->ji", Bl,
                          dt * T1 + T2).reshape(12 * N)
    return H, qlin, l, u, Bl, hblk.reshape(12 * N)


def recover_dx(cfg: Config, Bl: jnp.ndarray, x: jnp.ndarray,
               h: jnp.ndarray) -> jnp.ndarray:
    """dx = G x + h without materializing G: cumulative sums over the
    block-lower-triangular structure."""
    N = cfg.n_steps
    dt = cfg.dt_mpc
    s = jnp.einsum("jai,ji->ja", Bl, x.reshape(N, 12))    # (N, 6)
    cum = jnp.cumsum(s, axis=0)
    j = jnp.arange(N, dtype=x.dtype)
    cum_js = jnp.cumsum(j[:, None] * s, axis=0)
    top = dt * (j[:, None] * cum - cum_js)                # (N, 6)
    dx = jnp.concatenate([top, cum], axis=1) + h.reshape(N, 12)
    return dx.reshape(12 * N)


def solve_mpc(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray,
              state: Optional[MPCState] = None,
              settings: Optional[qp.QPSettings] = None) -> MPCResult:
    """One MPC solve (MPC::run, src/MPC.cpp:626-650). Batch by vmapping
    over (xref, fsteps, state)."""
    N = cfg.n_steps
    dtype = xref.dtype
    if settings is None:
        settings = qp.QPSettings(
            sigma=cfg.osqp_sigma, alpha=cfg.osqp_alpha, rho=cfg.osqp_rho,
            eps_abs=cfg.osqp_eps_abs, eps_rel=cfg.osqp_eps_rel,
            max_iter=cfg.mpc_max_iter,
            adaptive_rho_interval=cfg.osqp_adaptive_rho_interval,
            adaptive_rho_tolerance=cfg.osqp_adaptive_rho_tolerance)
    H, qlin, l, u, G, h = build_qp(cfg, xref, fsteps)
    A = jnp.asarray(cone_matrix(N, cfg.mu), dtype)
    x0 = state.f if state is not None else None
    y0 = state.y if state is not None else None
    sol = qp.solve(H, qlin, A, l, u, settings, x0=x0, y0=y0,
                   cone=qp.ConeStructure(N, cfg.mu))

    import jax
    with jax.default_matmul_precision("highest"):
        dx = G @ sol.x + h                                   # (12N,)
    states = dx.reshape(N, 12).T + xref[:, 1:N + 1]          # (12, N)
    forces = sol.x.reshape(N, 12).T                          # (12, N)
    x_f = jnp.concatenate([states, forces], axis=0)          # (24, N)
    return MPCResult(x_f_applied=x_f,
                     state=MPCState(f=sol.x, y=sol.y),
                     iters=sol.iters, converged=sol.converged)


# ----------------------------------------------------------------------
# Support-reduced path: eliminate swing-foot force variables
# ----------------------------------------------------------------------

def support_indices(stance_flat: jnp.ndarray, cap: int):
    """Select up to `cap` stance (step, foot) pairs from the flattened
    (4N,) stance mask (step-major). Returns (idx (cap,), valid (cap,)).

    The condensed QP pins every swing-foot force to exactly zero via
    l = u = 0 activation rows (the S_gait mechanism, src/MPC.cpp:293-297)
    — an equality the optimum must satisfy, so deleting those variables
    (and the then-vacuous stance activation rows) is an exact reduction:
    for a trot it shrinks the QP from (n=192, m=512) to (n=96, m=160)
    and leaves a constraint matrix with NO equality rows (uniform OSQP
    rho class, ~1e3 better conditioning). Stable argsort keeps stance
    pairs in (step, foot) order; when fewer than cap pairs are in stance
    the tail indices point at swing pairs and are masked by `valid`."""
    order = jnp.argsort(jnp.where(stance_flat, 0, 1), stable=True)
    idx = order[:cap]
    return idx, stance_flat[idx]


def build_qp_reduced(cfg: Config, xref: jnp.ndarray, fsteps: jnp.ndarray,
                     cap: int):
    """Support-reduced condensed QP, built directly at the stance pairs
    (never materializing the (12N)^2 H): H_r (3cap, 3cap), q_r (3cap),
    plus (Bl, h, idx, valid) to scatter back / recover states.
    Identical to gathering build_qp_compact's output at the stance
    variables (tests/test_mpc.py asserts this)."""
    import jax
    with jax.default_matmul_precision("highest"):
        N = cfg.n_steps
        dt = cfg.dt_mpc
        dtype = xref.dtype
        Bl, hblk, _, _, mask, p = _assemble_common(cfg, xref, fsteps)
        gait = gait_from_fsteps(fsteps, N)                  # (N, 4)
        idx, valid = support_indices(gait.reshape(4 * N) > 0, cap)
        step = idx // 4
        foot = idx % 4
        # per-pair force-input blocks: columns of Bl for this foot
        BlS = Bl[step].reshape(cap, 6, 4, 3)[
            jnp.arange(cap), :, foot, :]                    # (cap, 6, 3)

        w = jnp.asarray(cfg.w_state, dtype)
        wtop, wbot = w[0:6], w[6:12]
        S0, S2 = _h_coeffs(N)
        S0g = jnp.asarray(S0, dtype)[step][:, step]         # (cap, cap)
        S2g = jnp.asarray(S2, dtype)[step][:, step]
        M1 = jnp.einsum("sai,a,tak->stik", BlS, wtop, BlS)  # (cap,cap,3,3)
        M2 = jnp.einsum("sai,a,tak->stik", BlS, wbot, BlS)
        Hblk = (dt * dt) * S2g[:, :, None, None] * M1 \
            + S0g[:, :, None, None] * M2
        H_r = Hblk.transpose(0, 2, 1, 3).reshape(3 * cap, 3 * cap)
        vm3 = jnp.repeat(valid.astype(dtype), 3)            # (3cap,)
        di = np.arange(3 * cap)
        H_r = H_r * vm3[:, None] * vm3[None, :]
        H_r = H_r.at[di, di].add(cfg.w_force * vm3 + (1.0 - vm3))

        htop_w = wtop[None, :] * hblk[:, 0:6]               # (N, 6)
        hbot_w = wbot[None, :] * hblk[:, 6:12]
        pm = mask.T * p.T.astype(dtype)                     # (j, t): (t-j)+
        g = (dt * (pm @ htop_w) + mask.T @ hbot_w)[step]    # (cap, 6)
        q_r = jnp.einsum("sai,sa->si", BlS, g).reshape(3 * cap) * vm3
    return H_r, q_r, Bl, hblk.reshape(12 * N), idx, valid


class MPCWarmState(NamedTuple):
    """Warm-start carry of the support-reduced batched MPC, in the FULL
    (un-reduced) layout so it stays valid across stance-set changes:
    forces (B, 12N), cone-row duals (B, 20N), adapted rho (B, 1). The
    reduced path re-gathers at the current stance set every cycle; no
    factorization state is carried — the reduced problem is small enough
    to Cholesky-refactor every call (the whole NS/stale machinery of
    MPCBatchState is unnecessary here)."""
    f: jnp.ndarray
    y: jnp.ndarray
    rho: jnp.ndarray


def init_warm_state(cfg: Config, batch: int,
                    dtype=jnp.float32) -> MPCWarmState:
    N = cfg.n_steps
    return MPCWarmState(f=jnp.zeros((batch, 12 * N), dtype),
                        y=jnp.zeros((batch, 20 * N), dtype),
                        rho=jnp.full((batch, 1), 0.1, dtype))


def shift_warm_state_reduced(state: MPCWarmState,
                             n_steps: int) -> MPCWarmState:
    """Advance the full-layout warm carry one MPC step (gait roll)."""
    return state._replace(f=jnp.roll(state.f, -12, axis=1),
                          y=jnp.roll(state.y, -20, axis=1))


def solve_mpc_batch_reduced(cfg: Config, xrefs: jnp.ndarray,
                            fsteps: jnp.ndarray,
                            state: Optional[MPCWarmState] = None,
                            settings: Optional["qp.QPSettings"] = None,
                            schedule=None, tile: int = 64,
                            shift: bool = False, cap: int = None,
                            interpret: bool = False,
                            early_exit: bool = False):
    """Batched MPC solve on the SUPPORT-REDUCED QP (swing-force
    variables eliminated — see support_indices) via the fused Pallas
    ADMM kernel. The production throughput path.

    xrefs (B, 12, N+1); fsteps (B, N_gait, 12). cap = stance-pair
    capacity (static): 2N for a trot, 3N for a walk, 4N degenerates to
    the full problem. Problems whose stance count exceeds cap are
    flagged (sol_ok False) — route those to solve_mpc_batch_pallas.
    Every call re-runs Ruiz and a fresh batched Cholesky (cheap at
    n=3cap); the only carry is (f, y, rho) in full layout. shift=True
    advances the carry one MPC step first (50 Hz rolling-gait cadence).
    Returns (x_f_applied (B, 24, N), new_state, sol, ok (B,))."""
    import jax
    from qrw_tpu.ops import qp_pallas
    N = cfg.n_steps
    if cap is None:
        cap = 2 * N
    dtype = jnp.float32
    if settings is None:
        settings = qp.QPSettings(
            sigma=cfg.osqp_sigma, alpha=cfg.osqp_alpha, rho=cfg.osqp_rho,
            eps_abs=1e-4, eps_rel=1e-4, max_iter=cfg.mpc_max_iter,
            adaptive_rho_interval=cfg.osqp_adaptive_rho_interval,
            adaptive_rho_tolerance=cfg.osqp_adaptive_rho_tolerance)
    H_r, q_r, Bl, h, idx, valid = jax.vmap(
        lambda x, f: build_qp_reduced(cfg, x.astype(dtype),
                                      f.astype(dtype), cap)
    )(xrefs, fsteps)
    B = H_r.shape[0]
    vidx = (3 * idx[:, :, None]
            + jnp.arange(3)[None, None, :]).reshape(B, 3 * cap)
    ridx = (5 * idx[:, :, None]
            + jnp.arange(5)[None, None, :]).reshape(B, 5 * cap)
    vm3 = jnp.repeat(valid.astype(dtype), 3, axis=1)
    rm5 = jnp.repeat(valid.astype(dtype), 5, axis=1)
    gait = jax.vmap(lambda f: gait_from_fsteps(f, N))(fsteps)
    ok = gait.reshape(B, -1).sum(axis=1) <= cap

    cone = qp.ReducedConeStructure(cap, cfg.mu)
    A_r = jnp.asarray(cone.matrix(), dtype)
    l_r = jnp.broadcast_to(jnp.asarray(
        np.tile([-np.inf, -np.inf, -np.inf, -np.inf, -cfg.fz_max], cap),
        dtype), (B, 5 * cap))
    u_r = jnp.zeros((B, 5 * cap), dtype)

    kw = {}
    if state is not None:
        if shift:
            state = shift_warm_state_reduced(state, N)
        kw = dict(x0=jnp.take_along_axis(state.f, vidx, 1) * vm3,
                  y0=jnp.take_along_axis(state.y, ridx, 1) * rm5,
                  rho_init=state.rho)
        if schedule is None:
            schedule = [50]
    sol = qp_pallas.solve(H_r, q_r, A_r, l_r, u_r, settings, tile=tile,
                          schedule=schedule, cone=cone,
                          interpret=interpret, early_exit=early_exit,
                          **kw)

    x_m = sol.x * vm3
    zeros_f = jnp.zeros((B, 12 * N), dtype)
    f_full = jax.vmap(lambda z, vi, xr: z.at[vi].set(xr))(
        zeros_f, vidx, x_m)
    zeros_y = jnp.zeros((B, 20 * N), dtype)
    y_full = jax.vmap(lambda z, ri, yr: z.at[ri].set(yr))(
        zeros_y, ridx, sol.y * rm5)

    dx = jax.vmap(lambda b, x, hh: recover_dx(cfg, b, x, hh))(Bl, f_full,
                                                              h)
    states = (dx.reshape(B, N, 12).transpose(0, 2, 1)
              + xrefs[:, :, 1:N + 1].astype(dtype))
    forces = f_full.reshape(B, N, 12).transpose(0, 2, 1)
    x_f = jnp.concatenate([states, forces], axis=1)          # (B, 24, N)
    new_state = MPCWarmState(f=f_full, y=y_full, rho=sol.rho)
    return x_f, new_state, sol, ok


class MPCBatchState(NamedTuple):
    """Warm-start carry of the batched Pallas MPC: previous primal/dual,
    adapted rho, the reusable Ruiz preconditioner, and the last K^-1
    (seed for the Newton-Schulz warm refactorization). OSQP keeps all of
    these in its persistent workspace between osqp_solve calls
    (src/MPC.cpp:547-556)."""
    f: jnp.ndarray            # (B, 12N)
    y: jnp.ndarray            # (B, 32N)
    rho: jnp.ndarray          # (B, 1)
    D: jnp.ndarray            # (B, 12N)
    E: jnp.ndarray            # (B, 32N)
    c: jnp.ndarray            # (B, 1)
    kinv: jnp.ndarray         # (B, 12N, 12N)
    kinv_rho: jnp.ndarray     # (B, 1)


def shift_warm_state(state: MPCBatchState, n_steps: int) -> MPCBatchState:
    """Advance the warm-start carry by one MPC step for the production
    rolling-gait pattern: the gait window shifts one row per 50 Hz cycle,
    so the previous cycle's step-k solution is this cycle's step-(k-1).
    Rolls the primal (12/step), the dual (20 cone + 12 activation rows
    per step) and K^-1's step blocks so the Newton-Schulz warm
    refactorization and the ADMM warm start stay aligned with the
    problem. (The reference gets the same effect implicitly: OSQP's
    persistent workspace warm start plus the wrapper's stale-plan roll,
    scripts/MPC_Wrapper.py:89-103.)"""
    mc = 20 * n_steps
    y_cone = jnp.roll(state.y[:, :mc], -20, axis=1)
    y_id = jnp.roll(state.y[:, mc:], -12, axis=1)
    return state._replace(
        f=jnp.roll(state.f, -12, axis=1),
        y=jnp.concatenate([y_cone, y_id], axis=1),
        kinv=jnp.roll(jnp.roll(state.kinv, -12, axis=1), -12, axis=2),
    )


def solve_mpc_batch_pallas(cfg: Config, xrefs: jnp.ndarray,
                           fsteps: jnp.ndarray,
                           state: Optional[MPCBatchState] = None,
                           settings: Optional["qp.QPSettings"] = None,
                           schedule=None, tile: int = 16,
                           shift: bool = False, refactor: str = None,
                           interpret: bool = False):
    """Batched MPC solve on the fused Pallas ADMM kernel (ops/qp_pallas).

    xrefs (B, 12, N+1); fsteps (B, N_gait, 12). Cold call (state=None)
    runs Ruiz + the rho-adaptation schedule; warm calls reuse the
    preconditioner and adapted rho and default to a single short round.
    shift=True advances the warm carry by one MPC step first (use when
    the gait window rolled since the previous call — the 50 Hz
    controller cadence). refactor selects the K^-1 policy for warm calls
    (see ops/qp_pallas.solve): defaults to "chol" when the problem
    structure moved (shift) and "stale" (reuse + in-kernel iterative
    refinement) otherwise — callers should force "chol" every ~10 cycles
    to refresh the preconditioner. Returns (x_f_applied, new_state,
    result).
    """
    import jax
    from qrw_tpu.ops import qp_pallas
    N = cfg.n_steps
    dtype = jnp.float32
    if settings is None:
        settings = qp.QPSettings(
            sigma=cfg.osqp_sigma, alpha=cfg.osqp_alpha, rho=cfg.osqp_rho,
            eps_abs=1e-4, eps_rel=1e-4, max_iter=cfg.mpc_max_iter,
            adaptive_rho_interval=cfg.osqp_adaptive_rho_interval,
            adaptive_rho_tolerance=cfg.osqp_adaptive_rho_tolerance)
    H, qlin, l, u, Bl, h = jax.vmap(
        lambda x, f: build_qp_compact(cfg, x.astype(dtype),
                                      f.astype(dtype))
    )(xrefs, fsteps)
    A = jnp.asarray(cone_matrix(N, cfg.mu), dtype)
    cone = qp.ConeStructure(N, cfg.mu)
    kw = {}
    if state is not None:
        if shift:
            state = shift_warm_state(state, N)
        if refactor is None:
            refactor = "chol" if shift else "stale"
        kw = dict(x0=state.f, y0=state.y, rho_init=state.rho,
                  precond=(state.D, state.E, state.c),
                  kinv_init=state.kinv, kinv_rho=state.kinv_rho,
                  refactor=refactor)
        if schedule is None:
            schedule = [100]
    sol = qp_pallas.solve(H, qlin, A, l, u, settings, tile=tile,
                          schedule=schedule, cone=cone,
                          interpret=interpret, **kw)
    dx = jax.vmap(lambda b, x, hh: recover_dx(cfg, b, x, hh))(Bl, sol.x,
                                                              h)
    states = (dx.reshape(-1, N, 12).transpose(0, 2, 1)
              + xrefs[:, :, 1:N + 1])
    forces = sol.x.reshape(-1, N, 12).transpose(0, 2, 1)
    x_f = jnp.concatenate([states, forces], axis=1)          # (B, 24, N)
    D, E, c = sol.precond
    new_state = MPCBatchState(f=sol.x, y=sol.y, rho=sol.rho,
                              D=D, E=E, c=c, kinv=sol.kinv,
                              kinv_rho=sol.kinv_rho)
    return x_f, new_state, sol
