"""Lane-major (batch-on-lanes) MPC pipeline around ops/qp_phase.

The production throughput path for scenario fleets. Everything here is
the same physics as core/mpc.py (condensed centroidal MPC of
src/MPC.cpp, support-reduced), re-laid-out so the batch dimension lives
on the TPU lane axis: every per-problem quantity is a (..., B) array,
every batched op is elementwise over lanes, and every contraction is
against a SHARED constant matrix. vmap-of-small-ops (batch-major) runs
at <1% of VPU/MXU peak on these shapes; this layout measures >20x
faster end to end.

The batch must be PHASE-SORTED: problems arranged as (P phases, C per
phase), C a multiple of the kernel tile, every problem in a phase
sharing the same stance support. The per-phase slot maps and shared
proximal metrics come from build_phase_data.

Phase-set coverage:
  * gait_phase_fsteps builds the cyclic class set of any steady gait
    (trot/walk/pacing/bounding/static, src/Gait.cpp:38-108); one gait
    roll maps class p to (p-1) mod P, which is what the fleet rollout
    (sim/fleet.py) rotates in-graph.
  * transition_phase_fsteps enumerates the mixed windows of a gait
    switch (src/Gait.cpp:197-219); these have no cyclic arithmetic —
    match them by support offline (eval/parity_320) or let the support
    guard + rescue stage serve them in the loop.
  * Anything outside the provided set (unmodeled supports, switch
    windows in a fleet run) is caught by the support guard, re-solved
    by the capacity-bounded rescue stage when enabled, and otherwise
    ships the stale plan with a cold-restart carry — so coverage gaps
    degrade to the reference's own staleness contract, never to wrong
    forces.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.ops import qp, qp_phase

f32 = jnp.float32


# ----------------------------------------------------------------------
# Lane-major problem assembly (same math as mpc._assemble_common)
# ----------------------------------------------------------------------

def _inv3(M):
    """Closed-form inverse of (..., 3, 3, B) SPD blocks, elementwise."""
    a, b, c = M[..., 0, 0, :], M[..., 0, 1, :], M[..., 0, 2, :]
    d, e, f = M[..., 1, 0, :], M[..., 1, 1, :], M[..., 1, 2, :]
    g, h, i = M[..., 2, 0, :], M[..., 2, 1, :], M[..., 2, 2, :]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    row0 = jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-2)
    row1 = jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-2)
    row2 = jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-2)
    return jnp.stack([row0, row1, row2], axis=-3) * inv_det[..., None,
                                                           None, :]


def assemble_lane(cfg: Config, xrefs, fsteps):
    """Per-step input blocks and free response, lane-major.

    xrefs (12, N+1, B); fsteps (N_gait, 12, B). Returns
    Bl (N, 6, 12, B), hblk (N, 12, B), gait (N, 4, B). Mirrors
    mpc._assemble_common (src/MPC.cpp:213-232,424-461) with the batch
    on lanes throughout.
    """
    N = cfg.n_steps
    dt = cfg.dt_mpc
    dtype = xrefs.dtype
    B = xrefs.shape[-1]
    gait = (fsteps[:N, 0::3, :] != 0.0).astype(dtype)      # (N, 4, B)
    gI = np.asarray(cfg.gI, np.float64).reshape(3, 3).astype(np.float32)

    yaw = xrefs[5, :N, :]                                   # (N, B)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    Rz = jnp.stack([jnp.stack([c, -s, z], 1),
                    jnp.stack([s, c, z], 1),
                    jnp.stack([z, z, o], 1)], 1)            # (N, 3, 3, B)
    # (Rz' gI Rz)^-1 = Rz' gI^-1 Rz (Rz orthogonal): no batched 3x3
    # inverse needed at all
    gI_inv = np.linalg.inv(np.asarray(cfg.gI, np.float64)
                           .reshape(3, 3)).astype(np.float32)
    I_inv = jnp.einsum("nijb,ik,nklb->njlb", Rz, gI_inv, Rz)

    feet = fsteps[:N].reshape(N, 4, 3, B)
    com = xrefs[0:3, :N, :].transpose(1, 0, 2) + jnp.asarray(
        [0.0, 0.0, cfg.offset_com_z], dtype)[None, :, None]  # (N, 3, B)
    lever = feet - com[:, None, :, :]                       # (N, 4, 3, B)
    lx, ly, lz = lever[:, :, 0], lever[:, :, 1], lever[:, :, 2]
    zz = jnp.zeros_like(lx)
    sk = jnp.stack([jnp.stack([zz, -lz, ly], 2),
                    jnp.stack([lz, zz, -lx], 2),
                    jnp.stack([-ly, lx, zz], 2)], 2)        # (N, 4, 3, 3, B)
    tor = dt * jnp.einsum("naib,nfijb->nafjb", I_inv, sk)   # (N, 3, 4, 3, B)
    tor = tor.reshape(N, 3, 12, B)
    frc = (dt / cfg.mass) * np.tile(np.eye(3, dtype=np.float32)[:, None, :],
                                    (1, 4, 1)).reshape(3, 12)
    frc = jnp.broadcast_to(jnp.asarray(frc, dtype)[None, :, :, None],
                           (N, 3, 12, B))
    Bl = jnp.concatenate([frc, tor], axis=1)                # (N, 6, 12, B)

    # free response hblk[k] = sum_{j<=k} A^(k-j) r_j (mpc._assemble_common)
    gvec = np.zeros(12, np.float32)
    gvec[8] = -cfg.gravity * dt
    xj = xrefs[:, :N, :]                                    # (12, N, B)
    Axj = xj.at[0:6].add(dt * xj[6:12])
    r = (Axj + jnp.asarray(gvec, dtype)[:, None, None]
         - xrefs[:, 1:N + 1, :]).transpose(1, 0, 2)         # (N, 12, B)
    L, P2 = qp_phase.time_coupling(N)
    rE = r[:, 6:12, :]                                      # E r_j
    top = jnp.einsum("kj,jab->kab", L, r[:, 0:6, :]) \
        + dt * jnp.einsum("kj,jab->kab", P2, rE)
    bot = jnp.einsum("kj,jab->kab", L, rE)
    hblk = jnp.concatenate([top, bot], axis=1)              # (N, 12, B)
    return Bl, hblk, gait


# ----------------------------------------------------------------------
# Phase structure (host-built, static)
# ----------------------------------------------------------------------

class PhaseStructure(NamedTuple):
    """Static per-phase slot maps + the solver data. P phases, cap
    slots (stance capacity), all numpy except the solver inputs."""
    data: qp_phase.PhaseQPData
    onehot2: np.ndarray     # (P, cap, 4N) slot -> (step, foot) one-hot
    supports: np.ndarray    # (P, 4N) bool stance masks
    cap: int
    c_scale: float


NOMINAL_XY = np.array([[0.195, 0.195, -0.195, -0.195],
                       [0.147, -0.147, 0.147, -0.147]])


def _support_to_fsteps(cfg: Config, support: np.ndarray) -> np.ndarray:
    """(N_gait, 12) nominal footstep matrix from an (N, 4) 0/1 support:
    stance feet at the nominal shoulder footholds, swing feet zeroed
    (the MPC's swing marker, src/MPC.cpp:686-701)."""
    N = cfg.n_steps
    out = np.zeros((cfg.N_gait, 12), np.float32)
    for i in range(N):
        for j in range(4):
            if support[i, j]:
                out[i, 3 * j:3 * j + 2] = NOMINAL_XY[:, j]
    return out


def gait_phase_fsteps(cfg: Config, kind: str = "trot") -> np.ndarray:
    """(P, N_gait, 12) nominal footstep matrices for gait `kind`, one
    per distinct gait offset — the cyclic phase-class set of a steady
    gait (src/Gait.cpp:38-108 defines the patterns). Convention: phase
    p's window row i is pattern row (i - p) mod period, so one gait
    roll advances phase p to (p - 1) mod P (core/mpc_lane
    shift_lane_state direction). P is the fundamental period of the
    support sequence (1 for static, n_steps for the walking gaits at
    the default T_gait)."""
    from qrw_tpu.core import gait as gait_mod
    N = cfg.n_steps
    pat = np.asarray(gait_mod._pattern(cfg, kind))
    n_rows = int(np.sum(np.any(pat != 0, axis=1)))
    sups = []
    for p in range(n_rows):
        idx = (np.arange(N) - p) % n_rows
        sups.append(pat[idx] != 0)
    # fundamental period (static: 1; sub-periodic patterns collapse)
    P = n_rows
    for q in range(1, n_rows):
        if all((sups[p] == sups[(p + q) % n_rows]).all()
               for p in range(n_rows)):
            P = q
            break
    return np.stack([_support_to_fsteps(cfg, sups[p])
                     for p in range(P)])


def transition_phase_fsteps(cfg: Config, kind_a: str,
                            kind_b: str) -> np.ndarray:
    """(P, N_gait, 12) MIXED support windows occurring while a gait
    switch rolls gait A out of the window and gait B in
    (src/Gait.cpp:197-219 changeGait + rollGait): t rolls after the
    switch from A-phase p, rows 0..N-t-1 still hold A and rows N-t..N-1
    hold B's prefix. Enumerates every (p, t in 1..N-1) window, deduped.
    These classes have NO cyclic phase arithmetic — match them by
    support (eval/parity_320) or rely on the support guard + rescue
    fallback in the fleet loop."""
    from qrw_tpu.core import gait as gait_mod
    N = cfg.n_steps
    pat_a = np.asarray(gait_mod._pattern(cfg, kind_a))
    pat_b = np.asarray(gait_mod._pattern(cfg, kind_b))
    na = int(np.sum(np.any(pat_a != 0, axis=1)))
    nb = int(np.sum(np.any(pat_b != 0, axis=1)))
    seen = set()
    sups = []
    for p in range(na):
        for t in range(1, N):
            win = np.zeros((N, 4), bool)
            for i in range(N):
                if i < N - t:
                    win[i] = pat_a[(i + t - p) % na] != 0
                else:
                    win[i] = pat_b[(i - (N - t)) % nb] != 0
            key = win.tobytes()
            if key not in seen:
                seen.add(key)
                sups.append(win)
    return np.stack([_support_to_fsteps(cfg, s) for s in sups])


def calibrate_phase_fsteps(cfg: Config, phase_fs: np.ndarray,
                           fsteps_captured: np.ndarray) -> np.ndarray:
    """Re-center each phase class's nominal footholds on the MEAN
    captured foothold of the cycles matching that class.

    The shared proximal metric Kbar is built from the class's nominal
    foothold geometry; convergence needs the actual problems' lever
    arms to stay within the metric margin. For a trot the planner's
    footholds sit within a few cm of the shoulder nominals and the
    default margin covers them, but gaits with large lateral dynamics
    (pacing rocks the base, displacing touchdowns up to ~16 cm) leave
    the margin and the shared-metric stage converges at only ~25%.
    Calibrating the metric to the operating distribution (one shakedown
    capture) restores ~98% convergence at the same budget — measured on
    a velID=2 pacing capture. Classes with no matching captured cycle
    keep their nominal values."""
    N = cfg.n_steps
    phase_fs = np.asarray(phase_fs)
    P = phase_fs.shape[0]
    fsteps_captured = np.asarray(fsteps_captured)
    sups = (phase_fs[:, :N, 0::3] != 0).reshape(P, -1)
    cap_sup = (fsteps_captured[:, :N, 0::3] != 0) \
        .reshape(fsteps_captured.shape[0], -1)
    out = np.array(phase_fs, np.float32, copy=True)
    for p in range(P):
        sel = (cap_sup == sups[p]).all(axis=1)
        if sel.any():
            avg = fsteps_captured[sel].mean(axis=0)
            m = np.zeros(phase_fs.shape[1:], bool)
            m[:N] = np.repeat(sups[p].reshape(N, 4), 3, axis=1)
            out[p] = np.where(m, avg, 0.0).astype(np.float32)
    return out


def union_phase_fsteps(cfg: Config, sets) -> np.ndarray:
    """Concatenate phase-class sets (deduped by support) into one
    (P, N_gait, 12) array for a shared PhaseStructure — e.g. trot +
    pacing + their transition windows for a switching capture."""
    N = cfg.n_steps
    seen = set()
    out = []
    for s in sets:
        for fs in np.asarray(s):
            key = (fs[:N, 0::3] != 0).tobytes()
            if key not in seen:
                seen.add(key)
                out.append(fs)
    return np.stack(out)


def trot_phase_fsteps(cfg: Config, foothold=None) -> np.ndarray:
    """(P=N, N_gait, 12) nominal trot footstep matrices, one per gait
    offset (the bench/production steady-trot phase classes)."""
    N = cfg.n_steps
    half = N // 2
    if foothold is None:
        pair1 = np.array([0.195, 0.147, 0., 0., 0., 0.,
                          0., 0., 0., -0.195, -0.147, 0.])
        pair2 = np.array([0., 0., 0., 0.195, -0.147, 0.,
                          -0.195, 0.147, 0., 0., 0., 0.])
    else:
        pair1, pair2 = foothold
    out = np.zeros((N, cfg.N_gait, 12), np.float32)
    for p in range(N):
        for i in range(N):
            out[p, i] = (pair1 if ((i + (half - p)) // half) % 2 == 0
                         else pair2)
    return out


def build_phase_data(cfg: Config, phase_fsteps: np.ndarray,
                     rho: float = 0.015, margin: float = 1.5,
                     diag_margin: float = 0.0, sigma: float = 1e-6,
                     alpha: float = 1.0, cap: int = None,
                     nominal_vx: float = 0.5) -> PhaseStructure:
    """Shared solver data for a set of support phases.

    phase_fsteps (P, N_gait, 12): one nominal footstep matrix per phase
    (feet positions used both for the support pattern and the nominal
    metric H). The proximal metric
        Kbar_p = margin*c*Hbar_p + diag_margin*c*I + sigma I + rho A'A
    is inverted once in f64 on the host. The MULTIPLICATIVE margin
    covers relative H deviations (yaw, lever scaling). diag_margin adds
    ABSOLUTE slack for the near-null directions of G'WG (floor w_force
    ~5e-5), where com shifts of a few cm can make the prox metric
    indefinite and ~2% of random problems diverge (bounded by the
    safeguard box, stale-plan fallback + cold-restart carry in
    solve_mpc_batch_phase). It defaults to 0 because ANY diagonal slack
    measurably slows the dual-residual tail (0.02 halves the converged
    fraction at a 300-iteration budget); revisit only if the diverged
    fraction matters more than throughput for a workload.
    """
    from qrw_tpu.core import mpc as mpc_mod

    N = cfg.n_steps
    P = phase_fsteps.shape[0]
    if cap is None:
        # stance-pair capacity: cover the largest support in the set,
        # rounded up to a multiple of 8 so n = 3*cap stays sublane-
        # aligned (trot/pacing/bounding -> 2N; walk -> 3N; static /
        # mixed windows with 4-stance rows -> up to 4N)
        max_stance = int((np.asarray(phase_fsteps)[:, :N, 0::3] != 0)
                         .reshape(P, -1).sum(axis=1).max())
        cap = max(2 * N, -(-max_stance // 8) * 8)
    n = 3 * cap

    cone = qp.ReducedConeStructure(cap, cfg.mu)
    A = cone.matrix().astype(np.float32)                    # (5cap, 3cap)
    l = np.tile([-np.inf, -np.inf, -np.inf, -np.inf, -cfg.fz_max],
                cap).astype(np.float32)
    u = np.zeros(5 * cap, np.float32)
    L, P2 = qp_phase.time_coupling(N)

    onehot = np.zeros((P, N, cap), np.float32)
    onehot2 = np.zeros((P, cap, 4 * N), np.float32)
    supports = np.zeros((P, 4 * N), bool)
    Kbar_inv = np.zeros((P, n, n), np.float32)
    G1 = np.zeros((P, cap, cap), np.float32)
    G2 = np.zeros((P, cap, cap), np.float32)
    P2tP2 = (P2.astype(np.float64).T @ P2).astype(np.float64)
    LtL = (L.astype(np.float64).T @ L).astype(np.float64)

    # nominal moving xref for the metric + the shared cost scaling
    xr0 = np.zeros((12, N + 1), np.float32)
    xr0[2, :] = cfg.h_ref
    xr0[6, 1:] = nominal_vx

    c_scale = None
    for p in range(P):
        fs = phase_fsteps[p]
        stance = (fs[:N, 0::3] != 0).reshape(-1)
        ns = int(stance.sum())
        assert ns <= cap, f"phase {p}: {ns} stance pairs > cap {cap}"
        supports[p] = stance
        pairs = np.where(stance)[0]
        for s_i, kf in enumerate(pairs):
            onehot2[p, s_i, kf] = 1.0
            onehot[p, kf // 4, s_i] = 1.0
        # nominal reduced H for the metric (f32 build, f64 inverse)
        Hr, qr, *_ = mpc_mod.build_qp_reduced(
            cfg, jnp.asarray(xr0), jnp.asarray(fs, jnp.float32), cap)
        Hr = np.asarray(Hr, np.float64)
        if c_scale is None:
            D, E, cc = qp.ruiz_equilibrate(
                jnp.asarray(Hr, jnp.float32)[None],
                jnp.asarray(np.asarray(qr), jnp.float32)[None],
                jnp.asarray(A), 10)
            c_scale = float(np.asarray(cc)[0, 0])
        Kbar = (margin * c_scale * Hr
                + (sigma + diag_margin * c_scale) * np.eye(n)
                + rho * (A.astype(np.float64).T @ A))
        Kbar_inv[p] = np.linalg.inv(Kbar).astype(np.float32)
        ohp = onehot[p].astype(np.float64)           # (N, cap)
        G1[p] = (ohp.T @ P2tP2 @ ohp).astype(np.float32)
        G2[p] = (ohp.T @ LtL @ ohp).astype(np.float32)

    w = np.asarray(cfg.w_state, np.float32) * c_scale
    data = qp_phase.PhaseQPData(
        A=A, Kbar_inv=jnp.asarray(Kbar_inv), onehot=jnp.asarray(onehot),
        L=L, P2=P2, l=l, u=u,
        wtop=w[0:6], wbot=w[6:12],
        w_force=float(cfg.w_force * c_scale), dt=float(cfg.dt_mpc),
        rho=float(rho), sigma=float(sigma), alpha=float(alpha),
        c_scale=float(c_scale),
        G1=jnp.asarray(G1), G2=jnp.asarray(G2), mu=float(cfg.mu),
        dt_m=float(cfg.dt_mpc / cfg.mass))
    return PhaseStructure(data=data, onehot2=onehot2, supports=supports,
                          cap=cap, c_scale=c_scale)


# ----------------------------------------------------------------------
# Batched solve
# ----------------------------------------------------------------------

class MPCLaneState(NamedTuple):
    """Warm carry in the full (step, foot) layout, lane-major: robust
    to support changes across cycles (the next cycle re-extracts at its
    own phase maps). rrho is the RESCUE stage's adapted per-lane rho
    (osqp keeps its workspace rho between solves): lanes that need the
    per-problem rescue every cycle re-enter it at their adapted rho and
    re-converge in the first (early-exit) round instead of re-running
    the whole adaptation ladder from 0.1."""
    f: jnp.ndarray          # (4N, 3, B) forces
    y: jnp.ndarray          # (4N, 5, B) cone-row duals
    rrho: Optional[jnp.ndarray] = None   # (B,) rescue rho carry


def init_lane_state(cfg: Config, batch: int) -> MPCLaneState:
    N4 = 4 * cfg.n_steps
    return MPCLaneState(f=jnp.zeros((N4, 3, batch), f32),
                        y=jnp.zeros((N4, 5, batch), f32),
                        rrho=jnp.full((batch,), 0.1, f32))


def shift_lane_state(state: MPCLaneState, n_steps: int) -> MPCLaneState:
    """Advance one MPC step (gait roll): shift the (step, foot) axis
    and ZERO the appended terminal step. Wrapping the old step-0 values
    into the new terminal step (tempting for a period-N gait, where the
    supports coincide) poisons the warm start: the old current-step
    force is the largest, most-constrained value in the plan and a bad
    guess for the least-determined terminal step — measured on the
    rolled 50 Hz cadence it costs ~20 points of warm convergence
    (0.78 wrapped vs 0.97 zeroed at a 300-iteration budget)."""
    def roll(a):
        r = jnp.roll(a.reshape(n_steps, 4, *a.shape[1:]), -1, axis=0)
        return r.at[-1].set(0.0).reshape(a.shape)
    return MPCLaneState(f=roll(state.f), y=roll(state.y),
                        rrho=state.rrho)


def _is_static_phases(phases_of) -> bool:
    return isinstance(phases_of, (np.ndarray, list, tuple)) or \
        np.isscalar(phases_of)


def _gather_by_phase(arr_np, phases_of):
    """arr[phases_of] for host numpy phases (static indexing) or traced
    jnp phases (in-graph gather)."""
    if _is_static_phases(phases_of):
        return jnp.asarray(np.asarray(arr_np)[np.asarray(phases_of)])
    return jnp.asarray(arr_np)[jnp.asarray(phases_of, jnp.int32)]


def _tile_oh2(ps: PhaseStructure, phases_of, tile: int):
    """(n_tiles, cap, 4N) per-tile slot maps."""
    return _gather_by_phase(ps.onehot2, phases_of)


def _rescue_failed_lanes(cfg: Config, xrefs, fsteps, f_full, y_full,
                         sol, rescue_cap: int, rescue_settings,
                         interpret: bool, c_scale: float = 1.0,
                         qp_cap: int = None, warm_state=None):
    """Second-stage rescue: re-solve up to rescue_cap failed lanes
    through the per-problem support-reduced Cholesky path. Returns the
    patched (f_full, y_full, sol) with rescued lanes marked converged.

    The rescue batch is gathered batch-major (the reduced path's native
    layout). When `warm_state` (the SHIFTED lane carry) is given, the
    rescue warm-starts each lane from its stale rolled plan and the
    solver's cross-round early exit makes first-round convergence pay
    for 50 iterations only — zero-carry lanes (cold restart after
    repeated failures) still get the full schedule, preserving the
    cold-rescue contract at a fraction of the old always-450-iteration
    cost. Lanes are selected by a stable argsort on the failure mask,
    so with fewer failures than capacity the tail slots re-solve
    already-converged lanes and are masked out of the patch."""
    import jax
    from qrw_tpu.core import mpc as mpc_mod
    N = cfg.n_steps
    B = xrefs.shape[-1]
    R = min(rescue_cap, B)
    if rescue_settings is None:
        rescue_settings = qp.QPSettings(
            eps_abs=1e-4, eps_rel=1e-4, max_iter=450,
            adaptive_rho_interval=200, scaling_iters=4)
    bad = ~sol.converged

    def do_rescue(args):
        f_full, y_full = args
        if warm_state is not None:
            # failed lanes WITH a live stale carry first (they warm-
            # start and clear in the first round), cold-restart lanes
            # second, already-converged padding last
            has_carry = jnp.any(
                jnp.abs(warm_state.f) > 0.0, axis=(0, 1))   # (B,)
            rank = jnp.where(bad & has_carry, 0,
                             jnp.where(bad, 1, 2))
        else:
            rank = jnp.where(bad, 0, 1)
        order = jnp.argsort(rank, stable=True)[:R]
        sel_bad = bad[order]                                # (R,)
        xb = xrefs.astype(f32)[:, :, order] \
            .transpose(2, 0, 1)                             # (R,12,N+1)
        fb = fsteps.astype(f32)[:, :, order].transpose(2, 0, 1)
        r_tile = R if R <= 64 else 64
        wkw = {}
        if warm_state is not None:
            # stale rolled plan (phase-layout carry) -> reduced-path
            # warm start; duals back to physical units (y_phase =
            # c_scale * y_physical). Rounds after the first early-exit
            # once every gathered lane meets tolerance.
            f_w = warm_state.f[:, :, order].transpose(2, 0, 1) \
                .reshape(R, 12 * N)
            y_w = warm_state.y[:, :, order].transpose(2, 0, 1) \
                .reshape(R, 20 * N) / c_scale
            rho_w = (warm_state.rrho[order, None]
                     if warm_state.rrho is not None
                     else jnp.full((R, 1), rescue_settings.rho, f32))
            mi = rescue_settings.max_iter
            sched = [min(50, mi)]
            while sum(sched) < mi:
                sched.append(min(max(100, mi // 3), mi - sum(sched)))
            wkw = dict(
                state=mpc_mod.MPCWarmState(f=f_w, y=y_w, rho=rho_w),
                schedule=sched, early_exit=True)
        _, st_r, sol_r, ok_r = mpc_mod.solve_mpc_batch_reduced(
            cfg, xb, fb, settings=rescue_settings, tile=r_tile,
            cap=(2 * N if qp_cap is None else qp_cap),
            interpret=interpret, **wkw)
        good = sel_bad & sol_r.converged & ok_r             # (R,)
        f_r = st_r.f.reshape(R, 4 * N, 3).transpose(1, 2, 0)
        # the reduced path's duals are in PHYSICAL units; the phase
        # solver's carry is on the c-scaled cost
        # (y_phase = c_scale * y_physical) — rescale so the rescued
        # lane's next warm start is consistent
        y_r = c_scale * st_r.y.reshape(R, 4 * N, 5).transpose(1, 2, 0)
        g3 = good[None, None, :]
        f_full2 = f_full.at[:, :, order].set(
            jnp.where(g3, f_r, f_full[:, :, order]))
        y_full2 = y_full.at[:, :, order].set(
            jnp.where(g3, y_r, y_full[:, :, order]))
        conv = sol.converged.at[order].set(
            sol.converged[order] | good)
        # carry the rescue's adapted rho for the gathered BAD lanes
        # (osqp workspace-rho semantics across solves)
        rrho = (warm_state.rrho if warm_state is not None
                and warm_state.rrho is not None
                else jnp.full((B,), rescue_settings.rho, f32))
        rrho2 = rrho.at[order].set(
            jnp.where(sel_bad, sol_r.rho[:, 0], rrho[order]))
        return f_full2, y_full2, conv, rrho2

    def no_rescue(args):
        f_full, y_full = args
        rrho = (warm_state.rrho if warm_state is not None
                and warm_state.rrho is not None
                else jnp.full((B,), rescue_settings.rho, f32))
        return f_full, y_full, sol.converged, rrho

    # The rescue only executes on cycles with failures: in steady state
    # (conv == 1.0, the measured fleet norm) the cond skips the whole
    # second stage, so its cost is proportional to actual failures —
    # ~0 amortized in steady state, the full reduced-solve price only
    # during cold-start / post-disturbance transients.
    import jax
    f_full, y_full, conv, rrho = jax.lax.cond(
        jnp.any(bad), do_rescue, no_rescue, (f_full, y_full))
    return f_full, y_full, sol._replace(converged=conv), rrho


def solve_mpc_batch_phase(cfg: Config, xrefs, fsteps, ps: PhaseStructure,
                          phases_of,
                          state: Optional[MPCLaneState] = None,
                          n_iters: int = None, shift: bool = False,
                          eps_abs: float = 1e-4, eps_rel: float = 1e-4,
                          tile: int = 128, interpret: bool = False,
                          use_ref: bool = False, rescue_cap: int = 0,
                          rescue_settings=None,
                          stop_at_eps: bool = False):
    """Batched MPC solve, lane-major phase-sorted batch.

    xrefs (12, N+1, B); fsteps (N_gait, 12, B); phases_of (B // tile,)
    ints (host numpy for a static phase layout, or a traced jnp array —
    the fleet rollout rotates phases in-graph as the gait rolls): phase
    of each tile. Returns (x_f (24, N, B), new_state, PhaseQPResult).

    rescue_cap > 0 enables the capacity-bounded SECOND STAGE: up to
    rescue_cap lanes that failed the phase solve (divergence under the
    shared prox metric, or a support pattern outside the phase set) are
    re-solved cold through the per-problem support-reduced Cholesky path
    (core/mpc.solve_mpc_batch_reduced) — the exact-metric ADMM that has
    no shared-metric indefiniteness. Rescued lanes ship the rescue
    forces and keep a valid warm carry; only lanes beyond the capacity
    (or failing both stages) fall back to the stale plan. This mirrors
    the reference's layered robustness (OSQP polish + the wrapper's
    staleness fallback, scripts/MPC_Wrapper.py:111-126) at fleet scale.
    """
    N = cfg.n_steps
    cap = ps.cap
    d = ps.data
    B = xrefs.shape[-1]
    n_tiles = B // tile
    if n_iters is None:
        n_iters = 300 if state is None else 250

    Bl, hblk, gait = assemble_lane(cfg, xrefs.astype(f32),
                                   fsteps.astype(f32))

    # group lanes by tile for the static per-tile phase maps
    oh2_t = _tile_oh2(ps, phases_of, tile)          # (n_tiles, cap, 4N)
    Blf = Bl.reshape(N, 6, 4, 3, B).transpose(0, 2, 1, 3, 4) \
            .reshape(4 * N, 6, 3, B)                # (4N, 6, 3, B)
    Blf_t = Blf.reshape(4 * N, 6, 3, n_tiles, tile)
    BlS = jnp.einsum("tsk,kaitb->asitb", oh2_t, Blf_t) \
             .reshape(6, 3 * cap, B)                # (6, 3cap, B)

    # q = Gr' W h via the shared prefix-sum structure
    hb = hblk                                        # (N, 12, B)
    htop = hb[:, 0:6, :] * d.wtop[None, :, None]
    hbot = hb[:, 6:12, :] * d.wbot[None, :, None]
    vp = d.dt * jnp.einsum("kj,kab->jab", jnp.asarray(d.P2), htop)
    vv = jnp.einsum("kj,kab->jab", jnp.asarray(d.L), hbot)
    oh_t = _gather_by_phase(np.asarray(ps.data.onehot), phases_of)
    v_t = (vp + vv).reshape(N, 6, n_tiles, tile)
    vS = jnp.einsum("tks,katb->satb", oh_t, v_t)     # (cap, 6, nt, tile)
    q_r = jnp.repeat(vS.transpose(1, 0, 2, 3), 3, axis=1) \
        .reshape(6, 3 * cap, B)
    q_r = (BlS * q_r).sum(axis=0)                    # (3cap, B)

    # warm start extraction from the full-layout carry
    x0 = y0 = None
    if state is not None:
        if shift:
            state = shift_lane_state(state, N)
        f_t = state.f.reshape(4 * N, 3, n_tiles, tile)
        y_t = state.y.reshape(4 * N, 5, n_tiles, tile)
        x0 = jnp.einsum("tsk,kitb->sitb", oh2_t, f_t) \
            .reshape(3 * cap, B)
        y0 = jnp.einsum("tsk,kitb->sitb", oh2_t, y_t) \
            .reshape(5 * cap, B)

    if use_ref:
        # pure-XLA reference path (identical update equations; no lane
        # tiling constraints — any batch size / per-problem phases).
        # Used by eval/parity_320 and CPU fallbacks; tile=1 makes
        # phases_of per-problem.
        assert tile == 1, "use_ref expects tile=1 (per-problem phases)"
        sol = qp_phase.solve_ref(q_r, BlS, d, phases_of,
                                 x0=x0, y0=y0, n_iters=n_iters,
                                 stop_at_eps=stop_at_eps)
    else:
        sol = qp_phase.solve(q_r, BlS, d, phases_of, x0=x0, y0=y0,
                             n_iters=n_iters, eps_abs=eps_abs,
                             eps_rel=eps_rel, tile=tile,
                             stop_at_eps=stop_at_eps,
                             interpret=interpret)

    # Support guard: a problem whose actual stance pattern does not
    # match its claimed phase class solved the WRONG reduced QP — mark
    # it non-converged so it takes the stale-plan fallback below
    # instead of shipping silently wrong forces.
    sup_claim = _gather_by_phase(np.asarray(ps.supports, np.float32),
                                 phases_of)
    sup_claim = jnp.repeat(sup_claim, tile, axis=0)       # (B, 4N)
    sup_have = gait.transpose(2, 0, 1).reshape(B, 4 * N)
    support_ok = jnp.all(sup_have == sup_claim, axis=1)
    sol = sol._replace(converged=sol.converged & support_ok)

    # scatter back to full layout
    x_t = sol.x.reshape(cap, 3, n_tiles, tile)
    yy_t = sol.y.reshape(cap, 5, n_tiles, tile)
    f_full = jnp.einsum("tsk,sitb->kitb", oh2_t, x_t).reshape(4 * N, 3, B)
    y_full = jnp.einsum("tsk,sitb->kitb", oh2_t, yy_t).reshape(4 * N, 5,
                                                               B)

    # second stage: per-problem reduced re-solve of failed lanes
    # (rrho is always materialized so scanned carries keep one pytree
    # structure whether or not a given call runs the rescue)
    rrho_out = (state.rrho if state is not None
                and state.rrho is not None
                else jnp.full((B,), 0.1, f32))
    if rescue_cap:
        f_full, y_full, sol, rrho_out = _rescue_failed_lanes(
            cfg, xrefs, fsteps, f_full, y_full, sol, rescue_cap,
            rescue_settings, interpret, c_scale=d.c_scale, qp_cap=cap,
            warm_state=state)

    # Divergence handling (the safeguard box in ops/qp_phase bounds the
    # rare non-convergent lanes instead of NaN): a failed lane SHIPS ITS
    # STALE (rolled) PLAN — exactly the reference's async staleness
    # fallback (scripts/MPC_Wrapper.py:111-126) — and its warm carry is
    # zeroed so the next cycle restarts it cold.
    cv = sol.converged[None, None, :]
    if state is not None:
        f_full = jnp.where(cv, f_full, state.f)
        y_full = jnp.where(cv, y_full, state.y)
        f_carry = jnp.where(cv, f_full, 0.0)
        y_carry = jnp.where(cv, y_full, 0.0)
    else:
        f_carry, y_carry = f_full, y_full

    # dx recovery + x_f assembly (recover_dx, lane-major)
    u = jnp.einsum("kafib,kfib->kab", Bl.reshape(N, 6, 4, 3, B),
                   f_full.reshape(N, 4, 3, B))       # (N, 6, B)
    dxv = jnp.einsum("kj,jab->kab", jnp.asarray(d.L), u)
    dxp = d.dt * jnp.einsum("kj,jab->kab", jnp.asarray(d.P2), u)
    dx = jnp.concatenate([dxp, dxv], axis=1) + hblk  # (N, 12, B)
    states = dx.transpose(1, 0, 2) + xrefs[:, 1:N + 1, :].astype(f32)
    forces = f_full.reshape(N, 12, B).transpose(1, 0, 2)
    x_f = jnp.concatenate([states, forces], axis=0)  # (24, N, B)

    new_state = MPCLaneState(f=f_carry, y=y_carry, rrho=rrho_out)
    return x_f, new_state, sol
