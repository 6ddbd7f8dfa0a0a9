"""Physics-level MPC tests.

Replicates the invariants of the reference's scripts/test_mpc.py (SURVEY.md
section 4 tier 2): equal per-foot forces at 4-stance equilibrium, tracking
convergence to the reference state from a perturbed start (atol 1e-3
4-stance / 1e-2 trot), stable trot under manual gait rolling — all in the
same closed loop (predicted state fed back as the next current state).
Additionally the condensed QP is cross-checked against an independent
interior-point oracle, coverage the reference delegates to OSQP.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core import mpc
from qrw_tpu.ops import qp
from tests.qp_oracle import solve_qp_oracle

CFG = Config()
H0 = 0.24474949993103629
MG4 = CFG.mass * CFG.gravity / 4.0

FOOTHOLDS = np.array([0.195, 0.147, 0., 0.195, -0.147, 0.,
                      -0.195, 0.147, 0., -0.195, -0.147, 0.])
PAIR_1 = np.array([0.195, 0.147, 0., 0., 0., 0.,
                   0., 0., 0., -0.195, -0.147, 0.])
PAIR_2 = np.array([0., 0., 0., 0.195, -0.147, 0.,
                   -0.195, 0.147, 0., 0., 0., 0.])


def _xref(x0=None):
    xref = np.zeros((12, CFG.n_steps + 1))
    xref[2, :] = H0
    if x0 is not None:
        xref[:, 0] = x0
    return xref


def _fsteps_fourstance():
    f = np.zeros((CFG.N_gait, 12))
    f[:CFG.n_steps] = FOOTHOLDS
    return f


def _fsteps_trot(offset):
    """Expanded trot footstep matrix with the stance flip `offset` rows in."""
    f = np.zeros((CFG.N_gait, 12))
    half = CFG.n_steps // 2
    for i in range(CFG.n_steps):
        f[i] = PAIR_1 if ((i + (half - offset)) // half) % 2 == 0 else PAIR_2
    return f


@functools.cache
def _solver():
    settings = qp.QPSettings(max_iter=2000)
    return jax.jit(lambda xref, fsteps, st: mpc.solve_mpc(
        CFG, xref, fsteps, st, settings))


def _closed_loop(xref, fsteps_fn, iters):
    solve = _solver()
    st = mpc.init_mpc_state(CFG, jnp.float64)
    xref = jnp.asarray(xref)
    res = None
    for i in range(iters):
        res = solve(xref, jnp.asarray(fsteps_fn(i)), st)
        st = res.state
        xref = xref.at[:, 0].set(res.x_f_applied[:12, 0])
    return res, xref


def test_fourstance_equilibrium():
    res, xref = _closed_loop(_xref(), lambda i: _fsteps_fourstance(), 30)
    x_f = np.asarray(res.x_f_applied)
    f0 = x_f[12:, 0]
    # all feet carry identical forces (scripts/test_mpc.py:83-84)
    np.testing.assert_allclose(f0, np.tile(f0[0:3], 4), atol=1e-8)
    # vertical force = weight / 4, tangential ~ 0
    np.testing.assert_allclose(f0[2::3], MG4, rtol=1e-3)
    np.testing.assert_allclose(f0[0::3], 0.0, atol=1e-6)
    # converged onto the reference state (atol 1e-3, scripts/test_mpc.py:85)
    np.testing.assert_allclose(x_f[:12, 0], np.asarray(xref[:, 1]), atol=1e-3)


def test_fourstance_not_centered():
    x0 = np.array([0.05, 0.05, 0.2, 0.1, 0.1, 0.1,
                   0.01, 0.01, 0.04, 0.4, 0.4, 0.4])
    # 500 closed-loop iterations as in the reference (scripts/test_mpc.py:102)
    res, xref = _closed_loop(_xref(x0), lambda i: _fsteps_fourstance(), 500)
    x_f = np.asarray(res.x_f_applied)
    np.testing.assert_allclose(x_f[12:, 0], np.tile(x_f[12:15, 0], 4),
                               atol=1e-6)
    np.testing.assert_allclose(x_f[:12, 0], np.asarray(xref[:, 1]), atol=1e-3)


def test_twostance_trot():
    res, xref = _closed_loop(_xref(), lambda i: _fsteps_trot(i % 16), 64)
    x_f = np.asarray(res.x_f_applied)
    # state stays near the reference through the stance switches
    np.testing.assert_allclose(x_f[:12, 0], np.asarray(xref[:, 1]), atol=1e-2)
    # stance pair carries the full weight
    fz = x_f[14::3, 0]
    assert abs(fz.sum() - 4 * MG4) / (4 * MG4) < 0.1
    # swing feet forces are exactly zero (S_gait equality rows)
    gait0 = _fsteps_trot(0)[0, 0::3] != 0
    np.testing.assert_allclose(x_f[12:, 0].reshape(4, 3)[~gait0], 0.0,
                               atol=1e-7)


def test_condensed_qp_matches_interior_point_oracle():
    """The condensed trot QP solved by the ADMM kernel equals the solution
    of an independent f64 interior-point method."""
    xref = _xref()
    xref[:, 0] = [0.01, -0.02, H0 + 0.01, 0.02, -0.01, 0.03,
                  0.1, 0.05, -0.02, 0.2, -0.1, 0.15]
    xref[6, 1:] = 0.3   # forward velocity reference
    fsteps = _fsteps_trot(5)
    H, qlin, l, u, G, h = mpc.build_qp(CFG, jnp.asarray(xref),
                                       jnp.asarray(fsteps))
    A = mpc.cone_matrix(CFG.n_steps, CFG.mu)
    sol = qp.solve(H, qlin, jnp.asarray(A), l, u,
                   qp.QPSettings(max_iter=4000, eps_abs=1e-9, eps_rel=1e-9))
    assert bool(sol.converged)
    x_ref = solve_qp_oracle(np.asarray(H), np.asarray(qlin), A,
                            np.asarray(l), np.asarray(u))
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-5)


def test_reduced_build_matches_compact():
    """The support-reduced QP build equals the compact build gathered at
    the stance variables (the reduction is exact: swing forces are pinned
    to zero by the l=u=0 activation rows)."""
    xref = _xref()
    xref[:, 0] = [0.01, -0.02, H0 + 0.01, 0.02, -0.01, 0.03,
                  0.1, 0.05, -0.02, 0.2, -0.1, 0.15]
    xref[6, 1:] = 0.4
    fsteps = _fsteps_trot(5)
    cap = 2 * CFG.n_steps
    H, qlin, l, u, Bl, h = mpc.build_qp_compact(
        CFG, jnp.asarray(xref, jnp.float32), jnp.asarray(fsteps,
                                                         jnp.float32))
    Hr, qr, Bl2, h2, idx, valid = mpc.build_qp_reduced(
        CFG, jnp.asarray(xref, jnp.float32),
        jnp.asarray(fsteps, jnp.float32), cap)
    assert int(np.asarray(valid).sum()) == cap
    vidx = (3 * np.asarray(idx)[:, None] + np.arange(3)).reshape(-1)
    np.testing.assert_allclose(np.asarray(Hr),
                               np.asarray(H)[vidx][:, vidx], atol=1e-6)
    np.testing.assert_allclose(np.asarray(qr), np.asarray(qlin)[vidx],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h), atol=1e-6)


def test_reduced_solve_matches_oracle_and_warm_chain():
    """solve_mpc_batch_reduced (the production throughput path) matches
    the f64 IPM oracle on the full problem, cold and across a warm
    re-solve; swing forces in the scattered-back plan are exactly zero."""
    xrefs = np.stack([_xref(), _xref([0.02, 0.01, H0, 0, 0, 0.1,
                                      0.1, 0, 0, 0, 0, 0.2])])
    xrefs[:, 6, 1:] = 0.3
    fsteps = np.stack([_fsteps_trot(2), _fsteps_trot(9)])
    # production controller tolerance (the f32 noise floor sits ~1e-5;
    # eps 1e-6 is the f64 oracle regime, covered by build equivalence +
    # eval/parity_320 on hardware)
    settings = qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=3000,
                             adaptive_rho_interval=200)
    x_f, st, sol, ok = mpc.solve_mpc_batch_reduced(
        CFG, jnp.asarray(xrefs, jnp.float32),
        jnp.asarray(fsteps, jnp.float32), settings=settings, tile=2,
        interpret=True)
    assert bool(np.asarray(ok).all())
    assert bool(np.asarray(sol.converged).all())
    A = mpc.cone_matrix(CFG.n_steps, CFG.mu)
    for i in range(2):
        H, qlin, l, u, _, _ = mpc.build_qp(CFG, jnp.asarray(xrefs[i]),
                                           jnp.asarray(fsteps[i]))
        f_star = solve_qp_oracle(np.asarray(H), np.asarray(qlin), A,
                                 np.asarray(l), np.asarray(u))
        np.testing.assert_allclose(np.asarray(st.f[i]), f_star, atol=0.05)
        # swing forces exactly zero in the scattered-back plan
        gait = np.asarray(fsteps[i][:CFG.n_steps, 0::3] != 0)
        ff = np.asarray(st.f[i]).reshape(CFG.n_steps, 4, 3)
        np.testing.assert_allclose(ff[~gait], 0.0, atol=0.0)
    # warm re-solve on a perturbed problem stays at oracle accuracy
    xrefs2 = xrefs.copy()
    xrefs2[:, :, 0] += 0.002
    x_f2, st2, sol2, ok2 = mpc.solve_mpc_batch_reduced(
        CFG, jnp.asarray(xrefs2, jnp.float32),
        jnp.asarray(fsteps, jnp.float32), state=st, settings=settings,
        schedule=[400], tile=2, interpret=True)
    assert bool(np.asarray(sol2.converged).all())
    for i in range(2):
        H, qlin, l, u, _, _ = mpc.build_qp(CFG, jnp.asarray(xrefs2[i]),
                                           jnp.asarray(fsteps[i]))
        f_star = solve_qp_oracle(np.asarray(H), np.asarray(qlin), A,
                                 np.asarray(l), np.asarray(u))
        np.testing.assert_allclose(np.asarray(st2.f[i]), f_star,
                                   atol=0.05)


def test_batched_solves_match_single():
    """vmap over scenarios reproduces per-scenario results."""
    xrefs = np.stack([_xref(), _xref([0.02, 0, H0, 0, 0, 0.1,
                                      0.1, 0, 0, 0, 0, 0.2])])
    fsteps = np.stack([_fsteps_fourstance(), _fsteps_trot(3)])
    settings = qp.QPSettings(max_iter=2000)
    single = [mpc.solve_mpc(CFG, jnp.asarray(xrefs[i]),
                            jnp.asarray(fsteps[i]), settings=settings)
              for i in range(2)]
    batched = jax.vmap(lambda x, f: mpc.solve_mpc(CFG, x, f,
                                                  settings=settings))(
        jnp.asarray(xrefs), jnp.asarray(fsteps))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(batched.x_f_applied[i]),
                                   np.asarray(single[i].x_f_applied),
                                   atol=1e-7)


def test_condensation_matches_reference_sparse_formulation():
    """Cross-validation against the reference's OWN formulation: the
    uncondensed sparse QP is reconstructed row-by-row from the
    src/MPC.cpp construction (independent of every qrw_tpu builder) and
    solved with the f64 IPM oracle; the condensed path must produce the
    same forces and predicted states.

    Reference construction (all cites src/MPC.cpp):
      variables X = [state deviations x_k - xref_k (12N); forces (12N)]
      rows 0..12N     dynamics equalities: -X_r + A X_{r-1} + B_r F_r
                      = N_r with A = I + dt E (:92-100), B force rows
                      dt/mass at 6:9 (:104-117) and torque rows
                      dt*(R'gI R)^-1 skew(lever) at 9:12 (:439-447),
                      N = g-term + A(-x0) first block + D xref (:261-290)
      rows 12N..24N   S_gait activation: coefficient 1 for SWING feet
                      with l = u = 0 (pin), coefficient 0 for stance
                      (vacuous row, :126-129, :455-461, construct_S)
      rows 24N..44N   friction pyramid C per (step, foot) with the
                      a/b/c index pattern (:135-146), u = 0, l = -inf
                      except -25 on each 5th row (:293-297)
      cost P = diag(w_state x N, 5e-5 x 12N), q = 0 (:330-349)
    """
    cfg = CFG
    N = cfg.n_steps
    dt = cfg.dt_mpc
    xref = _xref()
    xref[:, 0] = [0.01, -0.02, H0 + 0.01, 0.02, -0.01, 0.03,
                  0.1, 0.05, -0.02, 0.2, -0.1, 0.15]
    xref[6, 1:] = 0.4
    fsteps = _fsteps_trot(3)
    gait = (fsteps[:N, 0::3] != 0).astype(float)
    gI = np.asarray(CFG.gI, np.float64).reshape(3, 3)

    # --- independent sparse construction (numpy, f64) ----------------
    nv, meq = 24 * N, 12 * N
    A_blk = np.eye(12)
    A_blk[0:6, 6:12] = dt * np.eye(6)
    M = np.zeros((44 * N, nv))
    lo = np.zeros(44 * N)
    up = np.zeros(44 * N)
    # dynamics rows
    for r in range(N):
        M[12 * r:12 * r + 12, 12 * r:12 * r + 12] = -np.eye(12)
        if r > 0:
            M[12 * r:12 * r + 12, 12 * (r - 1):12 * r] = A_blk
        # B_r
        yaw = xref[5, r]
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        I_inv = np.linalg.inv(R.T @ gI @ R)
        com = xref[0:3, r] + np.array([0, 0, CFG.offset_com_z])
        B = np.zeros((12, 12))
        for i in range(4):
            B[6:9, 3 * i:3 * i + 3] = (dt / CFG.mass) * np.eye(3)
            lv = fsteps[r, 3 * i:3 * i + 3] - com
            sk = np.array([[0, -lv[2], lv[1]], [lv[2], 0, -lv[0]],
                           [-lv[1], lv[0], 0]])
            B[9:12, 3 * i:3 * i + 3] = dt * (I_inv @ sk)
        M[12 * r:12 * r + 12, 12 * (N + r):12 * (N + r) + 12] = B
        # N_r: gravity + xref coupling (+ A(-x0) on the first block)
        n_r = np.zeros(12)
        n_r[8] = CFG.gravity * dt                      # -g(8)
        n_r += xref[:, r + 1] - A_blk @ xref[:, r] if r > 0 else 0.0
        if r == 0:
            n_r += xref[:, 1] - A_blk @ xref[:, 0]
        lo[12 * r:12 * r + 12] = n_r
        up[12 * r:12 * r + 12] = n_r
    # activation rows: swing pinned, stance vacuous (coefficient 0)
    for r in range(N):
        for i in range(4):
            if gait[r, i] == 0:
                for c3 in range(3):
                    row = meq + 12 * r + 3 * i + c3
                    M[row, 12 * (N + r) + 3 * i + c3] = 1.0
    # cone rows
    a_p = [0, 1, 2, 3, 0, 1, 2, 3, 4]
    b_p = [0, 0, 1, 1, 2, 2, 2, 2, 2]
    c_p = [1.0, -1.0, 1.0, -1.0, -CFG.mu, -CFG.mu, -CFG.mu, -CFG.mu,
           -1.0]
    off = 24 * N
    for r in range(N):
        for i in range(4):
            for j in range(9):
                M[off + 20 * r + 5 * i + a_p[j],
                  12 * (N + r) + 3 * i + b_p[j]] = c_p[j]
    lo[off:] = -np.inf
    lo[off + 4::5] = -CFG.fz_max
    up[off:] = 0.0
    P = np.diag(np.concatenate([np.tile(CFG.w_state, N),
                                np.full(12 * N, CFG.w_force)]))
    q0 = np.zeros(nv)

    # vacuous all-zero rows (stance activation) break the IPM oracle;
    # dropping a 0 = 0 row is an identity transformation
    keep = np.abs(M).sum(axis=1) > 0
    x_sp = solve_qp_oracle(P, q0, M[keep], lo[keep], up[keep],
                           tol=1e-10)
    forces_sp = x_sp[12 * N:].reshape(N, 12)
    states_sp = x_sp[:12 * N].reshape(N, 12) + xref[:, 1:].T

    # --- the condensed path on the same problem ----------------------
    res = mpc.solve_mpc(CFG, jnp.asarray(xref), jnp.asarray(fsteps),
                        settings=qp.QPSettings(max_iter=4000,
                                               eps_abs=1e-9,
                                               eps_rel=1e-9))
    x_f = np.asarray(res.x_f_applied)
    np.testing.assert_allclose(x_f[12:, :].T, forces_sp, atol=2e-4)
    np.testing.assert_allclose(x_f[:12, :].T, states_sp, atol=2e-4)
