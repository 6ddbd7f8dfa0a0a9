"""Pallas ADMM kernel (ops/qp_pallas) — validated in interpreter mode on
CPU against the XLA reference solver (ops/qp.solve), which is itself
validated against OSQP semantics (tests/test_qp.py). Real-TPU execution
of the same kernel is exercised by bench.py."""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core import mpc as mpc_mod
from qrw_tpu.ops import qp, qp_pallas

CFG = Config()
ST = qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=450,
                   adaptive_rho_interval=200)


def _random_qps(B=4, n=24, m=40, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n))
    P = np.einsum("bij,bkj->bik", M, M) + 0.1 * np.eye(n)
    q = rng.normal(size=(B, n))
    A = rng.normal(size=(m, n))
    l = -np.abs(rng.normal(size=(B, m))) - 0.5
    u = np.abs(rng.normal(size=(B, m))) + 0.5
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return f32(P), f32(q), f32(A), f32(l), f32(u)


def _mpc_qps(B=4):
    rng = np.random.default_rng(0)
    import bench
    xrefs, fsteps = bench.build_batch(CFG, B, rng)
    H, qlin, l, u, G, h = jax.vmap(
        lambda x, f: mpc_mod.build_qp(CFG, jnp.asarray(x, jnp.float32),
                                      jnp.asarray(f, jnp.float32))
    )(jnp.asarray(xrefs), jnp.asarray(fsteps))
    A = jnp.asarray(mpc_mod.cone_matrix(CFG.n_steps, CFG.mu), jnp.float32)
    return H, qlin, A, l, u, jnp.asarray(xrefs), jnp.asarray(fsteps)


def test_pallas_matches_xla_on_random_qps():
    P, q, A, l, u = _random_qps()
    out = qp_pallas.solve(P, q, A, l, u, ST, tile=2, interpret=True)
    ref = qp.solve(P, q, A, l, u, ST)
    assert bool(np.all(np.asarray(out.converged)))
    assert bool(np.all(np.asarray(ref.converged)))
    # same optimum (strictly convex): tolerances scale with eps
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=5e-3)


def test_pallas_converges_on_mpc_problems():
    H, qlin, A, l, u, _, _ = _mpc_qps()
    cone = qp.ConeStructure(CFG.n_steps, CFG.mu)
    out = qp_pallas.solve(H, qlin, A, l, u, ST, tile=2, cone=cone,
                          interpret=True)
    assert bool(np.all(np.asarray(out.converged))), np.asarray(out.pri_res)
    # KKT sanity: solution within bounds, stationarity via dual residual
    assert float(np.max(np.asarray(out.dua_res))) < 1e-2


def test_pallas_structured_factor_matches_dense():
    H, qlin, A, l, u, _, _ = _mpc_qps(B=2)
    B = H.shape[0]
    rho_vec = jnp.abs(jnp.asarray(
        np.random.default_rng(1).normal(size=(B, A.shape[0])),
        jnp.float32)) + 0.05
    sig_vec = jnp.full((B, H.shape[1]), 1e-6, jnp.float32)
    cone = qp.ConeStructure(CFG.n_steps, CFG.mu)
    Ki_dense = qp_pallas._factor(
        qp_pallas._build_K(H, A, rho_vec, sig_vec, None))
    Ki_cone = qp_pallas._factor(
        qp_pallas._build_K(H, A, rho_vec, sig_vec, cone))
    np.testing.assert_allclose(np.asarray(Ki_dense), np.asarray(Ki_cone),
                               atol=1e-5, rtol=1e-4)


def test_pallas_warm_start_carry():
    """Warm re-solve with carried (precond, rho, x, y) converges in a
    single short round on a perturbed problem."""
    H, qlin, A, l, u, _, _ = _mpc_qps()
    cone = qp.ConeStructure(CFG.n_steps, CFG.mu)
    out = qp_pallas.solve(H, qlin, A, l, u, ST, tile=2, cone=cone,
                          interpret=True)
    q2 = qlin * 1.01
    out2 = qp_pallas.solve(H, q2, A, l, u, ST, tile=2, cone=cone,
                           x0=out.x, y0=out.y, rho_init=out.rho,
                           precond=out.precond, schedule=[100],
                           interpret=True)
    assert bool(np.all(np.asarray(out2.converged)))
    assert int(np.max(np.asarray(out2.iters))) <= 100


def test_pallas_stale_refactor_with_refinement():
    """refactor='stale': the previous cycle's K^-1 reused verbatim as a
    preconditioner with in-kernel iterative refinement. The contract is
    SAFETY, not completeness: on these ill-conditioned KKT systems a
    stale inverse may stall some problems (which is why 'ns' is the
    production default), but the unscaled residual termination must
    never mark a wrong solution converged — forces of converged problems
    match the reference solver."""
    H, qlin, A, l, u, xrefs, fsteps = _mpc_qps()
    x_f, st, sol = mpc_mod.solve_mpc_batch_pallas(
        CFG, xrefs, fsteps, settings=ST, tile=2, interpret=True)
    xrefs2 = xrefs.at[:, :, 0].add(0.001)
    x_f2, st2, sol2 = mpc_mod.solve_mpc_batch_pallas(
        CFG, xrefs2, fsteps, state=st, settings=ST, tile=2,
        refactor="stale", interpret=True)
    conv = np.asarray(sol2.converged)
    assert conv.any(), "stale path solved nothing"
    ref = jax.vmap(lambda x, f: mpc_mod.solve_mpc(
        CFG, x, f, settings=ST))(xrefs2, fsteps)
    fz_p = np.asarray(x_f2)[conv][:, 14::3]
    fz_r = np.asarray(ref.x_f_applied)[conv][:, 14::3]
    # eps-1e-4-level agreement: low-curvature force directions may move
    # a few percent of the ~12 N stance force between solvers
    np.testing.assert_allclose(fz_p, fz_r, atol=0.6)


def test_mpc_batch_pallas_matches_xla_mpc():
    """solve_mpc_batch_pallas reproduces the XLA MPC's predicted states
    and forces (both converged to the same eps on the same QP)."""
    H, qlin, A, l, u, xrefs, fsteps = _mpc_qps()
    x_f, st, sol = mpc_mod.solve_mpc_batch_pallas(
        CFG, xrefs, fsteps, settings=ST, tile=2, interpret=True)
    settings = ST
    ref = jax.vmap(lambda x, f: mpc_mod.solve_mpc(
        CFG, jnp.asarray(x, jnp.float32), jnp.asarray(f, jnp.float32),
        settings=settings))(xrefs, fsteps)
    assert bool(np.all(np.asarray(sol.converged)))
    # states agree tightly on the WEIGHTED rows; rows with zero state
    # weight (w[9:11] = 0, src/MPC.cpp:330) are cost-free directions the
    # two solvers may resolve differently
    w_rows = [i for i, w in enumerate(CFG.w_state) if w > 0]
    np.testing.assert_allclose(np.asarray(x_f)[:, w_rows],
                               np.asarray(ref.x_f_applied)[:, w_rows],
                               atol=5e-3)
    fz_p = np.asarray(x_f)[:, 14::3]
    fz_r = np.asarray(ref.x_f_applied)[:, 14::3]
    np.testing.assert_allclose(fz_p, fz_r, atol=0.25)

    # warm second cycle
    xrefs2 = xrefs.at[:, :, 0].add(0.001)
    x_f2, st2, sol2 = mpc_mod.solve_mpc_batch_pallas(
        CFG, xrefs2, fsteps, state=st, settings=ST, tile=2,
        interpret=True)
    assert bool(np.all(np.asarray(sol2.converged)))
    assert int(np.max(np.asarray(sol2.iters))) <= 100


def test_pallas_warm_chain_batch1_rolled_stance_stays_finite():
    """Regression: the 50 Hz controller cadence — a batch-of-1 warm
    chain where the stance pattern ROLLS one MPC step every cycle
    (equality rows flip ~1e9x in rho, invalidating the carried K^-1).
    The guarded stale/ns rescue must keep every cycle finite and
    converging; before the guard, cycle 2 diverged to NaN and poisoned
    the rest of the chain (found by eval/parity_320)."""
    rng = np.random.default_rng(3)
    import bench
    C = 6
    xrefs_np, fsteps_np = bench.build_batch(CFG, C, rng)  # distinct rolls
    st = None
    convs = []
    for i in range(C):
        x = jnp.asarray(xrefs_np[i:i + 1], jnp.float32)
        f = jnp.asarray(fsteps_np[i:i + 1], jnp.float32)
        if st is None:
            x_f, st, sol = mpc_mod.solve_mpc_batch_pallas(
                CFG, x, f, settings=ST, tile=8, interpret=True)
        else:
            x_f, st, sol = mpc_mod.solve_mpc_batch_pallas(
                CFG, x, f, state=st, settings=ST, schedule=[100],
                tile=8, interpret=True)
        assert np.all(np.isfinite(np.asarray(x_f))), f"NaN at cycle {i}"
        assert np.all(np.isfinite(np.asarray(st.kinv))), f"kinv NaN @{i}"
        convs.append(bool(np.asarray(sol.converged)[0]))
    # cold cycle converges; the warm chain must keep converging even
    # though every cycle's stance pattern differs from the carry
    assert convs[0]
    assert sum(convs) >= C - 1, convs
