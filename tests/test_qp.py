"""Tests for the batched ADMM QP solver (ops/qp.py) against an independent
interior-point oracle and KKT conditions — the coverage tier the reference
delegates to OSQP's own test suite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.ops import qp
from tests.qp_oracle import kkt_error, solve_qp_oracle


def _random_qp(rng, n, m, n_eq=0, loose=0):
    M = rng.normal(size=(n, n))
    P = M @ M.T + n * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    xf = rng.normal(size=n)          # a feasible point
    margin = np.abs(rng.normal(size=m)) + 0.1
    Axf = A @ xf
    l = Axf - margin
    u = Axf + np.abs(rng.normal(size=m)) + 0.1
    idx = rng.permutation(m)
    for i in idx[:n_eq]:
        l[i] = u[i] = Axf[i]
    for i in idx[n_eq:n_eq + loose]:
        l[i], u[i] = -np.inf, np.inf
    return P, q, A, l, u


@pytest.mark.parametrize("n,m,n_eq,loose", [(8, 12, 0, 0), (12, 20, 3, 2),
                                            (24, 40, 6, 4)])
def test_admm_matches_oracle(n, m, n_eq, loose):
    rng = np.random.default_rng(n * 100 + m)
    P, q, A, l, u = _random_qp(rng, n, m, n_eq, loose)
    sol = qp.solve(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                   jnp.asarray(l), jnp.asarray(u),
                   qp.QPSettings(max_iter=4000, eps_abs=1e-9, eps_rel=1e-9))
    assert bool(sol.converged)
    x_ref = solve_qp_oracle(P, q, A, l, u)
    assert kkt_error(P, q, A, l, u, x_ref) < 1e-5, "oracle itself failed"
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-6)


def test_admm_batched_vs_sequential():
    rng = np.random.default_rng(0)
    probs = [_random_qp(rng, 10, 16, 2, 1) for _ in range(5)]
    P = jnp.asarray(np.stack([p[0] for p in probs]))
    q = jnp.asarray(np.stack([p[1] for p in probs]))
    A = jnp.asarray(np.stack([p[2] for p in probs]))
    l = jnp.asarray(np.stack([p[3] for p in probs]))
    u = jnp.asarray(np.stack([p[4] for p in probs]))
    st = qp.QPSettings(max_iter=4000, eps_abs=1e-9, eps_rel=1e-9)
    sol = qp.solve(P, q, A, l, u, st)
    assert bool(jnp.all(sol.converged))
    for i, (Pi, qi, Ai, li, ui) in enumerate(probs):
        x_ref = solve_qp_oracle(Pi, qi, Ai, li, ui)
        np.testing.assert_allclose(np.asarray(sol.x[i]), x_ref, atol=1e-6)


def test_admm_shared_A():
    """A may be shared (unbatched) across a batch of problems."""
    rng = np.random.default_rng(7)
    P0, q0, A, l0, u0 = _random_qp(rng, 8, 12)
    P1 = P0 + np.eye(8)
    q1 = q0 + 0.3
    l1, u1 = l0 - 0.2, u0 + 0.1
    sol = qp.solve(jnp.asarray(np.stack([P0, P1])),
                   jnp.asarray(np.stack([q0, q1])),
                   jnp.asarray(A),
                   jnp.asarray(np.stack([l0, l1])),
                   jnp.asarray(np.stack([u0, u1])),
                   qp.QPSettings(max_iter=4000, eps_abs=1e-9, eps_rel=1e-9))
    assert bool(jnp.all(sol.converged))
    for i, (l, u, P, q) in enumerate([(l0, u0, P0, q0), (l1, u1, P1, q1)]):
        x_ref = solve_qp_oracle(P, q, A, l, u)
        np.testing.assert_allclose(np.asarray(sol.x[i]), x_ref, atol=1e-6)


def test_warm_start_reduces_iterations():
    rng = np.random.default_rng(3)
    P, q, A, l, u = _random_qp(rng, 16, 24, 2, 0)
    st = qp.QPSettings(max_iter=4000, eps_abs=1e-9, eps_rel=1e-9)
    cold = qp.solve(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                    jnp.asarray(l), jnp.asarray(u), st)
    warm = qp.solve(jnp.asarray(P), jnp.asarray(q + 1e-4), jnp.asarray(A),
                    jnp.asarray(l), jnp.asarray(u), st,
                    x0=cold.x, y0=cold.y)
    assert int(warm.iters) <= int(cold.iters)


def test_active_box_constraints_exact():
    """Equality rows (l == u) are satisfied to solver tolerance — the
    mechanism the MPC uses to zero swing-foot forces (src/MPC.cpp:686-701
    via the S_gait rows)."""
    rng = np.random.default_rng(11)
    P, q, A, l, u = _random_qp(rng, 12, 18, 6, 0)
    sol = qp.solve(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                   jnp.asarray(l), jnp.asarray(u),
                   qp.QPSettings(max_iter=4000, eps_abs=1e-10, eps_rel=1e-10))
    eq = (u - l) < 1e-12
    resid = np.asarray(sol.x) @ A[eq].T - u[eq]
    np.testing.assert_allclose(resid, 0.0, atol=1e-8)
