"""Unrolled small-matrix linalg (ops/lin.py) vs the jnp.linalg oracles.

These kernels replace batched LAPACK-style factorizations on the fleet
hot path (sim/physics.py forward dynamics, core/wbc.py leg-Jacobian
inverses, ops/qp.py KKT factorization); correctness here is what makes
those swaps safe.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.ops import lin


def _spd(key, batch, n, dtype):
    A = jax.random.normal(key, batch + (n, n), dtype)
    return A @ A.swapaxes(-1, -2) + n * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [3, 6, 12, 18])
def test_chol_solve_matches_linalg(n):
    key = jax.random.PRNGKey(n)
    M = _spd(key, (7,), n, jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(n + 1), (7, n), jnp.float64)
    x = lin.chol_solve(M, b)
    x_ref = jnp.linalg.solve(M, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("n", [3, 12, 18])
def test_cholesky_matches_linalg(n):
    key = jax.random.PRNGKey(10 + n)
    M = _spd(key, (5,), n, jnp.float64)
    L = lin.cholesky(M)
    L_ref = jnp.linalg.cholesky(M)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("n", [3, 12, 18])
def test_spd_inverse_matches_linalg(n):
    key = jax.random.PRNGKey(20 + n)
    M = _spd(key, (4,), n, jnp.float64)
    Minv = lin.spd_inverse(M)
    np.testing.assert_allclose(np.asarray(Minv),
                               np.asarray(jnp.linalg.inv(M)),
                               rtol=1e-9, atol=1e-9)
    # symmetry is exact by construction
    np.testing.assert_array_equal(np.asarray(Minv),
                                  np.asarray(Minv.swapaxes(-1, -2)))


def test_inv3_matches_linalg():
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (6, 4, 3, 3), jnp.float64)
    A = A + 3.0 * jnp.eye(3, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(lin.inv3(A)),
                               np.asarray(jnp.linalg.inv(A)),
                               rtol=1e-9, atol=1e-9)


def test_unbatched_and_f32():
    M = np.asarray(_spd(jax.random.PRNGKey(0), (), 18, jnp.float64))
    b = np.linspace(-1.0, 1.0, 18)
    x32 = lin.chol_solve(jnp.asarray(M, jnp.float32),
                         jnp.asarray(b, jnp.float32))
    x_ref = np.linalg.solve(M, b)
    np.testing.assert_allclose(np.asarray(x32), x_ref, rtol=2e-4, atol=2e-4)
