"""Small-matrix linear algebra in column-sweep form for TPU batches.

XLA's batched `jnp.linalg.cholesky` / `inv` / triangular solves lower to
LAPACK-style blocked loop nests that serialize tiny problems behind
dynamic control flow; on TPU a batch of 1024 18x18 factorizations costs
milliseconds while the useful arithmetic is microseconds. For the
fixed, small matrix orders of this framework (3x3 leg Jacobian blocks,
12x12 WBC KKT systems, 18x18 joint-space inertia) the right TPU form is
an unrolled COLUMN SWEEP: n statically-unrolled steps of whole-column /
whole-matrix elementwise ops (masked rank-1 updates), so the batch
rides the vector lanes and the graph stays ~15n HLO ops — small enough
to compile fast everywhere, unlike a full scalar unroll (O(n^3) ops,
minutes of XLA CPU compile at n=18). Measured on v5e at B=1024:
18x18 cholesky+solve 2.57 ms (jnp.linalg) -> ~0.03 ms here; a
(B,4,3,3) inverse 4.58 ms (jnp.linalg.inv) -> adjugate form, fuses away.

All functions take the matrix order from the trailing static shape and
broadcast over arbitrary leading batch dims; intended for small n
(keep n <= ~32 — larger orders amortize fine on the LAPACK path).

PRECONDITIONS (unchecked, branch-free): `inv3` requires nonsingular
inputs and the Cholesky-based routines require SPD inputs — a singular
matrix divides by a zero determinant/pivot and a non-SPD one takes
sqrt of a negative, both yielding silent NaNs (the same failure class
as the jnp.linalg paths these replace). Callers own the structural
guarantee — e.g. leg Jacobians away from kinematic singularities, CRBA
mass matrices, ADMM KKT systems with sigma/rho regularization.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def inv3(A):
    """Inverse of (..., 3, 3) by the adjugate formula (branch-free)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    M = jnp.stack([jnp.stack([A11, A12, A13], -1),
                   jnp.stack([A21, A22, A23], -1),
                   jnp.stack([A31, A32, A33], -1)], -2)
    return M / det[..., None, None]


def cholesky(M):
    """Lower Cholesky factor of SPD (..., n, n) by n unrolled
    right-looking rank-1 column sweeps (each a masked whole-matrix
    elementwise update — no scalar recurrences, no dynamic loops)."""
    n = M.shape[-1]
    dtype = M.dtype
    A = M
    cols = []
    for j in range(n):
        d = jnp.sqrt(A[..., j, j])
        # rows >= j of column j; zero above the diagonal (static mask)
        mask = jnp.asarray(np.arange(n) >= j, dtype)
        col = mask * A[..., :, j] / d[..., None]        # (..., n)
        cols.append(col)
        A = A - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, -1)


def _substitute(rows, diag, b, order):
    """Shared substitution sweep: rows(i) gives row i of the triangular
    system as (..., n); b is (..., n) [vector] or (..., n, k) [matrix];
    `order` is the row visiting order."""
    n = len(order)
    x = jnp.zeros_like(b)
    vec_rhs = b.ndim == diag.ndim
    for i in order:
        e = jnp.zeros(n, b.dtype).at[i].set(1.0)
        if vec_rhs:
            s = b[..., i] - jnp.sum(rows(i) * x, axis=-1)
            x = x + e * (s / diag[..., i])[..., None]
        else:
            s = b[..., i, :] - jnp.sum(rows(i)[..., None] * x, axis=-2)
            x = x + e[:, None] * (s / diag[..., i, None])[..., None, :]
    return x


def solve_lower(L, b):
    """x with L x = b for lower-triangular L (..., n, n), b (..., n) or
    (..., n, k): n unrolled forward-substitution rows, each a row-dot
    over the accumulated solution (zeros stand in for not-yet-solved
    entries, so the full-row dot is exact)."""
    n = L.shape[-1]
    diag = jnp.einsum("...ii->...i", L)
    return _substitute(lambda i: L[..., i, :], diag, b, range(n))


def solve_upper_t(L, b):
    """x with L' x = b (L lower-triangular): unrolled back substitution.
    Row i of L' is column i of L."""
    n = L.shape[-1]
    diag = jnp.einsum("...ii->...i", L)
    return _substitute(lambda i: L[..., :, i], diag, b,
                       range(n - 1, -1, -1))


def chol_solve(M, b):
    """x = M^-1 b for SPD M (..., n, n), b (..., n) or (..., n, k)."""
    L = cholesky(M)
    return solve_upper_t(L, solve_lower(L, b))


def spd_inverse(M):
    """M^-1 for SPD (..., n, n): W = L^-1 by forward substitution
    against the identity, then M^-1 = W' W (symmetric by construction)."""
    n = M.shape[-1]
    L = cholesky(M)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    W = solve_lower(L, eye)                             # (..., n, n)
    return jnp.einsum("...ki,...kj->...ij", W, W)
