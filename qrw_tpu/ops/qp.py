"""Batched dense QP solver with OSQP ADMM semantics.

Replaces the reference's sparse-CSC + OSQP machinery (src/MPC.cpp:501-564,
src/QPWBC.cpp:230-267, src/st_to_cc.cpp) with a dense, fixed-shape,
batch-first ADMM that jits and vmaps: at the reference's problem sizes
(<=384 variables) dense linear algebra on the MXU beats any sparse scheme,
and one K^-1 factorization turns every iteration into a batched matvec.

Semantics mirror OSQP so the reference's solver settings carry over:
  * modified Ruiz equilibration (10 iterations) with cost normalization —
    osqp scaling.c — computed in-graph per problem;
  * splitting  min 1/2 x'Px + q'x  s.t.  l <= Ax <= u
    with sigma-regularized x-update, relaxation alpha, per-row rho
    (equality rows rho*1e3, loose rows RHO_MIN — osqp set_rho_vec);
  * residual-based adaptive rho with refactorization (osqp adapt_rho),
    clipped to [RHO_MIN, RHO_MAX];
  * termination on UNSCALED primal/dual residuals with absolute+relative
    tolerances (osqp is_solved, scaled_termination=0), evaluated per
    problem; the batch runs until every problem converges or max_iter.

Everything is branch-free under jit: the iteration loop is a
lax.while_loop over fixed-shape state with convergence masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qrw_tpu.ops import lin

RHO_MIN = 1e-6
RHO_MAX = 1e6
RHO_EQ_SCALE = 1e3       # osqp RHO_EQ_OVER_RHO_INEQ
LOOSE_BOUND = 1e18
MIN_SCALING = 1e-4       # osqp MIN_SCALING
MAX_SCALING = 1e4


class ConeStructure(NamedTuple):
    """Static description of the MPC cone constraint matrix
    A = [F; I] (cone_matrix, core/mpc.py): F is block-diagonal with the
    5x3 friction block C per (step, foot) — every row touches exactly one
    foot's 3 force components — and I is the 12N activation identity.
    Passing this to solve() swaps the dense A matvecs / A'RA build for
    structured per-block forms: O(15) coefficients per block instead of
    dense (32N x 12N) GEMMs, and a block-diagonal 3x3 A'RA instead of an
    O(m n^2) einsum."""
    n_steps: int
    mu: float

    @property
    def n(self) -> int:
        return 12 * self.n_steps

    @property
    def m(self) -> int:
        return 32 * self.n_steps

    def cone_rows(self) -> np.ndarray:
        """(5, 3) block C (src/MPC.cpp:135-146)."""
        return np.array([
            [1.0, 0.0, -self.mu],
            [-1.0, 0.0, -self.mu],
            [0.0, 1.0, -self.mu],
            [0.0, -1.0, -self.mu],
            [0.0, 0.0, -1.0],
        ])


class ReducedConeStructure(NamedTuple):
    """Static description of the SUPPORT-REDUCED cone constraint matrix
    A = I_blocks (x) C: one 5x3 friction block per retained stance
    (step, foot) pair and NOTHING else. The reduction (core/mpc.py
    support_indices) eliminates every swing-foot force variable (their
    activation rows pin them to exactly zero — an equality the optimum
    must satisfy, so elimination is exact) and drops the stance
    activation rows (l=-inf, u=+inf: vacuous). What remains has no
    equality rows at all, so the OSQP rho classes collapse to a single
    uniform rho — conditioning improves by the 1e3 equality-scale factor
    and every row of A is a friction row."""
    n_blocks: int
    mu: float

    @property
    def n(self) -> int:
        return 3 * self.n_blocks

    @property
    def m(self) -> int:
        return 5 * self.n_blocks

    def cone_rows(self) -> np.ndarray:
        """(5, 3) block C (src/MPC.cpp:135-146)."""
        return np.array([
            [1.0, 0.0, -self.mu],
            [-1.0, 0.0, -self.mu],
            [0.0, 1.0, -self.mu],
            [0.0, -1.0, -self.mu],
            [0.0, 0.0, -1.0],
        ])

    def matrix(self) -> np.ndarray:
        """(5B, 3B) dense A = I (x) C."""
        return np.kron(np.eye(self.n_blocks), self.cone_rows())


class QPSettings(NamedTuple):
    sigma: float = 1e-6
    alpha: float = 1.6
    rho: float = 0.1
    eps_abs: float = 1e-6
    eps_rel: float = 1e-6
    max_iter: int = 1000
    check_every: int = 25          # residual/termination check cadence
    adaptive_rho_interval: int = 200
    adaptive_rho_tolerance: float = 5.0
    scaling_iters: int = 10        # Ruiz iterations; 0 disables scaling


class QPSolution(NamedTuple):
    x: jnp.ndarray          # (..., n) primal solution
    y: jnp.ndarray          # (..., m) dual solution
    z: jnp.ndarray          # (..., m) projected constraint value
    iters: jnp.ndarray      # (...,) iterations executed
    pri_res: jnp.ndarray    # (...,) final primal residual (inf-norm)
    dua_res: jnp.ndarray    # (...,) final dual residual (inf-norm)
    converged: jnp.ndarray  # (...,) bool


def rho_vec_for_bounds(l, u, rho):
    """Per-row rho classes exactly as osqp's set_rho_vec: loose rows get
    RHO_MIN, equality rows rho*1e3, plain inequalities rho."""
    loose = (l < -LOOSE_BOUND) & (u > LOOSE_BOUND)
    eq = (u - l) < 1e-10
    return jnp.where(loose, RHO_MIN, jnp.where(eq, RHO_EQ_SCALE * rho, rho))


def _inf_norm(v):
    return jnp.max(jnp.abs(v), axis=-1)


def _limit(s):
    return jnp.clip(s, MIN_SCALING, MAX_SCALING)


def ruiz_equilibrate(P, q, A, iters: int):
    """Modified Ruiz equilibration with cost scaling (osqp scaling.c).

    P: (..., n, n); q: (..., n); A: (m, n) shared or (..., m, n).
    Returns (D (..., n), E (..., m), c (..., 1)) such that the scaled
    problem uses P' = c D P D, q' = c D q, A' = E A D."""
    dtype = q.dtype
    n = q.shape[-1]
    m = A.shape[-2]
    batch = jnp.broadcast_shapes(P.shape[:-2], q.shape[:-1])
    D = jnp.ones(batch + (n,), dtype)
    E = jnp.ones(batch + (m,), dtype)
    c = jnp.ones(batch + (1,), dtype)
    absA = jnp.abs(A)
    absP = jnp.abs(P)

    for _ in range(iters):
        # scaled |P| and |A| column/row norms without materializing them
        colP = jnp.max(absP * D[..., None, :] * D[..., :, None] * c[..., None],
                       axis=-2)                                  # (..., n)
        sA = absA * D[..., None, :] * E[..., :, None]
        colA = jnp.max(sA, axis=-2)                              # (..., n)
        rowA = jnp.max(sA, axis=-1)                              # (..., m)
        col = jnp.maximum(colP, colA)
        dD = 1.0 / jnp.sqrt(_limit(col))
        dE = 1.0 / jnp.sqrt(_limit(rowA))
        D = D * dD
        E = E * dE
        # cost scaling
        colP2 = jnp.max(absP * D[..., None, :] * D[..., :, None]
                        * c[..., None], axis=-2)
        qn = _inf_norm(q * D * c[..., 0:1] if q.ndim else q)[..., None]
        gamma = 1.0 / _limit(jnp.maximum(jnp.mean(colP2, axis=-1,
                                                  keepdims=True), qn))
        c = c * gamma
    return D, E, c


class _LoopState(NamedTuple):
    x: jnp.ndarray
    z: jnp.ndarray
    y: jnp.ndarray
    Kinv: jnp.ndarray
    rho: jnp.ndarray        # (..., 1) scalar rho per problem
    it: jnp.ndarray
    pri: jnp.ndarray
    dua: jnp.ndarray
    done: jnp.ndarray


def solve(P, q, A, l, u, settings: QPSettings = QPSettings(),
          x0=None, y0=None, cone: "ConeStructure" = None) -> QPSolution:
    """Solve a batch of dense QPs. All arrays broadcast over leading batch
    dims: P (..., n, n), q (..., n), A (..., m, n) or (m, n) shared,
    l/u (..., m). Warm start with x0/y0 (OSQP keeps the previous solution
    between successive osqp_solve calls; pass the previous x/y for the
    same semantics). Infeasible/unbounded detection is not implemented —
    problems are assumed feasible (true for all controller QPs).

    cone: optional ConeStructure matching A — enables the structured
    fast path for the matvecs and the A'RA factorization term (identical
    semantics, different op order => results match to fp tolerance)."""
    # TPU matmuls default to bf16 passes; ADMM needs true f32 accumulate
    # to reach 1e-4..1e-6 residuals, so force full precision throughout.
    with jax.default_matmul_precision("highest"):
        return _solve(P, q, A, l, u, settings, x0, y0, cone)


def _solve(P, q, A, l, u, settings, x0, y0, cone=None) -> QPSolution:
    dtype = q.dtype
    n = q.shape[-1]
    m = l.shape[-1]
    batch = jnp.broadcast_shapes(P.shape[:-2], q.shape[:-1], l.shape[:-1])
    s = settings

    P = jnp.broadcast_to(P, batch + (n, n))
    q = jnp.broadcast_to(q, batch + (n,))
    l = jnp.broadcast_to(l, batch + (m,))
    u = jnp.broadcast_to(u, batch + (m,))
    shared_A = A.ndim == 2

    # ---- Ruiz equilibration ------------------------------------------------
    if s.scaling_iters > 0:
        D, E, c = ruiz_equilibrate(P, q, A, s.scaling_iters)
    else:
        D = jnp.ones(batch + (n,), dtype)
        E = jnp.ones(batch + (m,), dtype)
        c = jnp.ones(batch + (1,), dtype)
    Ps = P * D[..., None, :] * D[..., :, None] * c[..., None]
    qs = q * D * c
    ls = E * l
    us = E * u

    if cone is not None:
        # ---- structured scaled operators (As = E A D in block form) ------
        nb = 4 * cone.n_steps                          # foot-step blocks
        mc = 20 * cone.n_steps                         # cone rows
        Cb = jnp.asarray(cone.cone_rows(), dtype)      # (5, 3)
        D4 = D.reshape(batch + (nb, 3))
        E_cone = E[..., :mc].reshape(batch + (nb, 5))
        idc = E[..., mc:] * D                          # (..., n)
        Cs = (Cb * E_cone[..., :, :, None] * D4[..., :, None, :])
        # (..., nb, 5, 3)

        def Amul(x):
            x4 = x.reshape(batch + (nb, 3))
            yc = jnp.einsum("...kca,...ka->...kc", Cs, x4)
            return jnp.concatenate(
                [yc.reshape(batch + (mc,)), idc * x], axis=-1)

        def Atmul(y):
            yc = y[..., :mc].reshape(batch + (nb, 5))
            xc = jnp.einsum("...kca,...kc->...ka", Cs, yc)
            return xc.reshape(batch + (n,)) + idc * y[..., mc:]
    else:
        def Amul(x):
            """scaled A' x = E * (A @ (D * x))"""
            if shared_A:
                return E * jnp.einsum("...n,mn->...m", D * x, A)
            return E * jnp.einsum("...mn,...n->...m", A, D * x)

        def Atmul(y):
            if shared_A:
                return D * jnp.einsum("...m,mn->...n", E * y, A)
            return D * jnp.einsum("...mn,...m->...n", A, E * y)

    def factor(rho):
        rv = rho_vec_for_bounds(ls, us, rho)          # (..., m)
        if cone is not None:
            rvc = rv[..., :mc].reshape(batch + (nb, 5))
            blocks = jnp.einsum("...kca,...kc,...kcd->...kad",
                                Cs, rvc, Cs)           # (..., nb, 3, 3)
            dn = idc * idc * rv[..., mc:]              # identity-row diag
            rows = (3 * np.repeat(np.arange(nb), 9)
                    + np.tile(np.repeat(np.arange(3), 3), nb))
            cols = (3 * np.repeat(np.arange(nb), 9)
                    + np.tile(np.arange(3), 3 * nb))
            K = Ps + s.sigma * jnp.eye(n, dtype=dtype)
            K = K.at[..., rows, cols].add(
                blocks.reshape(batch + (9 * nb,)))
            dr = np.arange(n)
            K = K.at[..., dr, dr].add(dn)
        else:
            w = rv * E * E
            if shared_A:
                AtRA = jnp.einsum("ma,...m,mb->...ab", A, w, A)
            else:
                AtRA = jnp.einsum("...ma,...m,...mb->...ab", A, w, A)
            AtRA = AtRA * D[..., None, :] * D[..., :, None]
            K = Ps + AtRA + s.sigma * jnp.eye(n, dtype=dtype)
        # K is SPD. Small orders (the 12-var WBC QP) use the fully
        # unrolled Cholesky inverse (ops/lin.py) — elementwise over the
        # batch, ~100x the batched LAPACK-style path on TPU; large
        # orders (the 144-var MPC QP) keep jnp.linalg, whose blocked
        # factorization amortizes at that size and whose unrolled form
        # would blow up trace size as n^3.
        if n <= 32:
            Kinv = lin.spd_inverse(K)
        else:
            C = jnp.linalg.cholesky(K)
            eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), K.shape)
            Kinv = jax.scipy.linalg.cho_solve((C, True), eye)
        return Kinv, rv

    rho0 = jnp.full(batch + (1,), s.rho, dtype)
    Kinv, _ = factor(rho0)

    # warm start (scale into the equilibrated space)
    if x0 is None:
        x = jnp.zeros(batch + (n,), dtype)
    else:
        x = jnp.broadcast_to(x0, batch + (n,)) / D
    if y0 is None:
        y = jnp.zeros(batch + (m,), dtype)
    else:
        y = jnp.broadcast_to(y0, batch + (m,)) * c / E
    z = Amul(x)

    # Amul/Atmul already apply the D/E scaling, so the ADMM below runs
    # fully in the equilibrated space.
    def admm_step(st: _LoopState) -> _LoopState:
        rv = rho_vec_for_bounds(ls, us, st.rho)
        b = s.sigma * st.x - qs + Atmul(rv * st.z - st.y)
        xt = jnp.einsum("...ab,...b->...a", st.Kinv, b)
        zt = Amul(xt)
        xn = s.alpha * xt + (1 - s.alpha) * st.x
        z_rel = s.alpha * zt + (1 - s.alpha) * st.z
        zn = jnp.clip(z_rel + st.y / rv, ls, us)
        yn = st.y + rv * (z_rel - zn)
        keep = st.done[..., None]
        return st._replace(x=jnp.where(keep, st.x, xn),
                           z=jnp.where(keep, st.z, zn),
                           y=jnp.where(keep, st.y, yn))

    def residuals(st: _LoopState):
        """Unscaled residuals and tolerances (osqp scaled_termination=0)."""
        Ax_s = Amul(st.x)
        Px_s = jnp.einsum("...ab,...b->...a", Ps, st.x)
        Aty_s = Atmul(st.y)
        cinv = 1.0 / c
        Ax_u = Ax_s / E
        z_u = st.z / E
        Px_u = cinv * Px_s / D
        Aty_u = cinv * Aty_s / D
        q_u = qs / D * cinv
        pri = _inf_norm(Ax_u - z_u)
        dua = _inf_norm(Px_u + q_u + Aty_u)
        eps_pri = s.eps_abs + s.eps_rel * jnp.maximum(_inf_norm(Ax_u),
                                                      _inf_norm(z_u))
        eps_dua = s.eps_abs + s.eps_rel * jnp.maximum(
            jnp.maximum(_inf_norm(Px_u), _inf_norm(Aty_u)), _inf_norm(q_u))
        return pri, dua, eps_pri, eps_dua, Ax_u, z_u, Px_u, Aty_u, q_u

    n_checks = (s.max_iter + s.check_every - 1) // s.check_every
    adapt_mod = max(1, s.adaptive_rho_interval // s.check_every)

    def outer_cond(carry):
        st, chk = carry
        return (chk < n_checks) & ~jnp.all(st.done)

    def outer_body(carry):
        st, chk = carry
        st = lax.fori_loop(0, s.check_every, lambda _, t: admm_step(t), st)
        pri, dua, eps_pri, eps_dua, Ax_u, z_u, Px_u, Aty_u, q_u = \
            residuals(st)
        conv = (pri <= eps_pri) & (dua <= eps_dua)
        done = st.done | conv
        st = st._replace(it=jnp.where(st.done, st.it,
                                      st.it + s.check_every),
                         pri=jnp.where(st.done, st.pri, pri),
                         dua=jnp.where(st.done, st.dua, dua),
                         done=done)

        def adapt(st):
            denom_p = jnp.maximum(jnp.maximum(_inf_norm(Ax_u),
                                              _inf_norm(z_u)), 1e-30)
            denom_d = jnp.maximum(jnp.maximum(
                jnp.maximum(_inf_norm(Px_u), _inf_norm(Aty_u)),
                _inf_norm(q_u)), 1e-30)
            ratio = (pri / denom_p) / jnp.maximum(dua / denom_d, 1e-30)
            scale = jnp.sqrt(ratio)[..., None]
            want = (scale > s.adaptive_rho_tolerance) | \
                   (scale < 1.0 / s.adaptive_rho_tolerance)
            want = want & ~st.done[..., None]
            rho_new = jnp.where(want,
                                jnp.clip(st.rho * scale, RHO_MIN, RHO_MAX),
                                st.rho)
            Kinv_new, _ = factor(rho_new)
            any_change = want[..., 0]
            Kinv_new = jnp.where(any_change[..., None, None],
                                 Kinv_new, st.Kinv)
            return st._replace(rho=rho_new, Kinv=Kinv_new)

        st = lax.cond(((chk + 1) % adapt_mod) == 0, adapt, lambda t: t, st)
        return st, chk + 1

    init = _LoopState(
        x=x, z=z, y=y, Kinv=Kinv, rho=rho0,
        it=jnp.zeros(batch, jnp.int32),
        pri=jnp.full(batch, jnp.inf, dtype),
        dua=jnp.full(batch, jnp.inf, dtype),
        done=jnp.zeros(batch, bool),
    )
    st, _ = lax.while_loop(outer_cond, outer_body,
                           (init, jnp.asarray(0, jnp.int32)))
    # unscale the solution
    x_out = D * st.x
    y_out = E * st.y / c
    z_out = st.z / E
    return QPSolution(x=x_out, y=y_out, z=z_out, iters=st.it,
                      pri_res=st.pri, dua_res=st.dua, converged=st.done)
