"""Pallas TPU kernel for the batched ADMM QP iteration loop.

The XLA path (ops/qp.py) expresses each ADMM iteration as ~15 small ops
inside a lax.while_loop; at the controller's problem size (n=192 vars,
m=512 rows) every op is launch-latency / HBM-bound and the chip idles
(~600 solves/s regardless of batch size). This kernel runs the ENTIRE
iteration loop for a tile of problems inside one pallas_call with all
problem data resident in VMEM: K^-1, P and the vector state are read
from HBM exactly once per problem and every iteration is a couple of
MXU matmuls.

Two structural facts make the kernel MXU-shaped instead of a bag of
GEMVs:

1. **The constraint matrix A is SHARED across problems** (the MPC cone
   matrix is constant — core/mpc.py cone_matrix). OSQP's per-problem
   Ruiz equilibration would destroy that (A_scaled = E A D differs per
   problem), so the kernel runs the algebraically identical
   *preconditioned* ADMM in the ORIGINAL variables: the scaled iteration
   with (D, E, c) equals the unscaled iteration with diagonal
   sigma_vec = (sigma/c) D^-2 and rho_vec' = (1/c) E^2 rho_class —
   derivation: substitute x = D x_scaled into osqp's x-update and
   multiply through by (cD)^-1. With A shared, the two A-matvecs of a
   whole tile become real matmuls (TILE, m) @ (m, n) on the MXU.

2. **K^-1 is symmetric**, so the per-problem solve x = K^-1 b is a
   sublane-axis mult-reduce sum_i Kinv[t,i,j] b[t,i] that lands with the
   vector dimension on lanes — no per-iteration transposes anywhere.

Division of labor (the Mosaic toolchain here crashes on vector-valued
convergence bookkeeping carried through fori loops, so control stays
outside): the kernel runs a FIXED number of iterations; the wrapper
checks OSQP's unscaled residual termination in XLA (three matmuls, once
per round), applies OSQP's residual-based rho adaptation with
refactorization (osqp adapt_rho; src/MPC.cpp:527-540 settings), and
re-invokes the kernel warm-started until converged or out of budget.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qrw_tpu.ops import qp

HI = jax.lax.Precision.HIGHEST


def _admm_kernel(Kinv_ref, P_ref, A_ref, q_ref, l_ref, u_ref,
                 rho_ref, sig_ref, x0_ref, y0_ref,
                 x_ref, y_ref, z_ref, pri_ref, dua_ref, n1_ref, n2_ref,
                 *, alpha, n_iters, K_ref=None):
    """One tile: TILE problems, vectors laid out (TILE, dim); runs
    exactly n_iters ADMM steps, then computes OSQP's unscaled residual
    norms once (per-problem scalars broadcast over (TILE, n) rows —
    narrower shapes crash the Mosaic layout pass on this toolchain).

    With K_ref (the KKT matrix itself) the x-update applies ONE step of
    iterative refinement: xt = X b; xt += X (b - K xt). The solve error
    drops from ||I - K X|| to its square, which makes a STALE inverse
    from a previous cycle an exact-enough solver — the wrapper can then
    amortize refactorization over many warm cycles instead of paying a
    batched Cholesky (or Newton-Schulz matmuls) every call."""
    f32 = jnp.float32
    A = A_ref[:]              # (m, n) shared
    Kinv = Kinv_ref[:]        # (TILE, n, n) symmetric
    q = q_ref[:]              # (TILE, n)
    l = l_ref[:]              # (TILE, m)
    u = u_ref[:]
    rho = rho_ref[:]          # (TILE, m) diagonal rho'
    sig = sig_ref[:]          # (TILE, n) diagonal sigma'
    rho_inv = 1.0 / rho
    K = K_ref[:] if K_ref is not None else None

    def Amul(V):              # (TILE, n) -> (TILE, m): rows (A v_t)'
        return jax.lax.dot_general(
            V, A, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=HI)

    def Atmul(W):             # (TILE, m) -> (TILE, n): rows (A' w_t)'
        return jax.lax.dot_general(
            W, A, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=HI)

    def solveK(b):
        # sum_i Kinv[t,i,j] b[t,i]: K^-1 symmetric, sublane reduction
        # keeps the vector dim on lanes
        xt = jnp.sum(Kinv * b[:, :, None], axis=1)
        if K is not None:
            # two iterative-refinement steps (K symmetric): the solve
            # error drops from e = ||I - K Kinv|| to e^3, which holds a
            # cycles-stale inverse at f32 accuracy
            for _ in range(2):
                r = b - jnp.sum(K * xt[:, :, None], axis=1)
                xt = xt + jnp.sum(Kinv * r[:, :, None], axis=1)
        return xt

    x = x0_ref[:]             # (TILE, n)
    y = y0_ref[:]             # (TILE, m)
    z = Amul(x)

    def step(_, s):
        x, z, y = s
        b = sig * x - q + Atmul(rho * z - y)
        xt = solveK(b)
        zt = Amul(xt)
        xn = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        zn = jnp.clip(zr + y * rho_inv, l, u)
        yn = y + rho * (zr - zn)
        return xn, zn, yn

    x, z, y = jax.lax.fori_loop(0, n_iters, step, (x, z, y))
    x_ref[:] = x
    y_ref[:] = y
    z_ref[:] = z

    # one residual evaluation (termination handled by the wrapper)
    tile, n = q.shape
    P = P_ref[:]
    Ax = Amul(x)
    Px = jnp.sum(P * x[:, :, None], axis=1)      # P symmetric
    Aty = Atmul(y)
    amax = lambda V: jnp.broadcast_to(
        jnp.max(jnp.abs(V), axis=1, keepdims=True), (tile, n))
    pri_ref[:] = amax(Ax - z)
    dua_ref[:] = amax(Px + q + Aty)
    n1_ref[:] = jnp.maximum(amax(Ax), amax(z))       # eps_pri scale
    n2_ref[:] = jnp.maximum(amax(Px), amax(Aty))     # eps_dua scale (w/o q)


class PallasQPResult(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    iters: jnp.ndarray
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray
    converged: jnp.ndarray
    rho: jnp.ndarray         # (B, 1) adapted rho — carry to the next
                             # warm-started solve (osqp keeps its
                             # workspace rho between osqp_solve calls)
    precond: tuple           # (D, E, c) — reusable preconditioner
    kinv: jnp.ndarray        # (B, n, n) last K^-1 — warm-refactor seed
    kinv_rho: jnp.ndarray    # (B, 1) rho the last K^-1 was factored at


def _build_K(P, A, rho_vec, sig_vec, cone=None):
    """K = P + diag(sig) + A' diag(rho) A.

    With the MPC cone structure, A = [F; I] where F is block-diagonal
    with 5x3 blocks per (step, foot): A'RA collapses to 64 3x3 blocks
    plus the identity-row diagonal — no (B, m, n) einsum. With the
    support-reduced cone (qp.ReducedConeStructure) A = I (x) C: the same
    block collapse with no identity rows at all."""
    n = P.shape[-1]
    ii = np.arange(n)
    if isinstance(cone, qp.ReducedConeStructure):
        nb = cone.n_blocks
        C5 = jnp.asarray(cone.cone_rows(), P.dtype)          # (5, 3)
        rc = rho_vec.reshape(-1, nb, 5)
        blocks = jnp.einsum("ca,bkc,cd->bkad", C5, rc, C5)   # (B,nb,3,3)
        rows = (3 * np.repeat(np.arange(nb), 9)
                + np.tile(np.repeat(np.arange(3), 3), nb))
        cols = (3 * np.repeat(np.arange(nb), 9)
                + np.tile(np.arange(3), 3 * nb))
        K = P.at[:, rows, cols].add(blocks.reshape(P.shape[0], -1))
        K = K.at[:, ii, ii].add(sig_vec)
    elif cone is not None:
        mc = 20 * cone.n_steps
        nb = 4 * cone.n_steps
        C5 = jnp.asarray(cone.cone_rows(), P.dtype)          # (5, 3)
        rc = rho_vec[:, :mc].reshape(-1, nb, 5)
        blocks = jnp.einsum("ca,bkc,cd->bkad", C5, rc, C5)   # (B,nb,3,3)
        rows = (3 * np.repeat(np.arange(nb), 9)
                + np.tile(np.repeat(np.arange(3), 3), nb))
        cols = (3 * np.repeat(np.arange(nb), 9)
                + np.tile(np.arange(3), 3 * nb))
        K = P.at[:, rows, cols].add(blocks.reshape(P.shape[0], -1))
        K = K.at[:, ii, ii].add(sig_vec + rho_vec[:, mc:])
    else:
        AtRA = jnp.einsum("ma,bm,mc->bac", A, rho_vec, A)
        K = P + AtRA
        K = K.at[:, ii, ii].add(sig_vec)
    return K


def _ns_refine_kernel(K_ref, X_ref, out_ref, res_ref, *, ns_iters, tile):
    """Fused Newton-Schulz refactorization: X <- X(2I - KX) x ns_iters
    plus the residual ||I - K X||_max, entirely in VMEM.

    The XLA formulation runs 2*ns_iters + 1 BATCHED (B, n, n) matmuls,
    each a full HBM round-trip of ~3 n^2 B floats with poor MXU
    pipelining on small per-problem shapes (~measured 6x off peak at
    n=192, B=4096). Here K and X are read from HBM once per problem and
    all matmuls hit the MXU back-to-back from VMEM. Per-problem 2D dots
    (static unroll over the tile) — Mosaic lowers them straight to the
    MXU without batched-dot support."""
    f32 = jnp.float32
    n = K_ref.shape[-1]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)
    for t in range(tile):
        K = K_ref[t]                       # (n, n)
        X = X_ref[t]
        for _ in range(ns_iters):
            KX = jnp.dot(K, X, preferred_element_type=f32, precision=HI)
            X = 2.0 * X - jnp.dot(X, KX, preferred_element_type=f32,
                                  precision=HI)
        KX = jnp.dot(K, X, preferred_element_type=f32, precision=HI)
        out_ref[t] = X
        # per-problem scalar broadcast over a full row — narrower
        # output shapes crash the Mosaic layout pass on this toolchain
        res_ref[t] = jnp.broadcast_to(jnp.max(jnp.abs(KX - eye)), (n,))


def _ns_refine(K, X0, ns_iters: int, tile: int = 8,
               interpret: bool = False):
    """(X_refined, resid) via the fused kernel; inputs (B, n, n)."""
    B, n, _ = K.shape
    pad = (-B) % tile
    if pad:
        padder = lambda M: jnp.concatenate(
            [M, jnp.broadcast_to(jnp.eye(n, dtype=M.dtype),
                                 (pad, n, n))], axis=0)
        K = padder(K)
        X0 = padder(X0)
    Bp = B + pad
    spec = pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    X, res = pl.pallas_call(
        functools.partial(_ns_refine_kernel, ns_iters=int(ns_iters),
                          tile=int(tile)),
        grid=(Bp // tile,),
        in_specs=[spec, spec],
        out_specs=[spec, pl.BlockSpec((tile, n), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(K, X0)
    X = 0.5 * (X + X.transpose(0, 2, 1))   # NS preserves symmetry up to
    return X[:B], res[:B, 0]               # rounding; re-center in XLA


def _chol_inv(K):
    n = K.shape[-1]
    C = jnp.linalg.cholesky(K)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), K.shape)
    return jax.scipy.linalg.cho_solve((C, True), eye)


def _factor(K, kinv_init=None, ns_iters: int = 3, seed_scale=None,
            interpret: bool = False):
    """K^-1 from the assembled KKT matrix. Cold: SPD Cholesky + solve.
    Warm (kinv_init given): a few Newton-Schulz iterations
    X <- X(2I - KX) refine the previous cycle's inverse — pure batched
    MXU matmuls, quadratically convergent when successive-cycle K
    changes are small. seed_scale (B, 1): rho_old / rho_new ratio — K is
    dominated by the A'RA term (equality rows carry 1e3 x rho), which
    scales linearly in rho, so rescaling the seed keeps ||I - K X0|| < 1
    across between-call rho adaptations.

    NS only converges when ||I - K X0|| < 1. Between real controller
    cycles the STANCE PATTERN rolls one MPC step, flipping whole rho-class
    rows (loose <-> equality, a 1e9x change) — K then differs too much
    and NS diverges to NaN. The refinement is therefore guarded: the
    residual ||I - K X|| is checked per problem and any failed problem
    falls back to a fresh Cholesky factorization (taken via lax.cond so
    the no-straggler case never pays for it)."""
    if kinv_init is not None:
        B = K.shape[0]
        X = kinv_init
        if seed_scale is not None:
            X = X * seed_scale[:, :, None]
        # fused NS iterations + residual ||I - K X|| in one Pallas call
        X, resid = _ns_refine(K, X, ns_iters, interpret=interpret)
        resid = jnp.where(jnp.isfinite(resid), resid, jnp.inf)
        bad = resid > 1e-2
        # Fixed-capacity rescue: Cholesky-refactor only the worst seeds
        # (a small static top-k slice, not the whole batch — a handful of
        # stragglers per cycle must not cost a full batched Cholesky).
        # Overflow beyond the capacity stays on its NS seed and simply
        # keeps iterating next cycle.
        cap = int(min(B, max(8, B // 32)))
        _, idx = jax.lax.top_k(resid, cap)
        Xr = _chol_inv(K[idx])
        fix = bad[idx]
        X = X.at[idx].set(jnp.where(fix[:, None, None], Xr, X[idx]))
        return X
    return _chol_inv(K)


def _run_kernel(Kinv, P, A, q, l, u, rho_vec, sig_vec, xw, yw,
                alpha: float, n_iters: int, tile: int, interpret: bool,
                K=None):
    dtype = jnp.float32
    B, n = q.shape
    m = l.shape[-1]

    pad = (-B) % tile
    if pad:
        padded = lambda X: jnp.concatenate(
            [X, jnp.broadcast_to(X[:1], (pad,) + X.shape[1:])], axis=0)
        Kinv, P, q, l, u, rho_vec, sig_vec, xw, yw = map(
            padded, (Kinv, P, q, l, u, rho_vec, sig_vec, xw, yw))
        if K is not None:
            K = padded(K)
    Bp = B + pad
    grid = (Bp // tile,)

    def spec3(d1, d2):
        return pl.BlockSpec((tile, d1, d2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec2(d):
        return pl.BlockSpec((tile, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    shared = pl.BlockSpec((m, n), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)

    if K is not None:
        def kernel(Kinv_ref, K_ref, *refs):
            _admm_kernel(Kinv_ref, *refs, alpha=float(alpha),
                         n_iters=int(n_iters), K_ref=K_ref)
        in_specs = [spec3(n, n), spec3(n, n), spec3(n, n), shared,
                    spec2(n), spec2(m), spec2(m),
                    spec2(m), spec2(n), spec2(n), spec2(m)]
        inputs = (Kinv, K, P, A, q, l, u, rho_vec, sig_vec, xw, yw)
    else:
        kernel = functools.partial(_admm_kernel, alpha=float(alpha),
                                   n_iters=int(n_iters))
        in_specs = [spec3(n, n), spec3(n, n), shared,
                    spec2(n), spec2(m), spec2(m),
                    spec2(m), spec2(n), spec2(n), spec2(m)]
        inputs = (Kinv, P, A, q, l, u, rho_vec, sig_vec, xw, yw)

    x_out, y_out, z_out, pri, dua, n1, n2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec2(n), spec2(m), spec2(m),
                   spec2(n), spec2(n), spec2(n), spec2(n)],
        out_shape=[jax.ShapeDtypeStruct((Bp, n), dtype),
                   jax.ShapeDtypeStruct((Bp, m), dtype),
                   jax.ShapeDtypeStruct((Bp, m), dtype),
                   jax.ShapeDtypeStruct((Bp, n), dtype),
                   jax.ShapeDtypeStruct((Bp, n), dtype),
                   jax.ShapeDtypeStruct((Bp, n), dtype),
                   jax.ShapeDtypeStruct((Bp, n), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    sl = slice(0, B)
    return (x_out[sl], y_out[sl], z_out[sl],
            pri[sl, 0], dua[sl, 0], n1[sl, 0], n2[sl, 0])


def solve(P, q, A, l, u, settings: qp.QPSettings = qp.QPSettings(),
          x0=None, y0=None, tile: int = 16, schedule=None,
          cone: qp.ConeStructure = None, precond=None, rho_init=None,
          kinv_init=None, kinv_rho=None, refactor: str = "ns",
          interpret: bool = False,
          early_exit: bool = False) -> PallasQPResult:
    """Batched QP solve with the fused Pallas ADMM kernel.

    P (B, n, n); q (B, n); A (m, n) SHARED across the batch; l/u (B, m).
    Matches ops/qp.solve semantics: fixed rho per round, OSQP's
    residual-based rho adaptation + refactorization between rounds.
    `schedule` is the per-round iteration budget — default puts a SHORT
    first round before the first adaptation (the default rho=0.1 is far
    from optimal for the MPC problems; OSQP burns its whole first
    adaptive_rho_interval discovering that), then `adaptive_rho_interval`
    per round up to max_iter. Warm starts (x0/y0) pass through unscaled.

    `precond` = (D, E, c) reuses the Ruiz preconditioner from a previous
    solve on a nearby problem and skips the in-call equilibration — any
    diagonal preconditioner is algorithmically exact (termination is
    evaluated unscaled), so this trades nothing but conditioning slack.
    `rho_init` (B, 1) carries the adapted rho from a previous solve.

    `early_exit` wraps every round after the first in lax.cond on
    "any problem still unconverged": a warm-started batch that meets
    the OSQP tolerances in round one pays for one round only (the
    rescue stage's policy — its warm lanes converge in the first round
    and the later rounds exist for cold-restart lanes).

    `refactor` controls how K^-1 is obtained when kinv_init is given:
      "ns"    guarded Newton-Schulz refinement + Cholesky fallback;
      "chol"  fresh batched Cholesky (robust; use after structural
              changes such as a gait roll);
      "stale" reuse kinv_init (rho-rescaled) as a preconditioner and run
              the kernel with one iterative-refinement step per x-update
              (the solve error is squared, so a slightly stale inverse
              is exact to f32 — correctness is guaranteed either way by
              the unscaled residual termination). Cheapest: factor work
              is one guard matmul — the seed still passes _factor's
              residual check so problems whose K moved structurally
              (gait roll) take the fixed-capacity Cholesky rescue
              instead of diverging. NOTE ||I - K X|| is a necessary but
              not sufficient seed metric on these kappa~1e7 systems: a
              passing seed can still carry ~0.5% inverse error, and the
              refinement noise floor then stalls a fraction of chained
              problems just above eps=1e-4 (measured conv ~0.65-0.94
              over 4 chained cycles vs 1.0 for "ns"). Use for cheap
              safety-net cycles only; "ns" is the production policy of
              THIS full-size path. (For fleet throughput the lane-major
              phase solver, ops/qp_phase, supersedes all of these —
              it needs no per-problem factorization at all.)
    """
    dtype = jnp.float32
    P = jnp.asarray(P, dtype)
    q = jnp.asarray(q, dtype)
    A = jnp.asarray(A, dtype)
    l = jnp.asarray(l, dtype)
    u = jnp.asarray(u, dtype)
    assert A.ndim == 2, "pallas path requires a shared constraint matrix"
    B, n = q.shape
    s = settings
    if schedule is None:
        interval = min(s.adaptive_rho_interval, s.max_iter)
        first = min(50, interval)
        schedule = [first]
        while sum(schedule) < s.max_iter:
            schedule.append(min(interval, s.max_iter - sum(schedule)))

    with jax.default_matmul_precision("highest"):
        if precond is not None:
            D, E, c = precond
        elif s.scaling_iters > 0:
            D, E, c = qp.ruiz_equilibrate(P, q, A, s.scaling_iters)
        else:
            D = jnp.ones_like(q)
            E = jnp.ones_like(l)
            c = jnp.ones((B, 1), dtype)
        sig_vec = (s.sigma / c) / (D * D)
        Escaled_l, Escaled_u = E * l, E * u
        EE_over_c = E * E / c

    def rho_to_vec(rho):
        rho_class = qp.rho_vec_for_bounds(Escaled_l, Escaled_u, rho)
        return rho_class * EE_over_c

    # Non-finite warm starts (a diverged previous cycle) reset to cold
    # zeros instead of propagating NaN through every later solve.
    x = (jnp.zeros_like(q) if x0 is None
         else jnp.where(jnp.isfinite(x0), x0, 0.0).astype(dtype))
    y = (jnp.zeros_like(l) if y0 is None
         else jnp.where(jnp.isfinite(y0), y0, 0.0).astype(dtype))
    rho = (jnp.full((B, 1), s.rho, dtype) if rho_init is None
           else jnp.asarray(rho_init, dtype))
    nrm_q = jnp.max(jnp.abs(q), axis=1)

    iters = jnp.zeros((B,), jnp.int32)
    conv = jnp.zeros((B,), bool)

    def run_round(r, n_iters, x, y, rho, conv, iters):
        rho_vec = rho_to_vec(rho)
        with jax.default_matmul_precision("highest"):
            K = _build_K(P, A, rho_vec, sig_vec, cone)
            stale = (refactor == "stale" and r == 0
                     and kinv_init is not None)
            if stale:
                # Guarded stale reuse: zero Newton-Schulz iterations
                # still runs _factor's residual check + fixed-capacity
                # Cholesky rescue (one K@X matmul). Without the guard a
                # structural change between calls (gait roll flips
                # equality rows ~1e9x in rho) leaves an invalid inverse
                # whose in-kernel refinement diverges to NaN and poisons
                # every later warm-started cycle.
                scale = ((kinv_rho / rho) if kinv_rho is not None
                         else None)
                Kinv = _factor(K, kinv_init=kinv_init, ns_iters=0,
                               seed_scale=scale, interpret=interpret)
            else:
                seed_scale = None
                use_seed = (refactor == "ns" and r == 0
                            and kinv_init is not None)
                if use_seed and kinv_rho is not None:
                    seed_scale = kinv_rho / rho
                Kinv = _factor(K, kinv_init=kinv_init if use_seed
                               else None, seed_scale=seed_scale,
                               interpret=interpret)
        x2, y2, z, pri, dua, n1, n2 = _run_kernel(
            Kinv, P, A, q, l, u, rho_vec, sig_vec, x, y,
            s.alpha, n_iters, tile, interpret,
            K=K if stale else None)
        prev_conv = conv
        eps_p = s.eps_abs + s.eps_rel * n1
        eps_d = s.eps_abs + s.eps_rel * jnp.maximum(n2, nrm_q)
        conv2 = conv | ((pri <= eps_p) & (dua <= eps_d))
        iters2 = iters + jnp.where(prev_conv, 0, n_iters)
        if r + 1 < len(schedule):
            # osqp compute_rho_estimate from the kernel's norms. NOT
            # applied after the final round: a rho change between
            # warm-started calls breaks the Newton-Schulz warm
            # refactorization (K's dependence on rho is only partially
            # linear — measured conv drops from 0.97 to <0.93 with any
            # between-call adaptation variant), while keeping rho fixed
            # lets stragglers simply continue converging next cycle.
            denom_p = jnp.maximum(n1, 1e-30)
            denom_d = jnp.maximum(jnp.maximum(n2, nrm_q), 1e-30)
            ratio = (pri / denom_p) / jnp.maximum(dua / denom_d, 1e-30)
            scale = jnp.sqrt(ratio)[:, None]
            want = ((scale > s.adaptive_rho_tolerance)
                    | (scale < 1.0 / s.adaptive_rho_tolerance))
            want = want & ~conv2[:, None]
            rho2 = jnp.where(
                want, jnp.clip(rho * scale, qp.RHO_MIN, qp.RHO_MAX),
                rho)
        else:
            rho2 = rho
        # last element: the rho this round's factor was computed at
        # (the kinv_rho carry semantics for NS-warm chains)
        return (x2, y2, z, pri, dua, conv2, iters2, rho2, Kinv, rho)

    z = pri = dua = None
    Kinv_out = None
    kinv_at = None
    for r, n_iters in enumerate(schedule):
        if early_exit and r > 0:
            # skip whole rounds (factor + kernel) once every problem
            # meets the OSQP tolerances — the warm-start fast path
            def round_fn(args, _r=r, _n=n_iters):
                x, y, rho, conv, iters = args
                return run_round(_r, _n, x, y, rho, conv, iters)

            def skip_fn(args, _z=z, _p=pri, _d=dua, _K=Kinv_out,
                        _ka=kinv_at):
                x, y, rho, conv, iters = args
                return (x, y, _z, _p, _d, conv, iters, rho, _K, _ka)

            (x, y, z, pri, dua, conv, iters, rho, Kinv_out,
             kinv_at) = jax.lax.cond(jnp.all(conv), skip_fn, round_fn,
                                     (x, y, rho, conv, iters))
        else:
            (x, y, z, pri, dua, conv, iters, rho, Kinv_out,
             kinv_at) = run_round(r, n_iters, x, y, rho, conv, iters)
    return PallasQPResult(x=x, y=y, z=z, iters=iters, pri_res=pri,
                          dua_res=dua, converged=conv, rho=rho,
                          precond=(D, E, c), kinv=Kinv_out,
                          kinv_rho=kinv_at)
