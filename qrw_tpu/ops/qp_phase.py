"""Phase-grouped, lane-major, matrix-free MPC QP solver.

The throughput path for fleets of support-homogeneous MPC problems (a
trot has 16 phase classes — one per gait offset). This solver is the
TPU-native endpoint of the design line that started from the reference's
sparse OSQP (src/MPC.cpp:501-564): after condensing (core/mpc.py) and
support reduction (swing forces eliminated, no equality rows), the last
per-problem matrix work is removed too:

1. **Shared proximal metric.** The ADMM x-update solves K_b x = rhs with
   K_b = H_b + sigma I + rho A'A. Instead of factoring per problem, the
   update runs one step of the PROXIMAL iteration
        x+ = x - Kbar^-1 (H_b x + q_b + A'(rho (A x - z) + y))
   with ONE SHARED Kbar per phase class, built from a nominal problem
   with margin: Kbar = margin*Hbar + sigma I + rho A'A. This is exactly
   ADMM with an extra prox term  1/2 ||x - x^k||^2_M,  M = Kbar - K_b
   (positive semidefinite by the margin), so convergence is preserved —
   and measured iteration counts MATCH the exact per-problem solve on
   controller batches (the problems differ only through yaw/lever
   perturbations of H). Termination is evaluated on true per-problem
   residuals, so metric slack can only cost iterations, never accuracy.

2. **Matrix-free H_b x.** H_b = Gr' W Gr + w_force I is never formed:
   Gr x and Gr' v decompose into per-slot 3-vectors against the stance
   input blocks BlS (elementwise over lanes) and prefix sums over the
   horizon. The prefix sums are CONSTANT (N, N) matrices (L lower-
   triangular ones; P2[k,j] = (k-j)+), so the whole time coupling is
   four shared (16, 16) matmuls — the block-lower-triangular structure
   of the original KKT (src/MPC.cpp:512-513), applied instead of
   factored.

3. **Lane-major layout.** The batch lives on the 128-wide lane axis;
   each pallas grid step owns TILE=128 problems. Every per-problem
   operation is elementwise over lanes; every matrix (A, Kbar^-1, L,
   P2, the phase's slot->step one-hot) is SHARED and rides the MXU with
   full 128-lane occupancy. Per-problem HBM traffic per solve is a few
   KB of vectors — no n^2 objects exist anywhere.

The batch must be sorted so that each TILE is phase-homogeneous:
arrange problems as (P phases, C per phase) with C a multiple of the
tile. Phase p's tiles statically index Kbar_inv[p] and onehot[p] via
the BlockSpec index map — no scalar prefetch, no gathers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
f32 = jnp.float32
X_CLIP = 100.0          # primal safeguard box [N]
Y_CLIP = 1.0e4          # dual safeguard box


class PhaseQPData(NamedTuple):
    """Static per-solve data shared across the batch (host-built)."""
    A: jnp.ndarray          # (m, n) reduced cone matrix I (x) C
    Kbar_inv: jnp.ndarray   # (P, n, n) shared metric inverses per phase
    onehot: jnp.ndarray     # (P, N, cap) slot->step one-hot (f32)
    L: jnp.ndarray          # (N, N) lower-triangular ones (incl. diag)
    P2: jnp.ndarray         # (N, N) P2[k, j] = max(k - j, 0)
    l: jnp.ndarray          # (m,) cone lower bounds
    u: jnp.ndarray          # (m,) cone upper bounds
    wtop: jnp.ndarray       # (6,) position-block state weights * c_scale
    wbot: jnp.ndarray       # (6,) velocity-block state weights * c_scale
    w_force: float          # force regularization * c_scale
    dt: float
    rho: float
    sigma: float
    alpha: float
    c_scale: float = 1.0    # cost scaling folded into (w*, q); divides
                            # the dual residual back to physical units


def time_coupling(n_steps: int):
    """(L, P2) prefix-sum constants of the SRB response: for u (N, 6),
    dx_vel = L u (cumulative sums) and dx_pos = dt * P2 u (weighted
    cumulative sums) reproduce dx = G f + h's velocity/position rows
    (core/mpc.py recover_dx)."""
    k = np.arange(n_steps)
    L = (k[:, None] >= k[None, :]).astype(np.float32)
    P2 = np.maximum(k[:, None] - k[None, :], 0).astype(np.float32)
    return L, P2


def hx_matfree(x, BlS, oh, d: PhaseQPData):
    """H_b x, matrix-free. Shapes (lane-major, T = lane width):
    x (3cap, T); BlS (6, 3cap, T); oh (N, cap). Works identically under
    vmap-free XLA (T = batch) and inside the kernel (T = tile).

    H_b = Gr' W Gr + w_force I with Gr[k, s] = [dt (k - step_s) wrows;
    rows] masked to k >= step_s — the one-hot + prefix-sum matmuls
    reproduce exactly the masked block-triangular sums."""
    cap = oh.shape[-1]
    n = 3 * cap
    T = x.shape[-1]
    # per-slot inner products ps[a, s] = Bl_s[a, :] . x_s  -> (6, cap, T)
    prod = BlS * x[None, :, :]                       # (6, 3cap, T)
    ps = prod.reshape(6, cap, 3, T).sum(axis=2)      # (6, cap, T)
    # aggregate to steps: u[k, a] = sum_s oh[k, s] ps[a, s]
    psf = ps.transpose(1, 0, 2).reshape(cap, 6 * T)  # (cap, 6T)
    u = jax.lax.dot_general(oh, psf, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32,
                            precision=HI)            # (N, 6T)
    # time coupling: dxv = L u ; dxp = dt P2 u
    dxv = jax.lax.dot_general(d.L, u, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=HI)
    dxp = jax.lax.dot_general(d.P2, u, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=HI)
    N = d.L.shape[0]
    dxv = dxv.reshape(N, 6, T) * d.wbot[None, :, None]
    dxp = dxp.reshape(N, 6, T) * (d.dt * d.dt) * d.wtop[None, :, None]
    # transpose side: v[j] = P2' dxp + L' dxv
    vp = jax.lax.dot_general(d.P2, dxp.reshape(N, 6 * T),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=f32, precision=HI)
    vv = jax.lax.dot_general(d.L, dxv.reshape(N, 6 * T),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=f32, precision=HI)
    v = vp + vv                                      # (N, 6T)
    # back to slots: vS[s, a] = sum_k oh[k, s] v[k, a]
    vS = jax.lax.dot_general(oh, v, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=HI)           # (cap, 6T)
    vS = vS.reshape(cap, 6, T)
    # out[3s + i] = sum_a BlS[a, 3s + i] vS[s, a]
    vS_rep = jnp.repeat(vS.transpose(1, 0, 2), 3, axis=1)  # (6, 3cap, T)
    out = (BlS * vS_rep).sum(axis=0)                 # (3cap, T)
    return out + d.w_force * x


def admm_iter(x, z, y, q, BlS, oh, Kinv, d: PhaseQPData):
    """One prox-ADMM iteration, lane-major. All matmuls shared."""
    Ax = jax.lax.dot_general(d.A, x, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32, precision=HI)
    w = d.rho * (Ax - z) + y
    Atw = jax.lax.dot_general(d.A, w, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=HI)
    g = hx_matfree(x, BlS, oh, d) + q + Atw
    step = jax.lax.dot_general(Kinv, g, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32, precision=HI)
    xt = x - step
    zt = jax.lax.dot_general(d.A, xt, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32, precision=HI)
    xn = d.alpha * xt + (1.0 - d.alpha) * x
    zr = d.alpha * zt + (1.0 - d.alpha) * z
    zn = jnp.clip(zr + y / d.rho, d.l[:, None], d.u[:, None])
    yn = y + d.rho * (zr - zn)
    # Safeguard box: the physical solution is bounded (per-component
    # forces <= fz_max * sqrt(1 + mu^2) ~ 34 N), so clamping iterates far
    # outside it never cuts off the optimum. Over-relaxed (alpha > 1)
    # prox-metric steps can diverge geometrically on a small fraction of
    # problems in f32; the clamp turns that into a bounded excursion the
    # iteration recovers from instead of NaN poisoning the lane.
    xn = jnp.clip(xn, -X_CLIP, X_CLIP)
    yn = jnp.clip(yn, -Y_CLIP, Y_CLIP)
    return xn, zn, yn


def residuals(x, z, y, q, BlS, oh, d: PhaseQPData):
    """Unscaled OSQP residual norms + scales, (T,)-shaped. The cost
    scaling c is folded into (wtop, wbot, w_force, q), so the dual
    residual is divided back out by the caller via eps scaling."""
    Ax = jax.lax.dot_general(d.A, x, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32, precision=HI)
    Aty = jax.lax.dot_general(d.A, y, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=HI)
    Hx = hx_matfree(x, BlS, oh, d)
    pri = jnp.max(jnp.abs(Ax - z), axis=0)
    dua = jnp.max(jnp.abs(Hx + q + Aty), axis=0)
    n1 = jnp.maximum(jnp.max(jnp.abs(Ax), axis=0),
                     jnp.max(jnp.abs(z), axis=0))
    n2 = jnp.maximum(jnp.max(jnp.abs(Hx), axis=0),
                     jnp.max(jnp.abs(Aty), axis=0))
    return pri, dua, n1, n2


def _kernel(q_ref, BlS_ref, x0_ref, y0_ref, Kinv_ref, oh_ref,
            A_ref, L_ref, P2_ref, lu_ref, w_ref,
            x_ref, y_ref, z_ref, res_ref, *, d: PhaseQPData, n_iters,
            check_every, eps_abs, eps_rel):
    # rebuild the constant pack from refs (pallas kernels cannot close
    # over array constants); scalars ride the closure
    d = d._replace(A=A_ref[...], L=L_ref[...], P2=P2_ref[...],
                   l=lu_ref[0], u=lu_ref[1],
                   wtop=w_ref[0, 0:6], wbot=w_ref[1, 0:6])
    q = q_ref[...]
    BlS = BlS_ref[...]
    Kinv = Kinv_ref[0]
    oh = oh_ref[0]
    x = x0_ref[...]
    y = y0_ref[...]
    z = jax.lax.dot_general(d.A, x, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=HI)

    def step(_, s):
        return admm_iter(*s, q, BlS, oh, Kinv, d)

    # Chunked iteration with a per-lane convergence check every
    # `check_every` iterations: `it_conv` records the iteration count at
    # which a lane FIRST satisfied the OSQP termination test (granularity
    # check_every; lanes that never pass keep n_iters). The check costs
    # ~1 extra residual evaluation per chunk (~5% at check_every=25) and
    # makes convergence-speed regressions measurable (VERDICT r3 #8).
    ci = 1.0 / d.c_scale
    nrm_q = jnp.max(jnp.abs(q), axis=0) * ci

    def conv_test(x, z, y):
        pri, dua, n1, n2 = residuals(x, z, y, q, BlS, oh, d)
        eps_p = eps_abs + eps_rel * n1
        eps_d = eps_abs + eps_rel * jnp.maximum(n2 * ci, nrm_q)
        return (pri <= eps_p) & (dua * ci <= eps_d)

    n_chunks = -(-n_iters // check_every)

    def chunk(c, carry):
        x, z, y, it_conv = carry
        hi = jnp.minimum((c + 1) * check_every, n_iters)
        x, z, y = jax.lax.fori_loop(c * check_every, hi, step, (x, z, y))
        it_conv = jnp.minimum(
            it_conv, jnp.where(conv_test(x, z, y),
                               hi.astype(f32), float(n_iters)))
        return x, z, y, it_conv

    it0 = jnp.full((q.shape[-1],), float(n_iters), f32)
    x, z, y, it_conv = jax.lax.fori_loop(0, n_chunks, chunk,
                                         (x, z, y, it0))
    x_ref[...] = x
    y_ref[...] = y
    z_ref[...] = z
    pri, dua, n1, n2 = residuals(x, z, y, q, BlS, oh, d)
    res_ref[...] = jnp.broadcast_to(
        jnp.stack([pri, dua, n1, n2, it_conv])[:, None, :],
        res_ref.shape)


class PhaseQPResult(NamedTuple):
    x: jnp.ndarray          # (n, B) primal (reduced slot layout)
    y: jnp.ndarray          # (m, B) duals (cone rows)
    z: jnp.ndarray
    pri_res: jnp.ndarray    # (B,)
    dua_res: jnp.ndarray
    converged: jnp.ndarray  # (B,)
    iters: jnp.ndarray      # (B,)


def solve(q, BlS, data: PhaseQPData, phases_of,
          x0=None, y0=None, n_iters: int = 300, eps_abs: float = 1e-4,
          eps_rel: float = 1e-4, tile: int = 128,
          check_every: int = 25,
          interpret: bool = False) -> PhaseQPResult:
    """Solve a phase-sorted batch. q (n, B); BlS (6, n, B); phases_of
    (B // tile,) int array: phase id of each tile (every problem in a
    tile must share the phase's support). May be a host numpy array OR
    a traced jnp array (the fleet rollout's phase rotates with the gait
    roll inside lax.scan, so the per-tile gather of the shared blocks
    must be traceable). x0/y0 warm starts in the same lane-major
    layout."""
    n, B = q.shape
    m = data.A.shape[0]
    cap = n // 3
    assert B % tile == 0, "batch must be a multiple of the tile"
    n_tiles = B // tile

    x0 = jnp.zeros((n, B), f32) if x0 is None else x0.astype(f32)
    y0 = jnp.zeros((m, B), f32) if y0 is None else y0.astype(f32)

    lane = lambda rows: pl.BlockSpec((rows, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    # Per-tile copies of the phase-shared blocks (~1 MB HBM) so the
    # kernel index maps are the plain grid index — pallas index maps
    # cannot capture constants. Static host phases use numpy indexing;
    # traced phases use an in-graph gather.
    if isinstance(phases_of, (np.ndarray, list, tuple)) or np.isscalar(
            phases_of):
        ph = np.asarray(phases_of, np.int32)
        assert ph.shape == (n_tiles,)
        kinv_tiles = jnp.asarray(np.asarray(data.Kbar_inv)[ph], f32)
        oh_tiles = jnp.asarray(np.asarray(data.onehot)[ph], f32)
    else:
        ph = jnp.asarray(phases_of, jnp.int32)
        kinv_tiles = jnp.asarray(data.Kbar_inv, f32)[ph]
        oh_tiles = jnp.asarray(data.onehot, f32)[ph]
    kinv_spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    oh_spec = pl.BlockSpec((1, data.onehot.shape[1], cap),
                           lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    N = data.L.shape[0]
    lu = jnp.stack([jnp.asarray(data.l, f32), jnp.asarray(data.u, f32)])
    w8 = np.zeros((2, 8), np.float32)
    w8[0, 0:6] = np.asarray(data.wtop)
    w8[1, 0:6] = np.asarray(data.wbot)
    full = lambda *shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM)

    x, y, z, res = pl.pallas_call(
        functools.partial(_kernel, d=data, n_iters=int(n_iters),
                          check_every=int(check_every),
                          eps_abs=float(eps_abs),
                          eps_rel=float(eps_rel)),
        grid=(n_tiles,),
        in_specs=[
            lane(n),
            pl.BlockSpec((6, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            lane(n), lane(m), kinv_spec, oh_spec,
            full(m, n), full(N, N), full(N, N), full(2, m), full(2, 8)],
        out_specs=[lane(n), lane(m), lane(m),
                   pl.BlockSpec((5, 8, tile), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, B), f32),
                   jax.ShapeDtypeStruct((m, B), f32),
                   jax.ShapeDtypeStruct((m, B), f32),
                   jax.ShapeDtypeStruct((5, 8, B), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q.astype(f32), BlS.astype(f32), x0, y0, kinv_tiles, oh_tiles,
      jnp.asarray(data.A, f32), jnp.asarray(data.L, f32),
      jnp.asarray(data.P2, f32), lu, jnp.asarray(w8))

    pri, dua, n1, n2 = res[0, 0], res[1, 0], res[2, 0], res[3, 0]
    # pri is unscaled (A, l, u, x are in physical units); the dual side
    # carries the cost scaling c — divide it out for an OSQP-equivalent
    # unscaled termination test
    ci = 1.0 / data.c_scale
    dua = dua * ci
    n2 = n2 * ci
    nrm_q = jnp.max(jnp.abs(q), axis=0) * ci
    eps_p = eps_abs + eps_rel * n1
    eps_d = eps_abs + eps_rel * jnp.maximum(n2, nrm_q)
    conv = (pri <= eps_p) & (dua <= eps_d)
    iters = res[4, 0].astype(jnp.int32)
    return PhaseQPResult(x=x, y=y, z=z, pri_res=pri, dua_res=dua,
                         converged=conv, iters=iters)


def solve_ref(q, BlS, data: PhaseQPData, phase_of_problem, x0=None,
              y0=None, n_iters: int = 300, check_every: int = 25):
    """Pure-XLA reference implementation (same math, no pallas): for
    tests and CPU fallbacks. phase_of_problem (B,) int (numpy or
    traced)."""
    n, B = q.shape
    m = data.A.shape[0]
    phase_of_problem = jnp.asarray(phase_of_problem, jnp.int32)
    Kinv = data.Kbar_inv[phase_of_problem]           # (B, n, n)
    oh = data.onehot[phase_of_problem]               # (B, N, cap)

    x = jnp.zeros((n, B), f32) if x0 is None else x0.astype(f32)
    y = jnp.zeros((m, B), f32) if y0 is None else y0.astype(f32)

    # per-problem variants of the shared-matmul helpers
    def hx(xv):
        return jax.vmap(
            lambda xb, Bb, ob: hx_matfree(xb[:, None], Bb[..., None],
                                          ob, data)[:, 0],
            in_axes=(1, 2, 0), out_axes=1)(xv, BlS, oh)

    z = data.A @ x

    def it(_, s):
        x, z, y = s
        w = data.rho * ((data.A @ x) - z) + y
        g = hx(x) + q + data.A.T @ w
        step = jnp.einsum("bij,jb->ib", Kinv, g)
        xt = x - step
        zt = data.A @ xt
        xn = data.alpha * xt + (1 - data.alpha) * x
        zr = data.alpha * zt + (1 - data.alpha) * z
        zn = jnp.clip(zr + y / data.rho, data.l[:, None], data.u[:, None])
        yn = y + data.rho * (zr - zn)
        # same safeguard box as the kernel (admm_iter)
        xn = jnp.clip(xn, -X_CLIP, X_CLIP)
        yn = jnp.clip(yn, -Y_CLIP, Y_CLIP)
        return xn, zn, yn

    ci = 1.0 / data.c_scale
    nrm_q = jnp.max(jnp.abs(q), axis=0) * ci

    def residual_test(x, z, y):
        pri = jnp.max(jnp.abs(data.A @ x - z), axis=0)
        dua = jnp.max(jnp.abs(hx(x) + q + data.A.T @ y), axis=0) * ci
        n1 = jnp.maximum(jnp.max(jnp.abs(data.A @ x), axis=0),
                         jnp.max(jnp.abs(z), axis=0))
        n2 = jnp.maximum(jnp.max(jnp.abs(hx(x)), axis=0),
                         jnp.max(jnp.abs(data.A.T @ y), axis=0)) * ci
        eps_p = 1e-4 + 1e-4 * n1
        eps_d = 1e-4 + 1e-4 * jnp.maximum(n2, nrm_q)
        return pri, dua, (pri <= eps_p) & (dua <= eps_d)

    n_chunks = -(-n_iters // check_every)

    def chunk(c, carry):
        x, z, y, it_conv = carry
        hi = jnp.minimum((c + 1) * check_every, n_iters)
        x, z, y = jax.lax.fori_loop(c * check_every, hi, it, (x, z, y))
        _, _, cv = residual_test(x, z, y)
        it_conv = jnp.minimum(
            it_conv, jnp.where(cv, hi.astype(f32), float(n_iters)))
        return x, z, y, it_conv

    it0 = jnp.full((B,), float(n_iters), f32)
    x, z, y, it_conv = jax.lax.fori_loop(0, n_chunks, chunk,
                                         (x, z, y, it0))
    pri, dua, conv = residual_test(x, z, y)
    return PhaseQPResult(x=x, y=y, z=z, pri_res=pri, dua_res=dua,
                         converged=conv,
                         iters=it_conv.astype(jnp.int32))
