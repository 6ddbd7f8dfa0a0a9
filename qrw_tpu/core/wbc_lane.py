"""Lane-major whole-body controller: the batch-on-lanes twin of core/wbc.

`compute_wbc_lane` runs the full WBC (task-space IK + 12-var contact
force box QP + feedforward torques, scripts/QP_WBC.py:52-131,
src/QPWBC.cpp:481-518) for a whole fleet in ONE lane-major dispatch
over the rbd_lane kernels, replacing vmap(compute_wbc). Same math, same
quirks (contact Jacobians base-translation-invariant, Y = diag of the
zero-configuration CRBA base block, scripts/QP_WBC.py:89-101), same
OSQP-semantics ADMM on the box QP — but with the batch on the TPU lane
axis so the per-iteration linear algebra is elementwise over full
(B,)-wide lanes.

The embedded ADMM exploits the WBC QP's structure (core/wbc.py):
  * every row of G is a finite two-sided inequality, so OSQP's rho
    classes collapse to ONE uniform rho (no loose/equality rows);
  * G'G is DIAGONAL (per-foot friction block C with C'C =
    diag(2, 2, 1 + 4 mu^2)), so the KKT matrix is K = H + diag(sigma +
    rho d) and rho adaptation only retouches the diagonal — a
    refactorization costs one unrolled 12x12 Cholesky (~300 lane ops);
  * no Ruiz equilibration: the WBC problem family is fixed-scale
    (forces in N against H = q1 A'A + q2 I), and the ADMM fixed point
    is scaling-invariant — parity of the SOLUTION against the
    Ruiz-scaled ops/qp.py path is asserted in tests/test_wbc_lane.py,
    and the termination test is OSQP's on unscaled residuals, so
    "converged" means the same thing on both paths.

Boundary layout is batch-major (same WBCState / WBCResult pytrees as
core/wbc.py) so callers swap vmap(compute_wbc) for compute_wbc_lane.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qrw_tpu.config import Config
from qrw_tpu.core.wbc import (WBCResult, WBCState, base_inertia_diag,
                              friction_generators)
from qrw_tpu.ops import rbd_lane as rl


# ----------------------------------------------------------------------
# Unrolled lane-major dense linear algebra (nested python lists)
# ----------------------------------------------------------------------

def choln(M, n):
    """Unrolled Cholesky of an n x n nested-list SPD matrix."""
    A = [[M[i][j] for j in range(n)] for i in range(n)]
    L = [[0.0] * n for _ in range(n)]
    for j in range(n):
        d = jnp.sqrt(A[j][j])
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            L[i][j] = rl._mul(A[i][j], inv_d)
        for i in range(j + 1, n):
            for k in range(j + 1, i + 1):
                A[i][k] = rl._add(A[i][k],
                                  rl._neg(rl._mul(L[i][j], L[k][j])))
    return L


def choln_solve(L, b, n):
    """Solve L L' x = b (b a python list of lane arrays)."""
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = rl._add(acc, rl._neg(rl._mul(L[i][j], y[j])))
        y[i] = rl._mul(acc, 1.0 / L[i][i])
    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = y[i]
        for j in range(i + 1, n):
            acc = rl._add(acc, rl._neg(rl._mul(L[j][i], x[j])))
        x[i] = rl._mul(acc, 1.0 / L[i][i])
    return x


def _maxabs(entries):
    """inf-norm over a python list of (B,) arrays -> (B,)."""
    out = abs(entries[0])
    for e in entries[1:]:
        out = jnp.maximum(out, abs(e))
    return out


# ----------------------------------------------------------------------
# Structured G operators (friction_generators block pattern)
# ----------------------------------------------------------------------

def _G_rows(mu):
    """The per-foot (5, 3) block C of core/wbc.friction_generators, as
    nested python floats (numpy scalars would promote f32 lanes under
    x64)."""
    C = np.array(friction_generators(mu))[0:5, 0:3]
    return [[float(e) for e in row] for row in C]


def _Gmul(SC, x):
    """y = G x for x a 12-list -> 20-list (per-foot block C)."""
    y = []
    for f in range(4):
        xf = x[3 * f:3 * f + 3]
        for r in range(5):
            y.append(rl._add(rl._mul(SC[r][0], xf[0]),
                             rl._mul(SC[r][1], xf[1]),
                             rl._mul(SC[r][2], xf[2])))
    return y


def _Gtmul(SC, y):
    """x = G' y for y a 20-list -> 12-list."""
    x = []
    for f in range(4):
        yf = y[5 * f:5 * f + 5]
        for a in range(3):
            x.append(rl._add(*[rl._mul(SC[r][a], yf[r])
                               for r in range(5)]))
    return x


# ----------------------------------------------------------------------
# The box-QP ADMM (OSQP semantics, uniform rho, unscaled)
# ----------------------------------------------------------------------

class LaneQPSol(NamedTuple):
    x: jnp.ndarray       # (B, 12)
    y: jnp.ndarray       # (B, 20)
    iters: jnp.ndarray   # (B,)


def wbc_qp_solve(cfg: Config, H, g, lo, hi, x0, y0,
                 sigma: float = 1e-6, alpha: float = 1.6,
                 rho0: float = 0.1, check_every: int = 25,
                 adapt_interval: int = 100) -> LaneQPSol:
    """min 1/2 x'Hx + g'x  s.t. lo <= Gx <= hi, lane-major.

    H: 12x12 nested list of (B,); g: 12-list; lo/hi: 20-lists;
    x0/y0: warm-start lists. OSQP splitting with relaxation alpha,
    sigma-regularized x-update, residual-based rho adaptation
    (diagonal-only refactor), termination on unscaled residuals at
    eps_abs/eps_rel = cfg.wbc_eps_* (src/QPWBC.cpp:239-240)."""
    SC = _G_rows(cfg.mu)
    dG = [2.0, 2.0, 1.0 + 4.0 * cfg.mu ** 2] * 4     # diag(G'G)
    n, m = 12, 20
    eps_abs, eps_rel = cfg.wbc_eps_abs, cfg.wbc_eps_rel
    max_iter = cfg.wbc_max_iter
    B = x0[0].shape[-1]
    dtype = x0[0].dtype

    def factor(rho):
        """K = H + sigma I + rho diag(G'G); rho is a (B,) lane array."""
        K = [[H[i][j] for j in range(12)] for i in range(12)]
        for i in range(12):
            K[i][i] = rl._add(K[i][i], sigma, rho * dG[i])
        return choln(K, 12)

    def stack(v):
        return jnp.stack([jnp.broadcast_to(e, (B,)).astype(dtype)
                          if isinstance(e, (int, float)) else e
                          for e in v])

    def unstack(a):
        return [a[i] for i in range(a.shape[0])]

    class St(NamedTuple):
        x: jnp.ndarray      # (12, B)
        z: jnp.ndarray      # (20, B)
        y: jnp.ndarray      # (20, B)
        rho: jnp.ndarray    # (B,)
        it: jnp.ndarray     # (B,) int32
        done: jnp.ndarray   # (B,) bool

    lo_s = stack(lo)
    hi_s = stack(hi)
    g_s = stack(g)

    def admm_chunk(st: St, n_steps: int) -> St:
        rho = st.rho
        L = factor(rho)

        def body(_, xzys):
            x, z, y = xzys
            xl = unstack(x)
            zl = unstack(z)
            yl = unstack(y)
            rhs = _Gtmul(SC, [rho * zl[r] - yl[r] for r in range(m)])
            rhs = [sigma * xl[i] - g_s[i] + rhs[i] for i in range(n)]
            xt = choln_solve(L, rhs, n)
            zt = _Gmul(SC, xt)
            xn = [alpha * xt[i] + (1 - alpha) * xl[i] for i in range(n)]
            z_rel = [alpha * zt[r] + (1 - alpha) * zl[r]
                     for r in range(m)]
            zn = [jnp.clip(z_rel[r] + yl[r] / rho, lo_s[r], hi_s[r])
                  for r in range(m)]
            yn = [yl[r] + rho * (z_rel[r] - zn[r]) for r in range(m)]
            keep = st.done
            xs = jnp.stack([jnp.where(keep, xl[i], xn[i])
                            for i in range(n)])
            zs = jnp.stack([jnp.where(keep, zl[r], zn[r])
                            for r in range(m)])
            ys = jnp.stack([jnp.where(keep, yl[r], yn[r])
                            for r in range(m)])
            return xs, zs, ys

        x, z, y = lax.fori_loop(0, n_steps, body, (st.x, st.z, st.y))
        return st._replace(x=x, z=z, y=y,
                           it=jnp.where(st.done, st.it,
                                        st.it + n_steps))

    def residuals(st: St):
        xl = unstack(st.x)
        zl = unstack(st.z)
        yl = unstack(st.y)
        Gx = _Gmul(SC, xl)
        Hx = [rl._add(*[rl._mul(H[i][j], xl[j]) for j in range(n)])
              for i in range(n)]
        Gty = _Gtmul(SC, yl)
        pri = _maxabs([Gx[r] - zl[r] for r in range(m)])
        dua = _maxabs([Hx[i] + g_s[i] + Gty[i] for i in range(n)])
        denom_p = jnp.maximum(jnp.maximum(_maxabs(Gx), _maxabs(zl)),
                              1e-30)
        denom_d = jnp.maximum(jnp.maximum(
            jnp.maximum(_maxabs(Hx), _maxabs(Gty)),
            _maxabs(list(g_s))), 1e-30)
        eps_pri = eps_abs + eps_rel * denom_p
        eps_dua = eps_abs + eps_rel * denom_d
        return pri, dua, eps_pri, eps_dua, denom_p, denom_d

    n_checks = (max_iter + check_every - 1) // check_every
    adapt_mod = max(1, adapt_interval // check_every)

    def outer_cond(carry):
        st, chk = carry
        return (chk < n_checks) & ~jnp.all(st.done)

    def outer_body(carry):
        st, chk = carry
        st = admm_chunk(st, check_every)
        pri, dua, eps_pri, eps_dua, denom_p, denom_d = residuals(st)
        conv = (pri <= eps_pri) & (dua <= eps_dua)
        st = st._replace(done=st.done | conv)

        def adapt(st):
            # osqp adapt_rho on the normalized residual ratio
            ratio = (pri / denom_p) / jnp.maximum(dua / denom_d, 1e-30)
            scale = jnp.sqrt(ratio)
            want = ((scale > 5.0) | (scale < 0.2)) & ~st.done
            rho_new = jnp.where(want,
                                jnp.clip(st.rho * scale, 1e-6, 1e6),
                                st.rho)
            return st._replace(rho=rho_new)

        st = lax.cond(((chk + 1) % adapt_mod) == 0, adapt,
                      lambda t: t, st)
        return st, chk + 1

    st0 = St(x=stack(x0), z=stack(_Gmul(SC, x0)), y=stack(y0),
             rho=jnp.full((B,), rho0, dtype),
             it=jnp.zeros((B,), jnp.int32),
             done=jnp.zeros((B,), bool))
    st, _ = lax.while_loop(outer_cond, outer_body,
                           (st0, jnp.asarray(0, jnp.int32)))
    return LaneQPSol(x=jnp.transpose(st.x), y=jnp.transpose(st.y),
                     iters=st.it)


# ----------------------------------------------------------------------
# The full WBC
# ----------------------------------------------------------------------

def compute_wbc_lane(cfg: Config, lane: rl.LaneModel, state: WBCState,
                     qj, b_v18, f_cmd, contacts, pgoals, vgoals,
                     agoals) -> WBCResult:
    """Batched WBC tick: all inputs batch-major — state leaves (B, ...),
    qj (B, 12), b_v18 (B, 18), f_cmd (B, 12), contacts (B, 4),
    pgoals/vgoals/agoals (B, 3, 4). Returns a batched WBCResult
    matching vmap(core.wbc.compute_wbc) (tests/test_wbc_lane.py)."""
    B = qj.shape[0]
    dtype = qj.dtype

    def lq(x):
        return jnp.transpose(x.reshape(B, 4, 3), (1, 2, 0))

    def goals_t(x):
        """(B, 3, 4) -> Vec of (4, B)."""
        return [jnp.transpose(x[:, i, :]) for i in range(3)]

    qj_l = lq(qj)
    vj_l = lq(b_v18[:, 6:])
    cts = jnp.transpose(contacts)                    # (4, B)
    in_c = cts > 0

    ksc = (jnp.transpose(state.k_since_contact) + cts) * cts

    # ---- IK on the fixed-base model (scripts/solo12InvKin.py:11-12) ---
    kin = rl.frame_kinematics(lane, rl.ZV3, rl.EYE3, qj_l, None, vj_l)
    J = rl.foot_jacobians(lane, kin, rl.EYE3, rl.ZV3)
    Jleg = J.Jleg                                    # 3x3 of (4, B)

    pg = goals_t(pgoals)
    vg = goals_t(vgoals)
    ag = goals_t(agoals)
    perr = rl.vsub(pg, kin.pos)
    afeet = [cfg.kp_flyingfeet * perr[i]
             - cfg.kd_flyingfeet * (kin.vel[i] - vg[i]) + ag[i]
             for i in range(3)]
    afeet = [jnp.where(in_c, 0.0, afeet[i]) - kin.drift[i]
             for i in range(3)]

    Jinv = _inv3(Jleg)
    ddq_j = rl.mv(Jinv, afeet)                       # Vec of (4, B)
    dq_cmd = rl.mv(Jinv, vg)
    q_step = rl.mv(Jinv, perr)

    # ---- box QP data (src/QPWBC.cpp:481-518) --------------------------
    # Jc = contact-masked J; X = Jc[:, 0:6]'; A = Yinv X;
    # gamma = Yinv (X f_cmd - rnea6)
    f_l = lq(f_cmd)                                  # (4, 3, B)
    Ff = [jnp.where(in_c, f_l[:, i], 0.0) for i in range(3)]  # masked
    # base contact wrench X f_cmd: force = sum_f F_f ; torque =
    # sum_f Jb_ang_f' F_f (fixed base: Jb_lin = I)
    Xf_force = [jnp.sum(Ff[i], axis=0) for i in range(3)]
    tq = rl.mtv(J.Jb_ang, Ff)
    Xf_torque = [jnp.sum(tq[i], axis=0) for i in range(3)]

    zeros_j = jnp.zeros_like(qj_l)
    vlin = [b_v18[:, i] for i in range(3)]
    wvec = [b_v18[:, 3 + i] for i in range(3)]
    rnea_f, rnea_n, _ = rl.rnea(
        lane, rl.EYE3, qj_l, (vlin, wvec, vj_l),
        (rl.ZV3, rl.ZV3, ddq_to_aj(ddq_j)), cfg.gravity)

    Yinv = 1.0 / base_inertia_diag()                 # (6,) numpy
    gam = [float(Yinv[i]) * (Xf_force[i] - rnea_f[i]) for i in range(3)] \
        + [float(Yinv[3 + i]) * (Xf_torque[i] - rnea_n[i])
           for i in range(3)]                        # 6-list of (B,)

    # A columns: A[:, 3f+a] = Yinv * [e_a * c_f ; Jb_ang_f[a, :] * c_f]
    # (fixed base). Build as per-(f,a) 6-vectors of (B,) entries.
    Acols = []
    for f in range(4):
        mask = in_c[f]
        for a in range(3):
            # rows 0:3: Yinv[i] * c_f * delta_{i,a}; rows 3:6 from the
            # base-angular Jacobian block (X[3+i, 3f+a] = Jb_ang_f[a,i])
            col = [jnp.where(mask, float(Yinv[a]), 0.0) if i == a
                   else 0.0 for i in range(3)]
            for i in range(3):
                e = J.Jb_ang[a][i]                  # (4, B) or symbolic
                if isinstance(e, (int, float)):
                    col.append(float(Yinv[3 + i]) * e)
                else:
                    col.append(jnp.where(mask, float(Yinv[3 + i]) * e[f],
                                         0.0))
            Acols.append(col)

    # H = q1 A'A + q2 I ; g = q1 A' gamma  (12x12 nested of (B,))
    q1, q2 = cfg.wbc_q1, cfg.wbc_q2
    H = [[0.0] * 12 for _ in range(12)]
    g_vec = [0.0] * 12
    for c1 in range(12):
        for c2 in range(c1, 12):
            acc = 0.0
            for r in range(6):
                acc = rl._add(acc, rl._mul(Acols[c1][r], Acols[c2][r]))
            acc = rl._mul(q1, acc)
            if c1 == c2:
                acc = rl._add(acc, q2)
                H[c1][c1] = acc
            else:
                H[c1][c2] = acc
                H[c2][c1] = acc
        acc = 0.0
        for r in range(6):
            acc = rl._add(acc, rl._mul(Acols[c1][r], gam[r]))
        g_vec[c1] = rl._mul(q1, acc)

    # bounds: l = -G f_cmd, u = l + fz_max (src/MPC... QPWBC box)
    SC = _G_rows(cfg.mu)
    fc_cols = [f_cmd[:, i] for i in range(12)]
    Gf = _Gmul(SC, fc_cols)
    lo = [-Gf[r] for r in range(20)]
    hi = [cfg.fz_max - Gf[r] for r in range(20)]

    x0 = [state.qp_x[:, i] for i in range(12)]
    y0 = [state.qp_y[:, i] for i in range(20)]
    sol = wbc_qp_solve(cfg, H, g_vec, lo, hi, x0, y0)
    df = [sol.x[:, i] for i in range(12)]
    f_with_delta = f_cmd + sol.x

    # ddq_delta = A df + gamma (6-list of (B,))
    ddq_delta = []
    for r in range(6):
        acc = gam[r]
        for c in range(12):
            acc = rl._add(acc, rl._mul(Acols[c][r], df[c]))
        ddq_delta.append(acc)

    # ---- feedforward torques -----------------------------------------
    _, _, tau_rnea = rl.rnea(
        lane, rl.EYE3, qj_l, (vlin, wvec, vj_l),
        (ddq_delta[0:3], ddq_delta[3:6], ddq_to_aj(ddq_j)), cfg.gravity)
    # Jc[:, 6:]' f = per-leg Jleg' F_f (masked)
    fwd_l = lq(f_with_delta)
    Fm = [jnp.where(in_c, fwd_l[:, i], 0.0) for i in range(3)]
    jf = rl.mtv(Jleg, Fm)                            # Vec of (4, B)
    tau_ff_l = tau_rnea - jnp.stack(jf, axis=1)      # (4, 3, B)

    def bm(x):
        return jnp.transpose(x, (2, 0, 1)).reshape(B, 12)

    def bm_vec(v):
        """Vec of (4, B) -> (B, 12) leg-major."""
        return bm(jnp.stack(v, axis=1))

    new_state = WBCState(k_since_contact=jnp.transpose(ksc),
                         qp_x=sol.x, qp_y=sol.y)
    feet_pos = jnp.stack([jnp.transpose(p) for p in kin.pos], axis=2)
    feet_vel = jnp.stack([jnp.transpose(p) for p in kin.vel], axis=2)
    ddq_cmd_out = jnp.concatenate(
        [jnp.stack(ddq_delta, axis=1), bm_vec(ddq_j)], axis=1)
    return WBCResult(
        qdes=qj + bm_vec(q_step), vdes=bm_vec(dq_cmd),
        tau_ff=bm(tau_ff_l), f_with_delta=f_with_delta,
        ddq_cmd=ddq_cmd_out, feet_pos=feet_pos, feet_vel=feet_vel,
        state=new_state, qp_iters=sol.iters)


def ddq_to_aj(ddq_j):
    """IK joint accelerations Vec of (4, B) -> (4, 3, B)."""
    return jnp.stack(ddq_j, axis=1)


def _inv3(M):
    """Closed-form inverse of a GENERAL 3x3 nested-list matrix
    (adjugate; lin.inv3's lane twin — leg Jacobians are not symmetric)."""
    a, b, c = M[0]
    d, e, f = M[1]
    g, h, i = M[2]
    A11 = rl._add(rl._mul(e, i), rl._neg(rl._mul(f, h)))
    A12 = rl._add(rl._mul(c, h), rl._neg(rl._mul(b, i)))
    A13 = rl._add(rl._mul(b, f), rl._neg(rl._mul(c, e)))
    A21 = rl._add(rl._mul(f, g), rl._neg(rl._mul(d, i)))
    A22 = rl._add(rl._mul(a, i), rl._neg(rl._mul(c, g)))
    A23 = rl._add(rl._mul(c, d), rl._neg(rl._mul(a, f)))
    A31 = rl._add(rl._mul(d, h), rl._neg(rl._mul(e, g)))
    A32 = rl._add(rl._mul(b, g), rl._neg(rl._mul(a, h)))
    A33 = rl._add(rl._mul(a, e), rl._neg(rl._mul(b, d)))
    det = rl._add(rl._mul(a, A11), rl._mul(b, A21), rl._mul(c, A31))
    inv = 1.0 / det
    return [[rl._mul(inv, A11), rl._mul(inv, A12), rl._mul(inv, A13)],
            [rl._mul(inv, A21), rl._mul(inv, A22), rl._mul(inv, A23)],
            [rl._mul(inv, A31), rl._mul(inv, A32), rl._mul(inv, A33)]]
