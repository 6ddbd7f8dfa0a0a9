"""Generic batched iLQR (the Crocoddyl SolverDDP equivalent).

The reference's DDP backends all call `crocoddyl.SolverDDP.solve(x_init,
u_init, max_iter)` (scripts/crocoddyl_class/MPC_crocoddyl.py:214,
scripts/crocoddyl_class/MPC_crocoddyl_planner.py:156) over a list of
per-node action models. Here the solver itself is one pure function over
fixed shapes: exact per-node derivatives via autodiff, a lax.scan
backward Riccati sweep, a vmapped parallel line search over the
crocoddyl alpha schedule (2^-k), and a Levenberg regularization schedule
mirroring crocoddyl's increase/decreaseRegularization. Everything jits
and vmaps over scenario batches; there is no data-dependent shape
anywhere, so the same compiled program serves every gait/horizon state.

Problems are supplied as three closures over the node index k — the
TPU-native replacement for crocoddyl's per-node action-model lists:
    step_k(x, u, k) -> x_next        (action model calc: dynamics)
    cost_k(x, u, k) -> scalar        (running cost)
    cost_T(x)       -> scalar        (terminal cost)
plus an optional project_u(u, k) applied to every candidate control in
the forward pass (used for contact gating: swing-foot forces stay
exactly zero, like the reference's per-node gait masking).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class ILQRSettings(NamedTuple):
    max_iters: int = 10
    # crocoddyl SolverDDP line-search schedule (alphas 2^-k)
    alphas: tuple = (1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625,
                     0.0078125, 0.00390625)
    reg_init: float = 1e-9
    reg_min: float = 1e-9
    reg_max: float = 1e4
    reg_inc: float = 10.0
    reg_dec: float = 0.1


class ILQRResult(NamedTuple):
    xs: jnp.ndarray          # (N+1, n) optimized state trajectory
    us: jnp.ndarray          # (N, m) optimized controls
    cost: jnp.ndarray        # () final total cost
    cost_trace: jnp.ndarray  # (max_iters,) accepted cost per iteration


def solve(step_k: Callable, cost_k: Callable, cost_T: Callable,
          x0: jnp.ndarray, us0: jnp.ndarray,
          settings: ILQRSettings = ILQRSettings(),
          project_u: Optional[Callable] = None) -> ILQRResult:
    """Run iLQR from the warm start us0. x0: (n,), us0: (N, m)."""
    N, m = us0.shape
    dtype = x0.dtype
    if project_u is None:
        def project_u(u, k):
            return u

    def rollout(us):
        def f(x, ku):
            k, u = ku
            xn = step_k(x, u, k)
            return xn, (x, cost_k(x, u, k))
        ks = jnp.arange(N)
        xN, (xs, cs) = jax.lax.scan(f, x0, (ks, us))
        total = cs.sum() + cost_T(xN)
        return jnp.concatenate([xs, xN[None]]), total

    xs0, cost0 = rollout(us0)

    fx_fn = jax.vmap(jax.jacfwd(step_k, argnums=0))
    fu_fn = jax.vmap(jax.jacfwd(step_k, argnums=1))
    lx_fn = jax.vmap(jax.grad(cost_k, argnums=0))
    lu_fn = jax.vmap(jax.grad(cost_k, argnums=1))
    lxx_fn = jax.vmap(jax.hessian(cost_k, argnums=0))
    luu_fn = jax.vmap(jax.hessian(cost_k, argnums=1))
    lux_fn = jax.vmap(jax.jacfwd(jax.grad(cost_k, argnums=1), argnums=0))

    def ddp_iter(carry, _):
        xs, us, cost, reg = carry
        ks = jnp.arange(N)
        fx = fx_fn(xs[:-1], us, ks)
        fu = fu_fn(xs[:-1], us, ks)
        lx = lx_fn(xs[:-1], us, ks)
        lu = lu_fn(xs[:-1], us, ks)
        lxx = lxx_fn(xs[:-1], us, ks)
        luu = luu_fn(xs[:-1], us, ks)
        lux = lux_fn(xs[:-1], us, ks)
        Vx = jax.grad(cost_T)(xs[-1])
        Vxx = jax.hessian(cost_T)(xs[-1])

        def backward(carryV, inp):
            Vx, Vxx = carryV
            fx_k, fu_k, lx_k, lu_k, lxx_k, luu_k, lux_k = inp
            Qx = lx_k + fx_k.T @ Vx
            Qu = lu_k + fu_k.T @ Vx
            Qxx = lxx_k + fx_k.T @ Vxx @ fx_k
            Quu = (luu_k + fu_k.T @ Vxx @ fu_k
                   + reg * jnp.eye(m, dtype=dtype))
            Qux = lux_k + fu_k.T @ Vxx @ fx_k
            # LU solve: Quu can transiently lose PD-ness at early iterates
            # (active-set switches in the penalty hessians); Cholesky NaNs
            # would poison the line search.
            kff = -jnp.linalg.solve(Quu, Qu)
            K = -jnp.linalg.solve(Quu, Qux)
            Vx_n = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            return (Vx_n, Vxx_n), (kff, K)

        _, (kffs, Ks) = jax.lax.scan(
            backward, (Vx, Vxx), (fx, fu, lx, lu, lxx, luu, lux),
            reverse=True)

        def forward(alpha):
            def f(x, inp):
                k, u_old, x_old, kff, K = inp
                u = project_u(u_old + alpha * kff + K @ (x - x_old), k)
                xn = step_k(x, u, k)
                return xn, (x, u, cost_k(x, u, k))
            xN, (xs_n, us_n, cs) = jax.lax.scan(
                f, x0, (ks, us, xs[:-1], kffs, Ks))
            total = cs.sum() + cost_T(xN)
            return jnp.concatenate([xs_n, xN[None]]), us_n, total

        alphas = jnp.asarray(settings.alphas, dtype)
        xs_c, us_c, costs_c = jax.vmap(forward)(alphas)
        costs_c = jnp.where(jnp.isnan(costs_c), jnp.inf, costs_c)
        best = jnp.argmin(costs_c)
        improved = costs_c[best] < cost
        xs_new = jnp.where(improved, xs_c[best], xs)
        us_new = jnp.where(improved, us_c[best], us)
        cost_new = jnp.where(improved, costs_c[best], cost)
        reg_new = jnp.where(improved,
                            jnp.maximum(reg * settings.reg_dec,
                                        settings.reg_min),
                            jnp.minimum(reg * settings.reg_inc,
                                        settings.reg_max))
        return (xs_new, us_new, cost_new, reg_new), cost_new

    reg0 = jnp.asarray(settings.reg_init, dtype)
    (xs, us, cost, _), trace = jax.lax.scan(
        ddp_iter, (xs0, us0, cost0, reg0), None,
        length=settings.max_iters)
    return ILQRResult(xs=xs, us=us, cost=cost, cost_trace=trace)
