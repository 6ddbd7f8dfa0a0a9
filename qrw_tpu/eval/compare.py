"""Solver-comparison harness: QP MPC vs DDP MPC on identical inputs.

Re-design of the reference's crocoddyl_eval experiment suite
(scripts/crocoddyl_eval/test_1: run the stack, log every control cycle,
re-solve each cycle offline with both solvers and compare —
scripts/crocoddyl_eval/README.md:1-24). The TPU-native version captures
the per-cycle MPC inputs inside the rollout log (RolloutLog.mpc_xref /
mpc_fsteps) and re-solves all cycles as ONE batched vmap per solver, so
a whole run's comparison is two device calls."""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core import mpc as mpc_mod
from qrw_tpu.core import mpc_ddp


class CycleComparison(NamedTuple):
    x_f_qp: jnp.ndarray     # (C, 24, N)
    x_f_ddp: jnp.ndarray    # (C, 24, N)
    force_rmse: jnp.ndarray  # (C,) per-cycle RMS force difference [N]
    state_rmse: jnp.ndarray  # (C,) per-cycle RMS predicted-state diff


def capture_cycles(cfg: Config, n_ticks: int, dtype=jnp.float64):
    """Run the closed loop and extract one (xref, fsteps) per MPC cycle."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    ctl, carry = make_rollout(cfg, dtype=dtype)
    run = jax.jit(lambda c: rollout(ctl, c, n_ticks))
    _, logs = run(carry)
    ticks = np.arange(0, n_ticks, cfg.k_mpc)
    xrefs = np.asarray(logs.mpc_xref)[ticks]
    fsteps = np.asarray(logs.mpc_fsteps)[ticks]
    return jnp.asarray(xrefs), jnp.asarray(fsteps)


def compare_solvers(cfg: Config, xrefs, fsteps) -> CycleComparison:
    """Batched re-solve of all captured cycles with both backends
    (cold-started for a like-for-like comparison)."""
    qp_solve = jax.jit(jax.vmap(
        lambda x, f: mpc_mod.solve_mpc(cfg, x, f).x_f_applied))
    # offline analysis is not bound by the 20 ms budget: let the DDP run
    # past the real-time 10-iteration cap so cold starts fully converge
    ddp_cfg = mpc_ddp.DDPSettings(max_iters=40)
    ddp_solve = jax.jit(jax.vmap(
        lambda x, f: mpc_ddp.solve_mpc_ddp(cfg, x, f,
                                           settings=ddp_cfg).x_f_applied))
    x_f_qp = qp_solve(xrefs, fsteps)
    x_f_ddp = ddp_solve(xrefs, fsteps)
    df = x_f_qp[:, 12:, :] - x_f_ddp[:, 12:, :]
    dx = x_f_qp[:, :12, :] - x_f_ddp[:, :12, :]
    return CycleComparison(
        x_f_qp=x_f_qp, x_f_ddp=x_f_ddp,
        force_rmse=jnp.sqrt(jnp.mean(df ** 2, axis=(1, 2))),
        state_rmse=jnp.sqrt(jnp.mean(dx ** 2, axis=(1, 2))))


def compare_solvers_warm(cfg: Config, xrefs, fsteps) -> CycleComparison:
    """Warm, in-loop comparison: both backends solve the captured cycle
    SEQUENCE exactly as they run in the controller — warm-started from
    their own previous cycle, under their production iteration budgets
    (the reference's test_1 compares the solvers mid-run, not from cold
    starts: scripts/crocoddyl_eval/test_1/run_scenarios.py:46-66).
    QP: eps 1e-4 relaxed settings, 100-iteration warm rounds (the
    bench.py full-path policy). DDP: the real-time 10-iteration cap
    with xs/us warm start (scripts/crocoddyl_class/MPC_crocoddyl.py:
    201-208)."""
    from qrw_tpu.ops import qp as qp_ops

    settings = qp_ops.QPSettings(eps_abs=1e-4, eps_rel=1e-4,
                                 max_iter=450,
                                 adaptive_rho_interval=200)

    def qp_chain(xs, fs):
        def body(st, xf):
            x, f = xf
            res = mpc_mod.solve_mpc(cfg, x, f, st, settings)
            return res.state, res.x_f_applied
        _, out = jax.lax.scan(body, mpc_mod.init_mpc_state(
            cfg, xs.dtype), (xs, fs))
        return out

    def ddp_chain(xs, fs):
        ddp_cfg = mpc_ddp.DDPSettings(max_iters=10)  # real-time budget

        def body(st, xf):
            x, f = xf
            res = mpc_ddp.solve_mpc_ddp(cfg, x, f, st, settings=ddp_cfg)
            return res.state, res.x_f_applied
        _, out = jax.lax.scan(body, mpc_ddp.init_ddp_state(
            cfg, xs.dtype), (xs, fs))
        return out

    x_f_qp = jax.jit(qp_chain)(xrefs, fsteps)
    x_f_ddp = jax.jit(ddp_chain)(xrefs, fsteps)
    df = x_f_qp[:, 12:, :] - x_f_ddp[:, 12:, :]
    dx = x_f_qp[:, :12, :] - x_f_ddp[:, :12, :]
    return CycleComparison(
        x_f_qp=x_f_qp, x_f_ddp=x_f_ddp,
        force_rmse=jnp.sqrt(jnp.mean(df ** 2, axis=(1, 2))),
        state_rmse=jnp.sqrt(jnp.mean(dx ** 2, axis=(1, 2))))


def summarize(cmp: CycleComparison) -> Dict[str, float]:
    return {
        "cycles": int(cmp.force_rmse.shape[0]),
        "force_rmse_mean": float(jnp.mean(cmp.force_rmse)),
        "force_rmse_max": float(jnp.max(cmp.force_rmse)),
        "state_rmse_mean": float(jnp.mean(cmp.state_rmse)),
        "fz_qp_mean": float(jnp.mean(cmp.x_f_qp[:, 14::3, 0])),
        "fz_ddp_mean": float(jnp.mean(cmp.x_f_ddp[:, 14::3, 0])),
    }


def run(cfg: Config = None, n_ticks: int = 500,
        warm: bool = True) -> Dict[str, float]:
    """End-to-end harness (run_scenarios + analyse_simu equivalent).
    warm=True (default) compares the solvers as they run in the loop
    (warm-started, production budgets); warm=False is the cold
    like-for-like re-solve."""
    if cfg is None:
        cfg = Config()
    xrefs, fsteps = capture_cycles(cfg, n_ticks)
    fn = compare_solvers_warm if warm else compare_solvers
    out = summarize(fn(cfg, xrefs, fsteps))
    out["mode"] = "warm-in-loop" if warm else "cold"
    return out


if __name__ == "__main__":  # pragma: no cover
    import json
    print(json.dumps(run(), indent=2))
