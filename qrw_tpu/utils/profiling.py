"""Per-stage timing + device profiling harness.

The reference instruments each controller stage with wall-clock deltas
per tick (t_filter / t_planner / t_mpc / t_wbc / t_loop,
scripts/Controller.py:81-88,367-379). Inside one fused jitted rollout
those stages have no host-visible boundaries, so this module provides
the TPU-native equivalents (SURVEY.md section 5.1):

  * `stage_timings` — jit + time each pipeline stage separately on real
    inputs (estimator, planners, MPC, WBC, sim step), amortized over
    repetitions with forced device sync, reporting per-stage wall time
    against the 2 ms budget;
  * `trace` — context manager around jax.profiler for kernel-level
    traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


def _sync_scalar(x):
    """Force execution; a scalar fetch is the only sync that is reliable
    through the remote-TPU tunnel."""
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def _time_fn(fn, args, reps: int) -> float:
    out = fn(*args)
    _sync_scalar(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync_scalar(out)
    return (time.perf_counter() - t0) / reps


def stage_timings(cfg=None, dtype=jnp.float32, reps: int = 20
                  ) -> Dict[str, float]:
    """Per-stage seconds for one tick's work (keys mirror the
    reference's t_list_* names)."""
    from qrw_tpu.config import Config
    from qrw_tpu.core import gait as gait_mod
    from qrw_tpu.core import mpc as mpc_mod
    from qrw_tpu.core import wbc as wbc_mod
    from qrw_tpu.core.controller import compute, init_state, \
        make_controller
    from qrw_tpu.core.estimator import run_filter
    from qrw_tpu.sim.physics import init_sim_state, step

    if cfg is None:
        cfg = Config()
    ctl = make_controller(cfg)
    st = init_state(ctl, dtype)
    ss = init_sim_state(cfg, dtype=dtype)
    from qrw_tpu.sim.rollout import rollout  # noqa: F401 (API anchor)
    from __graft_entry__ import _device0
    dev = _device0(ss)

    res: Dict[str, float] = {}
    res["t_filter"] = _time_fn(
        jax.jit(lambda s, d: run_filter(cfg, ctl.model, s, 0,
                                        st.gait.current, d,
                                        st.foot_traj.position)),
        (st.estimator, dev), reps)
    res["t_gait"] = _time_fn(
        jax.jit(lambda g: gait_mod.update_gait(
            g, 0, cfg.k_mpc, 0, ctl.patterns.astype(dtype))),
        (st.gait,), reps)
    xref = jnp.zeros((12, cfg.n_steps + 1), dtype).at[2, :].set(cfg.h_ref)
    fsteps = jnp.zeros((cfg.N_gait, 12), dtype)
    res["t_mpc"] = _time_fn(
        jax.jit(lambda x, f, s: mpc_mod.solve_mpc(cfg, x, f, s,
                                                  ctl.mpc_settings)),
        (xref, fsteps, st.mpc), reps)
    goals = jnp.zeros((3, 4), dtype)
    res["t_wbc"] = _time_fn(
        jax.jit(lambda s, q, v, f: wbc_mod.compute_wbc(
            cfg, ctl.model, s, q, v, f, jnp.ones(4, dtype),
            goals, goals, goals, ctl.wbc_settings)),
        (st.wbc, st.qdes, jnp.zeros(18, dtype),
         jnp.zeros(12, dtype)), reps)
    res["t_sim"] = _time_fn(
        jax.jit(lambda s: step(cfg, ctl.model, s,
                               cfg.joint_P * jnp.ones(12, dtype),
                               cfg.joint_D * jnp.ones(12, dtype),
                               st.qdes, jnp.zeros(12, dtype),
                               jnp.zeros(12, dtype))),
        (ss,), reps)
    res["t_loop"] = _time_fn(
        jax.jit(lambda s, d: compute(ctl, s, d, 1)), (st, dev), reps)
    return res


@contextlib.contextmanager
def trace(logdir: str = "/tmp/qrw_trace"):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
