"""Auxiliary subsystems: checkpoint/resume, replay, profiling,
solver-comparison harness."""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config


def test_checkpoint_resume_bit_exact(tmp_path):
    """A rollout cut in half + checkpoint round-trip equals one
    uninterrupted rollout."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    from qrw_tpu.utils.checkpoint import load_state, save_state

    ctl, carry = make_rollout(dtype=jnp.float64)
    v = jnp.zeros((40, 6), jnp.float64)
    run = jax.jit(lambda c, k0, vs: rollout(ctl, c, 20, k0=k0,
                                            v_ref_schedule=vs))
    # uninterrupted 40 ticks
    c_mid, _ = run(carry, 0, v[:20])
    c_full, _ = run(c_mid, 20, v[20:])

    # checkpointed at tick 20
    path = str(tmp_path / "ck.npz")
    save_state(path, c_mid)
    c_loaded = load_state(path, c_mid)
    c_resumed, _ = run(c_loaded, 20, v[20:])

    for a, b in zip(jax.tree_util.tree_leaves(c_full),
                    jax.tree_util.tree_leaves(c_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_replay_reproduces_rollout(tmp_path):
    """Replaying logged joint commands through the sim reproduces the
    original base trajectory (same sim, same commands)."""
    from qrw_tpu.runtime.replay import replay_from_npz
    from qrw_tpu.sim.rollout import make_rollout, rollout
    from qrw_tpu.utils import logger as qlog

    ctl, carry = make_rollout(dtype=jnp.float64)
    n = 60
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
    _, logs = run(carry)
    path = qlog.save_npz(logs, str(tmp_path / "run.npz"), ctl.cfg)

    _, rlogs = replay_from_npz(path, ctl.cfg, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(rlogs.base_pos),
                               np.asarray(logs.base_pos), atol=1e-10)


def test_stage_timings_smoke():
    from qrw_tpu.utils.profiling import stage_timings
    t = stage_timings(reps=2)
    for key in ("t_filter", "t_mpc", "t_wbc", "t_loop"):
        assert key in t and t[key] > 0


def test_solver_comparison_harness():
    """QP and DDP backends agree on the captured standing cycles to
    within a couple newtons RMS."""
    from qrw_tpu.eval import compare

    cfg = Config()
    xrefs, fsteps = compare.capture_cycles(cfg, 400)
    # skip the initial settling transient (H_INIT -> h_ref drop) and
    # compare steady trot cycles only
    s = compare.summarize(compare.compare_solvers(cfg, xrefs[10:],
                                                  fsteps[10:]))
    assert s["cycles"] == 30
    mg4 = cfg.mass * cfg.gravity / 4
    # both solvers produce physically sane standing forces
    assert abs(s["fz_qp_mean"] - mg4) < 2.0
    assert abs(s["fz_ddp_mean"] - mg4) < 2.0
    assert s["force_rmse_mean"] < 3.0
    # warm in-loop variant (both solvers warm-started under production
    # budgets, the reference's test_1 methodology): same physical
    # agreement
    sw = compare.summarize(compare.compare_solvers_warm(
        cfg, xrefs[10:], fsteps[10:]))
    assert abs(sw["fz_qp_mean"] - mg4) < 2.0
    assert abs(sw["fz_ddp_mean"] - mg4) < 2.0
    assert sw["force_rmse_mean"] < 3.0
