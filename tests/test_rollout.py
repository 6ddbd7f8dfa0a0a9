"""Closed-loop integration tests: full controller + in-graph simulator.

The SURVEY.md section 4 tier-3 analog: run the whole stack in simulation
with the security checks as test oracles (scripts/Controller.py:341-355)
and physical invariants (upright, height near h_ref, velocity tracking).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.config import Config
from qrw_tpu.sim.rollout import make_rollout, rollout

CFG = Config()


@pytest.fixture(scope="module")
def standing_run():
    ctl, carry = make_rollout(CFG, dtype=jnp.float64)
    zero = jnp.zeros((300, 6), jnp.float64)
    carry, logs = jax.jit(
        lambda c: rollout(ctl, c, 300, v_ref_schedule=zero,
                          perfect_estimator=True))(carry)
    return carry, logs


def test_standing_trot_stays_upright(standing_run):
    carry, logs = standing_run
    h = np.asarray(logs.base_pos[:, 2])
    assert not np.any(np.asarray(logs.error)), "security latch triggered"
    assert np.all(np.isfinite(np.asarray(logs.base_pos)))
    # base height stays in a sane band around h_ref
    assert np.all(h[50:] > CFG.h_ref - 0.05)
    assert np.all(h[50:] < CFG.h_ref + 0.05)
    # no lateral drift blow-up while trotting in place
    assert abs(float(carry.sim_state.q[0])) < 0.1
    assert abs(float(carry.sim_state.q[1])) < 0.1


def test_standing_torques_within_envelope(standing_run):
    _, logs = standing_run
    tau = np.asarray(logs.tau_ff)
    assert np.max(np.abs(tau)) < CFG.tau_security


def test_forward_trot_tracks_velocity():
    ctl, carry = make_rollout(CFG, dtype=jnp.float64)
    n = 500
    # ramp to 0.3 m/s over 100 ticks, then hold
    vx = jnp.minimum(0.3, jnp.arange(n) * 0.003)
    sched = jnp.zeros((n, 6), jnp.float64).at[:, 0].set(vx)
    carry, logs = jax.jit(
        lambda c: rollout(ctl, c, n, v_ref_schedule=sched,
                          perfect_estimator=True))(carry)
    assert not np.any(np.asarray(logs.error))
    # the robot moved forward a significant fraction of the commanded
    # distance (0.3 m/s * ~0.8 s of cruise)
    x_final = float(carry.sim_state.q[0])
    assert x_final > 0.1, f"only advanced {x_final:.3f} m"
    # mean cruise velocity close to the command
    v_cruise = np.asarray(logs.base_vel[300:, 0])
    assert abs(v_cruise.mean() - 0.3) < 0.12


def test_async_mpc_rollout_stands():
    """Stale-plan (async MPC) semantics: closed loop stays upright while
    consuming one-period-stale plans (scripts/MPC_Wrapper.py:89-103)."""
    from qrw_tpu.config import Config
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = Config(mpc_async=True)
    ctl, carry = make_rollout(cfg, dtype=jnp.float64)
    n = 400
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
    _, logs = run(carry)
    bp = np.asarray(logs.base_pos)
    assert abs(bp[-1, 2] - cfg.h_ref) < 0.05, bp[-1]
    assert not bool(np.asarray(logs.error).any())


def test_all_gaits_stand_at_default_timing():
    """Every gait the reference offers (src/Gait.cpp:38-108) survives a
    closed-loop run at the default T_gait=0.32 — including the 4-phase
    walk, which requires the phase-aligned gait init (first swing starts
    at t0=0 after the k=0 roll; the reference's own init starts the
    first swing 25% into its profile)."""
    from qrw_tpu.config import Config
    from qrw_tpu.sim.rollout import make_rollout, rollout
    n = 700
    for gait in ["walk", "pacing", "bounding", "static"]:
        cfg = Config()
        ctl, carry = make_rollout(cfg, dtype=jnp.float64, gait=gait)
        run = jax.jit(lambda c: rollout(
            ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
        _, logs = run(carry)
        bp = np.asarray(logs.base_pos)
        assert abs(bp[-1, 2] - cfg.h_ref) < 0.05, (gait, bp[-1])
        assert not bool(np.asarray(logs.error).any()), gait
