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


def test_reference_default_scenario():
    """The reference's default run to spec: N_SIMULATION=3000 ticks of the
    velID=2 predefined profile (src/config_solo12.yaml:10-14) — the cubic
    ramp toward 0.7 m/s reaches ~0.28 m/s by tick 3000
    (scripts/Joystick.py:232-239: k_switch [0, 7000, ...]). Security
    oracles + velocity tracking at the profile's own pace."""
    from qrw_tpu.core.joystick import v_ref_profile
    cfg = Config(velID=2, N_SIMULATION=3000)
    # f32 deliberately: this long scenario doubles as the TPU-dtype
    # coverage; the f64 closed-loop path is exercised by the module
    # fixture (standing_run), the cruise/async/gait tests above/below,
    # and the hardware parity capture (eval/parity_320, f64)
    ctl, carry = make_rollout(cfg, dtype=jnp.float32)
    n = 3000
    carry, logs = jax.jit(
        lambda c: rollout(ctl, c, n, perfect_estimator=True))(carry)
    assert not np.any(np.asarray(logs.error)), "security latch triggered"
    h = np.asarray(logs.base_pos[:, 2])
    assert np.all(h[100:] > cfg.h_ref - 0.05)
    assert np.all(h[100:] < cfg.h_ref + 0.05)
    # track the profile's commanded velocity over the last 500 ticks
    v_cmd = np.asarray(jax.vmap(
        lambda k: v_ref_profile(k, 2, jnp.float32))(jnp.arange(n)))[:, 0]
    v_mes = np.asarray(logs.base_vel[:, 0])
    assert abs(v_mes[-500:].mean() - v_cmd[-500:].mean()) < 0.1, (
        v_mes[-500:].mean(), v_cmd[-500:].mean())


def test_cruise_at_reference_top_speed():
    """1.3 m/s trot cruise — the velID=2 profile's target plateau
    (scripts/Joystick.py:232-239). The profile itself takes 14000 ticks
    to get there; this test uses a compressed (harsher) linear ramp over
    2500 ticks then asserts a stable 1500-tick cruise at 1.3 m/s."""
    ctl, carry = make_rollout(CFG, dtype=jnp.float64)
    n, ramp = 4000, 2500
    vx = jnp.minimum(1.3, jnp.arange(n) * (1.3 / ramp))
    sched = jnp.zeros((n, 6), jnp.float64).at[:, 0].set(vx)
    carry, logs = jax.jit(
        lambda c: rollout(ctl, c, n, v_ref_schedule=sched,
                          perfect_estimator=True))(carry)
    assert not np.any(np.asarray(logs.error)), "security latch triggered"
    h = np.asarray(logs.base_pos[:, 2])
    assert np.all(h[100:] > CFG.h_ref - 0.05)
    assert np.all(h[100:] < CFG.h_ref + 0.05)
    v_cruise = np.asarray(logs.base_vel[-1200:, 0])
    assert abs(v_cruise.mean() - 1.3) < 0.08, v_cruise.mean()


def test_reference_default_scenario_real_estimator():
    """The reference's default scenario on the estimator it actually
    ships: velID=2, 3000 ticks, perfectEstimator=False
    (scripts/Controller.py:102-111 — the complementary-filter cascade is
    the default; perfect odometry is the exception). Security oracles +
    velocity tracking asserted like the perfect-estimator variant."""
    from qrw_tpu.core.joystick import v_ref_profile
    cfg = Config(velID=2, N_SIMULATION=3000)
    ctl, carry = make_rollout(cfg, dtype=jnp.float32)
    n = 3000
    carry, logs = jax.jit(
        lambda c: rollout(ctl, c, n, perfect_estimator=False))(carry)
    assert not np.any(np.asarray(logs.error)), "security latch triggered"
    h = np.asarray(logs.base_pos[:, 2])
    assert np.all(h[100:] > cfg.h_ref - 0.05)
    assert np.all(h[100:] < cfg.h_ref + 0.05)
    v_cmd = np.asarray(jax.vmap(
        lambda k: v_ref_profile(k, 2, jnp.float32))(jnp.arange(n)))[:, 0]
    v_mes = np.asarray(logs.base_vel[:, 0])
    assert abs(v_mes[-500:].mean() - v_cmd[-500:].mean()) < 0.1, (
        v_mes[-500:].mean(), v_cmd[-500:].mean())


def test_cruise_at_top_speed_real_estimator():
    """1.3 m/s cruise on the real complementary-filter estimator (no
    ground-truth injection anywhere): stable, no security latch,
    velocity within 10% of the command. (Measured: ~1.21 m/s cruise —
    the FK-odometry velocity estimate biases slightly low at speed, the
    same effect the reference absorbs with its adaptive trust
    scheduling, scripts/Estimator.py:503-517.)"""
    ctl, carry = make_rollout(CFG, dtype=jnp.float32)
    n, ramp = 3000, 2000
    vx = jnp.minimum(1.3, jnp.arange(n) * (1.3 / ramp)).astype(jnp.float32)
    sched = jnp.zeros((n, 6), jnp.float32).at[:, 0].set(vx)
    carry, logs = jax.jit(
        lambda c: rollout(ctl, c, n, v_ref_schedule=sched,
                          perfect_estimator=False))(carry)
    assert not np.any(np.asarray(logs.error)), "security latch triggered"
    h = np.asarray(logs.base_pos[:, 2])
    assert np.all(h[100:] > CFG.h_ref - 0.05)
    assert np.all(h[100:] < CFG.h_ref + 0.05)
    v_cruise = np.asarray(logs.base_vel[-800:, 0])
    assert abs(v_cruise.mean() - 1.3) < 0.13, v_cruise.mean()


def test_cruise_at_top_speed_kalman_estimator():
    """Same 1.3 m/s cruise on the contact-gated 18-state Kalman filter
    (kf_enabled, scripts/Estimator.py:88-181): tracks within 0.08."""
    cfg = Config(kf_enabled=True)
    ctl, carry = make_rollout(cfg, dtype=jnp.float32)
    n, ramp = 3000, 2000
    vx = jnp.minimum(1.3, jnp.arange(n) * (1.3 / ramp)).astype(jnp.float32)
    sched = jnp.zeros((n, 6), jnp.float32).at[:, 0].set(vx)
    carry, logs = jax.jit(
        lambda c: rollout(ctl, c, n, v_ref_schedule=sched,
                          perfect_estimator=False))(carry)
    assert not np.any(np.asarray(logs.error)), "security latch triggered"
    v_cruise = np.asarray(logs.base_vel[-800:, 0])
    assert abs(v_cruise.mean() - 1.3) < 0.1, v_cruise.mean()


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


def test_walk_walks_forward():
    """The 4-phase walk WALKS closed-loop (not just stands): a ramped
    0.3 m/s forward command produces sustained forward progress at the
    reference timing (4-phase constructor, src/Gait.cpp:38-57), upright,
    with no security latch."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    ctl, carry = make_rollout(gait="walk", dtype=jnp.float64)
    T = 2000
    t = np.arange(T)
    vx = np.clip((t - 300) / 700.0, 0.0, 1.0) * 0.3
    sched = np.zeros((T, 6)); sched[:, 0] = vx
    carry2, logs = jax.jit(lambda c: rollout(
        ctl, c, T, v_ref_schedule=jnp.asarray(sched)))(carry)
    bp = np.asarray(logs.base_pos)
    assert bp[-1, 0] > 0.5, f"walked only {bp[-1, 0]:.3f} m"
    assert abs(bp[-1, 2] - ctl.cfg.h_ref) < 0.05
    assert not bool(np.asarray(logs.error).any())
    # forward progress is sustained, not a lunge: the last quarter of
    # the run still advances
    assert bp[-1, 0] - bp[3 * T // 4, 0] > 0.1
