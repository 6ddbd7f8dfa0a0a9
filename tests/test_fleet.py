"""Closed-loop FLEET tests: the lane-major phase solver in the loop.

VERDICT r3 #1: the production throughput path must serve the production
loop — these tests run >= 128 closed-loop scenarios whose MPC solves all
go through core/mpc_lane (ONE batched solve per 50 Hz cycle), assert
every robot stays upright with no security latch, and exercise the
straggler fallback contract (a budget-starved cycle ships stale plans,
the fleet survives, and the cold-restarted solver recovers) — the
reference's async staleness semantics (scripts/MPC_Wrapper.py:111-126)
at fleet scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.config import Config
from qrw_tpu.core import mpc_lane as ml
from qrw_tpu.sim import fleet as fl

CFG = Config()


@pytest.fixture(scope="module")
def phase_structure():
    return ml.build_phase_data(CFG, ml.trot_phase_fsteps(CFG))


def test_fleet_128_scenarios_upright(phase_structure):
    """128 perturbed scenarios, 24 MPC cycles (240 ticks), all MPC
    plans from the batched phase path: every robot upright, no latch,
    solver converged, stance forces support the weight."""
    ps = phase_structure
    B = 128
    ctl, carry = fl.make_fleet(CFG, B, ps, tile=1, seed=3)
    run = jax.jit(lambda c: fl.fleet_rollout(
        ctl, c, 24, ps, tile=1, use_ref=True, n_iters=300,
        rescue_cap=8, interpret=True))
    carry2, logs, cyc = run(carry)
    h = np.asarray(logs.base_pos)[:, :, 2]
    assert not bool(np.asarray(logs.error).any()), "security latch"
    assert np.isfinite(h).all()
    assert (h[50:] > CFG.h_ref - 0.05).all()
    assert (h[50:] < CFG.h_ref + 0.05).all()
    conv = np.asarray(cyc.converged)
    assert conv.mean() > 0.995, conv.mean()
    # the consumed first-step forces are stance-scale (plans carry the
    # robot, neither zero nor saturated; trot first-step plans run above
    # static weight because they respond to the height/velocity error of
    # the current state)
    fz = np.asarray(logs.f_mpc)[:, :, 2::3].sum(axis=2)   # (T, B)
    W = CFG.mass * CFG.gravity
    med = float(np.median(fz[50:]))
    assert 0.6 * W < med < 2.0 * W, med
    # phases really rotate p -> p-1 every cycle
    phases = np.asarray(cyc.phase)[:, 0]
    assert ((phases[:-1] - phases[1:]) % CFG.n_steps == 1).all()


def test_fleet_straggler_injection_recovers(phase_structure):
    """Mid-rollout, one cycle runs with a 1-iteration budget and no
    rescue: every lane fails, ships its STALE (rolled) plan, and zeroes
    its warm carry. The fleet must stay upright through the stale cycle
    and the cold-restarted solver must re-converge on the next cycles —
    the fallback contract of scripts/MPC_Wrapper.py:111-126."""
    ps = phase_structure
    B = 16
    ctl, carry = fl.make_fleet(CFG, B, ps, tile=1, seed=7)
    # recovery runs with full rescue capacity: after a fleet-wide fault
    # the post-disturbance states leave the shared prox metric's nominal
    # neighborhood for ~2 cycles, and the second stage is what bridges
    # that transient (phase-stage re-lock asserted below)
    normal = jax.jit(lambda c, n: fl.fleet_rollout(
        ctl, c, n, ps, tile=1, use_ref=True, n_iters=300,
        rescue_cap=B, interpret=True), static_argnums=1)
    crippled = jax.jit(lambda c: fl.fleet_rollout(
        ctl, c, 1, ps, tile=1, use_ref=True, n_iters=1,
        rescue_cap=0, interpret=True))

    carry, logs1, cyc1 = normal(carry, 8)
    assert np.asarray(cyc1.converged)[-1].all()
    f_before = np.asarray(carry.lane_state.f)

    carry, logs2, cyc2 = crippled(carry)
    assert not np.asarray(cyc2.converged).any(), "cycle must fail"
    # the shipped plan is the rolled stale plan, not the 1-iter garbage:
    # the consumed first-step forces equal the pre-fault carry's step-1
    # forces (roll semantics of shift_lane_state)
    shipped = np.asarray(logs2.f_mpc)[0]               # (B, 12)
    stale = f_before.reshape(CFG.n_steps, 4, 3, B)[1]  # step 1 -> step 0
    np.testing.assert_allclose(
        shipped, stale.reshape(12, B).T, atol=1e-5)
    assert float(np.abs(np.asarray(carry.lane_state.f)).max()) == 0.0

    carry, logs3, cyc3 = normal(carry, 6)
    assert not bool(np.asarray(logs3.error).any()), "latched after fault"
    conv3 = np.asarray(cyc3.converged)
    assert conv3.mean() > 0.99, conv3.mean(axis=1)
    # the PHASE stage itself re-locks once the robots recover: the last
    # cycles converge within budget without needing the rescue
    iters3 = np.asarray(cyc3.iters)
    assert (iters3[-2:] < 300).mean() > 0.9, iters3.mean(axis=1)
    h = np.asarray(logs3.base_pos)[:, :, 2]
    assert (h[-20:] > CFG.h_ref - 0.05).all()
    assert (h[-20:] < CFG.h_ref + 0.05).all()


def test_fleet_forward_velocity_tracking(phase_structure):
    """A 16-scenario fleet commanded to 0.4 m/s tracks the command
    through the batched phase MPC (closed-loop tracking, not just
    standing)."""
    ps = phase_structure
    B = 16
    n_cycles = 40
    n = n_cycles * CFG.k_mpc
    ctl, carry = fl.make_fleet(CFG, B, ps, tile=1, seed=11,
                               perturb_q=0.005, perturb_v=0.01)
    vx = np.minimum(0.4, np.arange(n) * 0.002)
    sched = np.zeros((n, 6), np.float32)
    sched[:, 0] = vx
    run = jax.jit(lambda c: fl.fleet_rollout(
        ctl, c, n_cycles, ps, tile=1, use_ref=True, n_iters=300,
        rescue_cap=4, interpret=True,
        v_ref_schedule=jnp.asarray(sched)))
    carry2, logs, cyc = run(carry)
    assert not bool(np.asarray(logs.error).any())
    x_final = np.asarray(carry2.sim_states.q)[:, 0]
    assert (x_final > 0.05).all(), x_final
    assert np.asarray(cyc.converged).mean() > 0.99


def test_fleet_real_estimator(phase_structure):
    """A small fleet on the SHIPPING estimator configuration (the
    complementary filter, perfect_estimator=False,
    scripts/Controller.py:102-111): upright, converged, no latch."""
    ps = phase_structure
    B = 8
    ctl, carry = fl.make_fleet(CFG, B, ps, tile=1, seed=21,
                               perturb_q=0.005, perturb_v=0.01)
    run = jax.jit(lambda c: fl.fleet_rollout(
        ctl, c, 14, ps, tile=1, use_ref=True, n_iters=300,
        rescue_cap=4, interpret=True, perfect_estimator=False))
    carry2, logs, cyc = run(carry)
    assert not bool(np.asarray(logs.error).any())
    h = np.asarray(logs.base_pos)[:, :, 2]
    assert (h[40:] > CFG.h_ref - 0.05).all()
    assert (h[40:] < CFG.h_ref + 0.05).all()
    assert np.asarray(cyc.converged).mean() > 0.99


def test_fleet_pacing_gait():
    """The fleet machinery generalizes beyond the trot: a pacing fleet
    (second gait, its own cyclic phase set + in-graph rotation) stays
    upright with the batched phase MPC in the loop."""
    phase_fs = ml.gait_phase_fsteps(CFG, "pacing")
    ps = ml.build_phase_data(CFG, phase_fs)
    B = 8
    ctl, carry = fl.make_fleet(CFG, B, ps, tile=1, seed=5,
                               perturb_q=0.005, perturb_v=0.01,
                               gait="pacing")
    run = jax.jit(lambda c: fl.fleet_rollout(
        ctl, c, 16, ps, tile=1, use_ref=True, n_iters=400,
        rescue_cap=B, interpret=True))
    carry2, logs, cyc = run(carry)
    assert not bool(np.asarray(logs.error).any())
    h = np.asarray(logs.base_pos)[:, :, 2]
    assert (h[50:] > CFG.h_ref - 0.05).all()
    assert (h[50:] < CFG.h_ref + 0.05).all()
    assert np.asarray(cyc.converged).mean() > 0.95, \
        np.asarray(cyc.converged).mean(axis=1)
    phases = np.asarray(cyc.phase)[:, 0]
    assert ((phases[:-1] - phases[1:]) % 16 == 1).all()
