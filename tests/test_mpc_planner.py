"""Footstep-optimizing DDP MPC (MPC_crocoddyl_planner equivalent).

Physics/structure invariants:
  * landing-mask algebra matches the reference's Step-node insertion rule
    (step models precede nodes where feet touch down,
    MPC_crocoddyl_planner.py:333-340,427-432);
  * 4-stance equilibrium: forces mg/4, feet stay put (no step incentive);
  * trot with a forward velocity reference: optimized touchdown points
    move AHEAD of the shoulder projection (the Raibert symmetry term) and
    stay within a sane step length;
  * swing feet carry zero force; batch == single.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core import mpc_ddp_planner as planner
from tests.test_mpc import (_fsteps_fourstance, _fsteps_trot, _xref, H0,
                            MG4, CFG)

FEET0 = np.vstack([planner.P0_SHOULDERS.reshape(4, 2).T, np.zeros((1, 4))])


def test_landing_mask():
    gait = jnp.asarray(np.array([[1, 1, 1, 1],
                                 [1, 0, 0, 1],
                                 [1, 0, 0, 1],
                                 [1, 1, 1, 1],
                                 [0, 1, 1, 0]], np.float64))
    land = np.asarray(planner.landing_mask(gait, gait[0]))
    np.testing.assert_allclose(land[0], 0.0)          # no edge at node 0
    np.testing.assert_allclose(land[1], 0.0)          # feet lifting, not landing
    np.testing.assert_allclose(land[3], [0, 1, 1, 0])  # mid feet touch down
    np.testing.assert_allclose(land[4], 0.0)


def test_planner_fourstance_equilibrium():
    xref = jnp.asarray(_xref())
    fsteps = jnp.asarray(_fsteps_fourstance())
    st = planner.init_planner_state(CFG, jnp.float64)
    res = None
    for i in range(30):
        res = planner.solve_mpc_planner(CFG, xref, fsteps,
                                        jnp.asarray(FEET0), st)
        st = res.state
        xref = xref.at[:, 0].set(res.x_f_applied[:12, 0])
    f0 = np.asarray(res.x_f_applied)[12:, 0]
    np.testing.assert_allclose(f0[2::3], MG4, rtol=0.06)
    # no landing events in all-stance -> feet never move
    np.testing.assert_allclose(np.asarray(res.fsteps)[0, 0::3],
                               FEET0[0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.x_f_applied)[2, 0], H0,
                               atol=5e-3)


def test_planner_trot_steps_forward():
    """With a forward velocity reference the optimized touchdowns shift
    forward of the shoulders (symmetry term) but stay bounded."""
    vx = 0.5
    xref = _xref()
    xref[6, :] = vx           # steady forward trot (x0 velocity too —
    xref[0, 1:] = vx * 0.02 * np.arange(1, 17)  # no accel transient)
    xref = jnp.asarray(xref)
    fsteps = jnp.asarray(_fsteps_trot(3))
    res = planner.solve_mpc_planner(CFG, xref, fsteps, jnp.asarray(FEET0),
                                    planner.init_planner_state(
                                        CFG, jnp.float64))
    o_t = np.asarray(res.o_target)                      # (3, 4)
    dx = o_t[0] - FEET0[0]
    land_any = np.asarray(
        planner.landing_mask(
            jnp.asarray((_fsteps_trot(3)[:16, 0::3] != 0).astype(float)),
            jnp.asarray((_fsteps_trot(3)[0, 0::3] != 0).astype(float)))
    ).any(axis=0)
    assert np.all(dx[land_any] > 0.0), dx
    assert np.all(np.abs(dx) < 0.3), dx
    assert np.all(np.isfinite(np.asarray(res.x_f_applied)))


def test_planner_swing_forces_zero_and_fsteps_masked():
    xref = jnp.asarray(_xref())
    fsteps_np = _fsteps_trot(0)
    res = planner.solve_mpc_planner(CFG, xref, jnp.asarray(fsteps_np),
                                    jnp.asarray(FEET0),
                                    planner.init_planner_state(
                                        CFG, jnp.float64))
    gait = (fsteps_np[:16, 0::3] != 0)
    forces = np.asarray(res.x_f_applied)[12:, :].T.reshape(16, 4, 3)
    np.testing.assert_allclose(forces[~gait], 0.0, atol=1e-12)
    fs = np.asarray(res.fsteps).reshape(16, 4, 3)
    np.testing.assert_allclose(fs[~gait], 0.0, atol=1e-12)
    assert np.all(fs[gait][:, 2] == 0.0)                # feet on the ground


def test_planner_backend_rollout_stands():
    """Full closed-loop rollout with the footstep-optimizing MPC driving
    both the forces and the swing-foot touchdown targets."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = CFG.replace(mpc_planner=True)
    ctl, carry = make_rollout(cfg, dtype=jnp.float64)
    n = 400
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
    carry2, logs = run(carry)
    bp = np.asarray(logs.base_pos)
    assert abs(bp[-1, 2] - cfg.h_ref) < 0.05, bp[-1]
    assert not bool(np.asarray(logs.error).any())


def test_planner_batched_matches_single():
    xrefs = np.stack([_xref(), _xref([0.02, 0, H0, 0, 0, 0,
                                      0.1, 0, 0, 0, 0, 0])])
    fsteps = np.stack([_fsteps_trot(0), _fsteps_trot(5)])
    feet = np.stack([FEET0, FEET0])
    single = [planner.solve_mpc_planner(
        CFG, jnp.asarray(xrefs[i]), jnp.asarray(fsteps[i]),
        jnp.asarray(feet[i])) for i in range(2)]
    batched = jax.vmap(lambda x, f, p: planner.solve_mpc_planner(
        CFG, x, f, p))(jnp.asarray(xrefs), jnp.asarray(fsteps),
                       jnp.asarray(feet))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(batched.x_f_applied[i]),
                                   np.asarray(single[i].x_f_applied),
                                   atol=1e-8)
