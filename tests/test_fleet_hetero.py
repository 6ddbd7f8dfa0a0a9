"""Heterogeneous fleet: gaits x velocity profiles x terrains in ONE
batched closed loop (BASELINE config #5's mixed-scenario sweep;
reference worlds scripts/PyBulletSimulator.py:36-175)."""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.sim import fleet as fl

CFG = Config()


def test_hetero_fleet_mixed_gaits_terrains():
    B, tile, C = 6, 1, 8
    ctl, carry, ps, terrain, meta = fl.make_hetero_fleet(
        CFG, B, tile=tile, gaits=("trot", "walk", "bounding"),
        velIDs=(0, 2), terrain_ids=(0, 1), seed=3)
    # every gait and terrain is present
    assert set(meta.tile_gait) == {0, 1, 2}
    assert set(meta.tid) == {0, 1}

    sched = fl.hetero_v_ref_schedule(CFG, meta.velID, C * CFG.k_mpc)
    carry2, logs, cyc = jax.jit(lambda c, s: fl.fleet_rollout(
        ctl, c, C, ps, tile=tile, rescue_cap=2, terrain=terrain,
        phase_offsets=meta.phase_offsets,
        phase_periods=meta.phase_periods,
        perfect_estimator=False, v_ref_schedule=s,
        use_ref=True, interpret=True))(carry, sched)

    # all scenarios upright, no security latch
    z = np.asarray(carry2.sim_states.q[:, 2])
    assert (z > 0.15).all(), z
    assert not np.asarray(carry2.ctl_states.error).any()

    # the solver serves the mixed fleet (not just the rescue fallback)
    conv = np.asarray(cyc.converged)
    assert conv.mean() > 0.85, conv.mean()

    # per-tile phases stay inside their gait's union range and rotate
    # cyclically within it
    ph = np.asarray(cyc.phase)                      # (C, n_tiles)
    offs = meta.phase_offsets
    pers = meta.phase_periods
    for t in range(ph.shape[1]):
        assert ((ph[:, t] >= offs[t])
                & (ph[:, t] < offs[t] + pers[t])).all(), (t, ph[:, t])
        steps = (ph[:-1, t] - ph[1:, t]) % pers[t]
        assert (steps == 1).all(), (t, ph[:, t])

    # walk tiles actually use the 3-stance capacity classes
    walk_tiles = np.where(meta.tile_gait == 1)[0]
    assert walk_tiles.size
    w_sup = ps.supports[offs[walk_tiles[0]]]
    assert w_sup.reshape(CFG.n_steps, 4).sum(axis=1).max() == 3


def test_hetero_schedule_follows_each_profile():
    from qrw_tpu.core.joystick import v_ref_profile
    velID = np.array([0, 2, 5])
    sched = fl.hetero_v_ref_schedule(CFG, velID, 50, jnp.float64)
    for b, vid in enumerate(velID):
        want = jax.vmap(lambda k: v_ref_profile(
            k, int(vid), jnp.float64))(jnp.arange(50))
        np.testing.assert_allclose(np.asarray(sched[:, b]),
                                   np.asarray(want))
