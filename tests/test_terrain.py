"""Terrain height fields + fault-injection schedules + rollouts on them."""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.sim import faults, terrain as T

CFG = Config()


def test_bumpy_matches_reference_generation():
    """Same python random.seed(41) procedural pattern as
    scripts/PyBulletSimulator.py:42-66."""
    import random
    tr = T.make_bumpy(rows=512)
    rnd = random.Random(41)
    # first generated cell: data[0, 1] == first uniform draw (before the
    # mean shift); verify relative structure instead of absolutes
    h = np.asarray(tr.heights)
    first = rnd.uniform(0, 0.05)
    np.testing.assert_allclose(h[0, 1] - h[0, 0], first - first * 0.5,
                               atol=1e-12)
    assert h.shape == (512, 512)
    # perturbation amplitude bounded by the reference range
    assert (h.max() - h.min()) <= 0.05 + 1e-9


def test_height_at_bilinear():
    hm = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
    tr = T.Terrain(heights=hm, cell=jnp.asarray(1.0),
                   origin=jnp.asarray([0.0, 0.0]))
    # corners and center
    np.testing.assert_allclose(
        float(T.height_at(tr, jnp.asarray([0.0, 0.0]))), 0.0)
    np.testing.assert_allclose(
        float(T.height_at(tr, jnp.asarray([0.5, 0.5]))), 1.5)
    np.testing.assert_allclose(
        float(T.height_at(tr, jnp.asarray([0.999, 0.0]))), 0.999,
        atol=1e-3)


def test_stairs_profile():
    tr = T.make_stairs()
    # flat at origin, red perturbation step at y=0.5
    assert float(T.height_at(tr, jnp.asarray([0.0, 0.0]))) == 0.0
    assert float(T.height_at(tr, jnp.asarray([0.0, 0.5]))) > 0.015
    # true bauzil geometry (vendored from the reference's STL + URDF
    # transform): a flight of stairs at x ~ -1.5 descending toward +y,
    # and the raised platform at (0.5, -2.0)
    h_hi = float(T.height_at(tr, jnp.asarray([-1.5, -0.3])))
    h_mid = float(T.height_at(tr, jnp.asarray([-1.5, 0.3])))
    h_plat = float(T.height_at(tr, jnp.asarray([0.5, -2.0])))
    assert h_hi > h_mid > 0.05, (h_hi, h_mid)
    assert abs(h_plat - 0.29) < 0.03, h_plat


def test_bell_profile_boundary_conditions():
    """4th-order bell: 0 at ends, 1 at midpoint
    (scripts/PyBulletSimulator.py:402-427)."""
    p = faults.bell_profile(1000, 100, 500)
    assert p[99] == 0.0 and p[100] == 0.0
    assert p[601] == 0.0
    np.testing.assert_allclose(p[350], 1.0, atol=1e-12)
    assert np.all(p >= 0) and np.all(p <= 1.0 + 1e-12)


def test_velID4_schedule():
    s = faults.default_perturbations(CFG.replace(velID=4), 6000)
    assert s[4500, 2] < 0 and s[5500, 1] > 0
    assert np.all(s[:4250] == 0)


def test_rollout_on_bumpy_terrain_stands():
    from qrw_tpu.sim.rollout import make_rollout, rollout
    tr = T.make_bumpy(rows=128, dtype=jnp.float64)
    ctl, carry = make_rollout(dtype=jnp.float64)
    n = 400
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64),
        terrain=tr))
    _, logs = run(carry)
    bp = np.asarray(logs.base_pos)
    assert abs(bp[-1, 2] - ctl.cfg.h_ref) < 0.08, bp[-1]
    assert not bool(np.asarray(logs.error).any())


def test_terrain_settling_init():
    """Contact-settling init: on terrain the robot starts with its feet
    on the local ground, not interpenetrating
    (scripts/PyBulletSimulator.py:222-265)."""
    from qrw_tpu.models.solo12 import H_INIT
    from qrw_tpu.sim.physics import init_sim_state
    hm = jnp.full((32, 32), 0.04)
    tr = T.Terrain(heights=hm, cell=jnp.asarray(0.1),
                   origin=jnp.asarray([-1.6, -1.6]))
    ss = init_sim_state(CFG, terrain=tr, dtype=jnp.float64)
    np.testing.assert_allclose(float(ss.q[2]), H_INIT + 0.04, atol=1e-6)


def test_projectile_launch_and_hit():
    """envID=1 spheres: parked until the robot's y crosses the trigger,
    then ballistic toward the robot; a hit pushes on the base
    (scripts/PyBulletSimulator.py:144-175, 289-298)."""
    from qrw_tpu.sim.physics import (Projectiles, init_projectiles,
                                     step_projectiles)
    proj = init_projectiles(jnp.float64)
    base = jnp.asarray([0.0, 0.0, 0.25], jnp.float64)
    p1, f = step_projectiles(CFG, proj, base, 0.002)
    assert not bool(p1.launched.any())          # not triggered yet
    np.testing.assert_allclose(np.asarray(p1.pos), np.asarray(proj.pos))
    # robot reaches y = 0.95: sphere 1 launches (+x direction)
    base = jnp.asarray([0.0, 0.95, 0.25], jnp.float64)
    p2, f = step_projectiles(CFG, p1, base, 0.002)
    assert bool(p2.launched[0]) and not bool(p2.launched[1])
    assert float(p2.vel[0, 0]) > 2.0            # launch velocity +2.5 x
    # fly it until it crosses the robot x; a contact force must appear
    hit_force = 0.0
    p = p2
    for _ in range(400):
        p, f = step_projectiles(CFG, p, base, 0.002)
        hit_force = max(hit_force, float(jnp.linalg.norm(f)))
    assert hit_force > 1.0, hit_force           # the robot got pushed


def test_envid1_rollout_with_projectiles():
    """Closed loop in the envID=1 world: the sim state carries the
    spheres; a forward walk through the triggers stays alive."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = Config(envID=1)
    tr = T.make_stairs(rows=256, cell=0.02, dtype=jnp.float64)
    ctl, carry = make_rollout(cfg, dtype=jnp.float64, terrain=tr)
    assert carry.sim_state.proj is not None
    n = 300
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64),
        terrain=tr))
    c2, logs = run(carry)
    assert not bool(np.asarray(logs.error).any())
    assert np.isfinite(np.asarray(c2.sim_state.proj.pos)).all()


def test_rollout_survives_push():
    """Bell-curve push fault injection in closed loop."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    ctl, carry = make_rollout(dtype=jnp.float64)
    n = 500
    f_ext = jnp.asarray(
        faults.force_schedule(n, [(150, 200, [0.0, 3.0, 0.0])]),
        jnp.float64)
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64),
        f_ext_schedule=f_ext))
    _, logs = run(carry)
    bp = np.asarray(logs.base_pos)
    assert abs(bp[-1, 2] - ctl.cfg.h_ref) < 0.05, bp[-1]
    assert not bool(np.asarray(logs.error).any())
