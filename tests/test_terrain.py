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
    # flat at origin, red step at y=0.5, staircase risers further out
    assert float(T.height_at(tr, jnp.asarray([0.0, 0.0]))) == 0.0
    assert float(T.height_at(tr, jnp.asarray([0.0, 0.5]))) > 0.015
    h1 = float(T.height_at(tr, jnp.asarray([0.0, 3.3])))
    h2 = float(T.height_at(tr, jnp.asarray([0.0, 3.9])))
    assert h2 > h1 > 0.05


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
