"""Independent oracles for the in-graph contact simulator (SURVEY §7
step 6 — PyBullet is not installable here, so the cross-checks are an
integrator-refinement oracle and closed-form static mechanics).

1. Integration error: the production timestep (sim_substeps=4, dt
   0.5 ms) against a 5x-finer f64 reference integration of the SAME
   closed-loop trot — the controller pipeline is identical, only the
   physics integration differs, so the divergence bounds the
   integrator's contribution to every trajectory this suite relies on.
2. Static mechanics: a robot held at its standing configuration must
   settle to analytic force balance — total normal force equal to the
   model weight, zero tangential force drift, and penetration depths
   consistent with the compliant law fn = kp * pen at rest
   (sim/physics._contact_forces).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.models.solo12 import TOTAL_MASS, make_solo12
from qrw_tpu.ops import rbd
from qrw_tpu.sim.physics import (_contact_forces, init_sim_state, step)
from qrw_tpu.sim.rollout import make_rollout, rollout

T = 500   # 1 s of closed-loop trot


def test_production_timestep_tracks_fine_dt_oracle():
    trajs = {}
    for ss in (4, 20):
        cfg = Config(sim_substeps=ss)
        ctl, carry = make_rollout(cfg, dtype=jnp.float64)
        _, logs = jax.jit(lambda c, _ctl=ctl: rollout(_ctl, c, T))(carry)
        trajs[ss] = (np.asarray(logs.base_pos),
                     np.asarray(logs.base_quat),
                     np.asarray(logs.error))
    assert trajs[4][2].sum() == 0 and trajs[20][2].sum() == 0
    dpos = np.abs(trajs[4][0] - trajs[20][0]).max(axis=0)
    dquat = np.abs(trajs[4][1] - trajs[20][1]).max()
    # measured: max |dpos| ~2.6e-4 m, |dquat| ~2.1e-4 over 1 s; assert
    # with ~8x headroom — a regression in the integrator or contact
    # model shows up orders of magnitude above this
    assert (dpos < 2e-3).all(), dpos
    assert dquat < 2e-3, dquat


def test_static_equilibrium_matches_analytic_weight():
    cfg = Config()
    model = rbd.to_jax(make_solo12())
    ss = init_sim_state(cfg, dtype=jnp.float64)
    q_init = ss.q[7:]
    P = jnp.full(12, 6.0, jnp.float64)
    D = jnp.full(12, 0.3, jnp.float64)

    def tick(s, _):
        s, _dev = step(cfg, model, s, P, D, q_init,
                       jnp.zeros(12, jnp.float64),
                       jnp.zeros(12, jnp.float64))
        return s, None

    s, _ = jax.jit(lambda s: jax.lax.scan(tick, s, None, length=1000))(ss)

    kin = rbd.frame_kinematics(model, s.q[0:3], s.q[3:7], s.q[7:],
                               s.v[0:6], s.v[6:])
    forces, _, in_ground = _contact_forces(cfg, s, kin.pos, kin.vel)
    forces = np.asarray(forces)
    assert bool(np.asarray(in_ground).all())

    # total normal force = weight (the compliant model's fixed point)
    w = TOTAL_MASS * cfg.gravity
    assert abs(forces[:, 2].sum() - w) < 0.02 * w, forces[:, 2]

    # at rest: fn = kp * penetration (damping term vanishes)
    pen = -np.asarray(kin.pos)[:, 2]
    np.testing.assert_allclose(forces[:, 2],
                               cfg.ground_stiffness * pen, rtol=0.02)

    # static moment balance about the support centroid: sum of
    # fn_i * (r_i - centroid) must cancel the weight's moment => with
    # the moments taken about the measured CoP it is ~0
    cop = (forces[:, 2:3] * np.asarray(kin.pos)[:, 0:2]).sum(0) \
        / forces[:, 2].sum()
    moment = (forces[:, 2:3]
              * (np.asarray(kin.pos)[:, 0:2] - cop)).sum(axis=0)
    assert np.abs(moment).max() < 1e-6 * w

    # the robot is at rest (velocities decayed)
    assert np.abs(np.asarray(s.v)).max() < 1e-3
