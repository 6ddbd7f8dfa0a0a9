"""Parity: lane-major WBC vs vmap(core.wbc.compute_wbc).

Both paths solve the same box QP to the same OSQP termination criterion
(eps 1e-5 on unscaled residuals) through different algorithms (Ruiz-
scaled generic ADMM vs unscaled structured ADMM), so the QP outputs
agree to solver tolerance and everything downstream (torques, targets)
to the same scale; the IK half is algebraically identical and matches
to fp roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.config import Config
from qrw_tpu.core import wbc as wbc_mod
from qrw_tpu.core.wbc_lane import compute_wbc_lane
from qrw_tpu.models.solo12 import make_solo12
from qrw_tpu.ops import rbd
from qrw_tpu.ops import rbd_lane as rl

B = 8


@pytest.fixture(scope="module")
def inputs():
    cfg = Config()
    rng = np.random.default_rng(7)
    q_init = np.asarray(cfg.q_init)
    qj = jnp.asarray(q_init[None] + 0.1 * rng.normal(size=(B, 12)))
    b_v = jnp.asarray(0.2 * rng.normal(size=(B, 18)))
    # realistic standing force command: weight over stance feet
    contacts = jnp.asarray(
        (rng.uniform(size=(B, 4)) > 0.4).astype(float))
    contacts = contacts.at[0].set(jnp.ones(4))       # one all-stance row
    nst = jnp.maximum(contacts.sum(axis=1, keepdims=True), 1.0)
    fz = cfg.mass * cfg.gravity / nst
    f_cmd = jnp.zeros((B, 12))
    for f in range(4):
        f_cmd = f_cmd.at[:, 3 * f + 2].set(fz[:, 0] * contacts[:, f])
    f_cmd = f_cmd + jnp.asarray(0.3 * rng.normal(size=(B, 12)))
    pg = jnp.asarray(
        np.stack([[0.19, 0.19, -0.19, -0.19],
                  [0.15, -0.15, 0.15, -0.15],
                  [-0.22, -0.22, -0.22, -0.22]])[None]
        + 0.02 * rng.normal(size=(B, 3, 4)))
    vg = jnp.asarray(0.1 * rng.normal(size=(B, 3, 4)))
    ag = jnp.asarray(0.5 * rng.normal(size=(B, 3, 4)))
    st = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape).astype(
            jnp.float64),
        wbc_mod.init_wbc_state(jnp.float64))
    return cfg, st, qj, b_v, f_cmd, contacts, pg, vg, ag


def test_wbc_lane_matches_vmap(inputs):
    cfg, st, qj, b_v, f_cmd, contacts, pg, vg, ag = inputs
    model = rbd.to_jax(make_solo12())
    lane = rl.to_lane(model)

    ref = jax.jit(jax.vmap(
        lambda s, q, v, f, c, p, vv, a: wbc_mod.compute_wbc(
            cfg, model, s, q, v, f, c, p, vv, a)))(
        st, qj, b_v, f_cmd, contacts, pg, vg, ag)
    ours = jax.jit(lambda s, q, v, f, c, p, vv, a: compute_wbc_lane(
        cfg, lane, s, q, v, f, c, p, vv, a))(
        st, qj, b_v, f_cmd, contacts, pg, vg, ag)

    # IK half: identical algebra -> roundoff
    np.testing.assert_allclose(ours.qdes, ref.qdes, atol=1e-9)
    np.testing.assert_allclose(ours.vdes, ref.vdes, atol=1e-9)
    np.testing.assert_allclose(ours.feet_pos, ref.feet_pos, atol=1e-12)
    np.testing.assert_allclose(ours.feet_vel, ref.feet_vel, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.state.k_since_contact),
                               np.asarray(ref.state.k_since_contact))

    # QP half: same optimum to solver tolerance (different algorithms)
    np.testing.assert_allclose(ours.f_with_delta, ref.f_with_delta,
                               atol=2e-3)
    np.testing.assert_allclose(ours.tau_ff, ref.tau_ff, atol=2e-3)
    np.testing.assert_allclose(ours.ddq_cmd, ref.ddq_cmd, atol=2e-2)

    # the lane solver converged (did not just hit the cap)
    assert int(np.asarray(ours.qp_iters).max()) < cfg.wbc_max_iter


def test_wbc_lane_qp_constraints_hold(inputs):
    """The QP solution satisfies the friction-cone box (src/QPWBC.cpp
    G(f_cmd + df) in [0, fz_max]) to solver tolerance."""
    cfg, st, qj, b_v, f_cmd, contacts, pg, vg, ag = inputs
    lane = rl.to_lane(rbd.to_jax(make_solo12()))
    ours = jax.jit(lambda: compute_wbc_lane(
        cfg, lane, st, qj, b_v, f_cmd, contacts, pg, vg, ag))()
    G = np.asarray(wbc_mod.friction_generators(cfg.mu))
    gf = np.asarray(ours.f_with_delta) @ G.T
    assert gf.min() > -1e-3
    assert gf.max() < cfg.fz_max + 1e-3
