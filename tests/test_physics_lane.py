"""Parity: lane-major fleet physics step vs vmap(sim.physics.step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.config import Config
from qrw_tpu.models.solo12 import make_solo12
from qrw_tpu.ops import rbd
from qrw_tpu.ops import rbd_lane as rl
from qrw_tpu.sim.physics import init_sim_state, step
from qrw_tpu.sim.physics_lane import step_lane
from qrw_tpu.sim.terrain import make_bumpy

B = 5


def _batched_state(cfg, rng, dtype=jnp.float64, terrain=None):
    ss0 = init_sim_state(cfg, dtype=dtype, terrain=terrain)
    ss = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape).copy(), ss0)
    ss = ss._replace(
        q=ss.q.at[:, 7:].add(
            jnp.asarray(0.05 * rng.normal(size=(B, 12)), dtype)),
        v=ss.v.at[:, :].add(
            jnp.asarray(0.05 * rng.normal(size=(B, 18)), dtype)))
    return ss


@pytest.mark.parametrize("use_terrain", [False, True])
def test_step_lane_matches_vmap_step(use_terrain):
    cfg = Config()
    rng = np.random.default_rng(0)
    terrain = (jax.tree.map(lambda a: a.astype(jnp.float64), make_bumpy())
               if use_terrain else None)
    ss_a = _batched_state(cfg, rng, terrain=terrain)
    ss_b = ss_a

    model = rbd.to_jax(make_solo12())
    P = jnp.full((B, 12), cfg.joint_P, jnp.float64)
    D = jnp.full((B, 12), cfg.joint_D, jnp.float64)
    q_des = ss_a.q[:, 7:] + 0.02
    v_des = jnp.zeros((B, 12), jnp.float64)
    tau_ff = jnp.asarray(0.1 * rng.normal(size=(B, 12)))
    f_ext = jnp.asarray(rng.normal(size=(B, 3)))

    q_des_b = q_des + jnp.asarray(0.01 * rng.normal(size=(B, 12)))
    vstep = jax.jit(jax.vmap(
        lambda s, qd, tf, fe: step(cfg, model, s, P[0], D[0], qd,
                                   v_des[0], tf, f_ext=fe,
                                   terrain=terrain)))
    lane = rl.to_lane(model)
    lstep = jax.jit(lambda s, qd, tf, fe: step_lane(
        cfg, lane, s, P, D, qd, v_des, tf, f_ext=fe, terrain=terrain))

    for _ in range(6):    # several ticks: airborne -> contact -> slide
        ss_a, dev_a = vstep(ss_a, q_des_b, tau_ff, f_ext)
        ss_b, dev_b = lstep(ss_b, q_des_b, tau_ff, f_ext)

    for name in ["q", "v", "anchors", "prev_o_imu_vel", "joint_torques"]:
        a = np.asarray(getattr(ss_a, name))
        b = np.asarray(getattr(ss_b, name))
        np.testing.assert_allclose(b, a, atol=1e-8, err_msg=name)
    assert (np.asarray(ss_a.active) == np.asarray(ss_b.active)).all()
    for name in DeviceFields:
        a = np.asarray(getattr(dev_a, name))
        b = np.asarray(getattr(dev_b, name))
        np.testing.assert_allclose(b, a, atol=1e-8, err_msg=name)


DeviceFields = ["base_lin_acc", "base_ang_vel", "base_quat", "q_mes",
                "v_mes", "dummy_pos", "b_base_vel"]
