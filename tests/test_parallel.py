"""Multi-device sharding correctness on the 8-virtual-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8): the sharded
program must produce EXACTLY the numbers of the unsharded one, and the
cross-device collectives must agree with plain reductions. This is the
in-suite backing for the driver's dryrun_multichip and the bench's
scaling measurement (SURVEY.md section 2.3: scenario data parallelism
over a 1-D "dp" mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.config import Config
from qrw_tpu.parallel.mesh import (make_mesh, scenario_metrics,
                                   shard_batch, sharded_vmap)

CFG = Config()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 devices"
    return make_mesh()


def test_sharded_rollout_matches_vmap(mesh):
    """shard_map(vmap(rollout)) == vmap(rollout) to f32 reproducibility
    limits: scenario data parallelism adds no collectives to the hot
    loop, but XLA compiles the sharded and unsharded programs
    separately and is free to reorder f32 reductions, so agreement is
    to ~1e-3 over a 40-tick closed loop rather than bit-exact (the
    contact dynamics amplify f32 reduction-order noise)."""
    from qrw_tpu.sim.rollout import make_rollout, rollout

    ctl, carry1 = make_rollout(CFG, dtype=jnp.float32)
    B = 8
    carry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), carry1)
    rng = np.random.default_rng(0)
    vref = jnp.asarray(
        rng.uniform(-0.2, 0.2, size=(B, 40, 6)), jnp.float32)

    def one(c, v):
        c2, logs = rollout(ctl, c, 40, v_ref_schedule=v)
        return c2.sim_state.q, c2.sim_state.v, logs.tau_ff

    ref = jax.jit(jax.vmap(one))(carry, vref)
    carry_s = shard_batch(carry, mesh)
    vref_s = shard_batch(vref, mesh)
    got = jax.jit(sharded_vmap(one, mesh))(carry_s, vref_s)
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-3)


def test_sharded_mpc_batch_matches_vmap(mesh):
    """The batched MPC solve (the bench workload) sharded over the mesh
    equals the unsharded vmap solve (same per-problem program; f32
    reduction-order tolerance)."""
    from qrw_tpu.core import mpc as mpc_mod
    from qrw_tpu.ops import qp

    rng = np.random.default_rng(1)
    B = 16
    N = CFG.n_steps
    xrefs = np.zeros((B, 12, N + 1), np.float32)
    xrefs[:, 2, :] = 0.2447
    xrefs[:, :, 0] += rng.normal(scale=0.01, size=(B, 12))
    foothold = np.array([0.195, 0.147, 0., 0.195, -0.147, 0.,
                         -0.195, 0.147, 0., -0.195, -0.147, 0.])
    fsteps = np.zeros((B, CFG.N_gait, 12), np.float32)
    fsteps[:, :N] = foothold
    settings = qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=200)

    def one(x, f):
        res = mpc_mod.solve_mpc(CFG, x, f, settings=settings)
        return res.x_f_applied, res.iters

    xj = jnp.asarray(xrefs)
    fj = jnp.asarray(fsteps)
    ref = jax.jit(jax.vmap(one))(xj, fj)
    got = jax.jit(sharded_vmap(one, mesh))(shard_batch(xj, mesh),
                                           shard_batch(fj, mesh))
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-4)


def test_scenario_metrics_psum_matches_plain(mesh):
    """The ICI collective aggregation (psum/pmean/pmax inside shard_map)
    equals plain reductions."""
    rng = np.random.default_rng(2)
    errors = jnp.asarray(rng.random(16) < 0.25)
    iters = jnp.asarray(rng.integers(10, 400, size=16), jnp.int32)
    plain = scenario_metrics(errors, iters)
    shard = scenario_metrics(shard_batch(errors, mesh),
                             shard_batch(iters, mesh), mesh=mesh)
    for k in plain:
        np.testing.assert_allclose(np.asarray(shard[k]),
                                   np.asarray(plain[k]), rtol=1e-6)
