"""Scenario-parallel execution over a TPU device mesh.

The reference's only concurrency is POSIX processes + shared-memory
mailboxes (scripts/MPC_Wrapper.py:150-225, SURVEY.md section 2.3). The
TPU-native scaling model is entirely different and much stronger: every
controller/simulator function in qrw_tpu is a pure function over a state
pytree, so

  * `jax.vmap` turns one robot into a scenario axis (gaits x velocity
    profiles x terrains x perturbations),
  * `shard_map` over a 1-D "dp" mesh splits that axis across chips with
    zero communication in the hot loop (scenarios are independent),
  * cross-scenario metrics (solve counts, convergence flags, security
    errors) are reduced with `psum`/`pmean` over ICI,
  * multi-host scaling is the same program over a larger mesh (DCN
    between hosts), targeting the >=80% 2-host efficiency of BASELINE.md.

Batches are padded to a multiple of the mesh size; all shapes stay
static.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def sharded_vmap(fn, mesh: Mesh, axis: str = "dp"):
    """vmap `fn` over a leading scenario axis and shard it over `mesh`.

    `fn` maps pytrees -> pytrees with no batch axis. The result runs one
    shard per device with no collective in the loop body.
    """
    batched = jax.vmap(fn)
    spec = P(axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec,
             check_vma=False)
    def sharded(*args):
        return batched(*args)

    return sharded


def batched_mpc_solver(cfg, mesh: Optional[Mesh] = None, settings=None,
                      axis: str = "dp"):
    """Batched centroidal MPC solver, optionally sharded over a mesh.

    Returns fn(xref (B, 12, N+1), fsteps (B, N_gait, 12)) -> x_f (B, 24, N)
    with B divisible by the mesh size when sharded. This is the BASELINE
    throughput workload (>=10k solves/s/chip target).
    """
    from qrw_tpu.core import mpc as mpc_mod

    def solve_one(xref, fsteps):
        res = mpc_mod.solve_mpc(cfg, xref, fsteps, settings=settings)
        return res.x_f_applied, res.iters

    if mesh is None:
        return jax.jit(jax.vmap(solve_one))
    return jax.jit(sharded_vmap(solve_one, mesh, axis))


def scenario_metrics(errors, iters, mesh: Optional[Mesh] = None,
                     axis: str = "dp"):
    """Cross-scenario aggregation: runs inside shard_map -> psum over ICI,
    outside -> plain reductions."""
    def agg(e, i):
        return {"error_rate": jnp.mean(e.astype(jnp.float32)),
                "mean_iters": jnp.mean(i.astype(jnp.float32)),
                "max_iters": jnp.max(i)}

    if mesh is None:
        return agg(errors, iters)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
             check_vma=False)
    def sharded(e, i):
        m = agg(e, i)
        return {"error_rate": jax.lax.pmean(m["error_rate"], axis),
                "mean_iters": jax.lax.pmean(m["mean_iters"], axis),
                "max_iters": jax.lax.pmax(m["max_iters"], axis)}

    return sharded(errors, iters)
