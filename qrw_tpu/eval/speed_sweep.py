"""Velocity-envelope sweep: batched closed-loop runs over a command grid.

Re-design of the reference's crocoddyl_eval/test_4 harness
(scripts/crocoddyl_eval/test_4/run_scenarios.py: spawn one simulation
process per desired (vx, wyaw) speed pair and record whether the robot
survives, mapping the achievable velocity envelope). On TPU the grid is
a single batched program: every (vx, wyaw) cell is one vmapped scenario
of the in-graph closed loop, sharded over the device mesh — thousands
of 6 s simulations per device call instead of one per host process.

Outputs per cell: success (no security latch), final tracking error,
mean absolute height error — the data behind the reference's
analyse_simu.py envelope plots.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config


class SweepResult(NamedTuple):
    vx: np.ndarray         # (nx,) grid
    wyaw: np.ndarray       # (nw,) grid
    success: np.ndarray    # (nx, nw) bool — survived, no security latch
    vx_err: np.ndarray     # (nx, nw) mean |vx_mes - vx_cmd| in steady state
    h_err: np.ndarray      # (nx, nw) mean |z - h_ref| in steady state


def run_sweep(cfg: Optional[Config] = None,
              vx_grid=np.linspace(0.0, 2.0, 9),
              wyaw_grid=np.linspace(-1.0, 1.0, 5),
              n_ticks: int = 1500, ramp_ticks: int = 500,
              dtype=jnp.float32, mesh=None) -> SweepResult:
    """Run the full grid as one batched rollout.

    Commands ramp linearly to the target over ramp_ticks then hold
    (the reference feeds the target through the joystick ramp,
    scripts/crocoddyl_eval/test_4/run_scenarios.py:14-18). With a mesh,
    cells are sharded over devices via sharded_vmap."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = cfg if cfg is not None else Config()
    ctl, carry1 = make_rollout(cfg, dtype=dtype)

    vx_g, wy_g = np.meshgrid(np.asarray(vx_grid), np.asarray(wyaw_grid),
                             indexing="ij")
    B = vx_g.size
    targets = np.zeros((B, 6), dtype=np.float64)
    targets[:, 0] = vx_g.ravel()
    targets[:, 5] = wy_g.ravel()

    ramp = np.minimum(np.arange(n_ticks) / max(ramp_ticks, 1), 1.0)
    v_sched = (ramp[None, :, None] * targets[:, None, :]).astype(
        np.dtype(dtype))

    carry = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                         carry1)

    def one(c, vs):
        _, logs = rollout(ctl, c, n_ticks, v_ref_schedule=vs)
        err = logs.error.any()
        # steady-state window: after the ramp, but never empty
        start = min(max(n_ticks - 500, ramp_ticks), n_ticks // 2)
        sl = slice(start, None)
        # measured forward velocity in base frame vs command
        vx_err = jnp.mean(jnp.abs(logs.base_vel[sl, 0]
                                  - vs[sl, 0]))
        h_err = jnp.mean(jnp.abs(logs.base_pos[sl, 2] - cfg.h_ref))
        fell = jnp.mean(logs.base_pos[sl, 2]) < 0.5 * cfg.h_ref
        return (~(err | fell)), vx_err, h_err

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from qrw_tpu.parallel.mesh import sharded_vmap
        fn = jax.jit(sharded_vmap(one, mesh))
        sharding = NamedSharding(mesh, P("dp"))
        carry = jax.device_put(carry, sharding)
        v_sched = jax.device_put(jnp.asarray(v_sched), sharding)
        ok, vx_err, h_err = fn(carry, v_sched)
    else:
        fn = jax.jit(jax.vmap(one))
        ok, vx_err, h_err = fn(carry, jnp.asarray(v_sched))

    shape = vx_g.shape
    return SweepResult(
        vx=np.asarray(vx_grid), wyaw=np.asarray(wyaw_grid),
        success=np.asarray(ok).reshape(shape),
        vx_err=np.asarray(vx_err).reshape(shape),
        h_err=np.asarray(h_err).reshape(shape))


def plot_envelope(res: SweepResult, show: bool = True,
                  save_path: Optional[str] = None):
    """Achievable-velocity envelope heatmap (analyse_simu analog)."""
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 2, figsize=(12, 5))
    ext = [res.wyaw[0], res.wyaw[-1], res.vx[0], res.vx[-1]]
    im0 = axs[0].imshow(res.success.astype(float), origin="lower",
                        extent=ext, aspect="auto", vmin=0, vmax=1)
    axs[0].set_title("success")
    im1 = axs[1].imshow(res.vx_err, origin="lower", extent=ext,
                        aspect="auto")
    axs[1].set_title("steady-state |vx err| [m/s]")
    for ax in axs:
        ax.set_xlabel("wyaw [rad/s]")
        ax.set_ylabel("vx [m/s]")
    fig.colorbar(im0, ax=axs[0])
    fig.colorbar(im1, ax=axs[1])
    if save_path:
        fig.savefig(save_path, dpi=110)
    if show:  # pragma: no cover
        plt.show()
    return fig
