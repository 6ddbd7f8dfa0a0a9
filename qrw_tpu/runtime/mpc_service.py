"""Asynchronous MPC service over native shared-memory mailboxes.

The process-parallel MPC of the reference (MPC_Wrapper asynchronous
path, scripts/MPC_Wrapper.py:150-264: worker Process + dataIn/dataOut
Arrays + newData/newResult flags), rebuilt on the seqlock mailboxes of
the native runtime (runtime/ipc.py): the controller process publishes
(k, xref, fsteps) and polls for the latest plan; a worker process runs
the JAX MPC solver and publishes 24xN results. Sequence numbers replace
the boolean flags, so missed / stale updates are observable instead of
silently racy.

The in-graph deterministic equivalent (cfg.mpc_async) is the TPU-native
way to run this policy inside one jitted rollout; this service exists
for the deployment shape where the device loop must live in its own
process (real robot, host-side control).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time
from typing import Optional

import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.runtime.ipc import Mailbox


def _in_shape(cfg: Config):
    # row 0: [k, <pad>]; rows 1..12: xref (12, N+1); rest: fsteps
    return (1 + 12 + cfg.N_gait, max(cfg.n_steps + 1, 12))


def _worker_main(in_name: str, out_name: str, cfg_kw: dict):
    cfg = Config(**cfg_kw)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from qrw_tpu.core import mpc as mpc_mod
    from qrw_tpu.core import mpc_ddp

    box_in = Mailbox(in_name, _in_shape(cfg), create=False)
    box_out = Mailbox(out_name, (24, cfg.n_steps), create=False)
    N = cfg.n_steps

    state = (mpc_mod.init_mpc_state(cfg, jnp.float64) if cfg.type_MPC
             else mpc_ddp.init_ddp_state(cfg, jnp.float64))

    while True:
        msg = box_in.read()
        if msg is None:
            time.sleep(0.0002)
            continue
        if msg[0, 0] < 0:       # shutdown sentinel (stop_parallel_loop,
            break               # scripts/MPC_Wrapper.py:300-306)
        xref = jnp.asarray(msg[1:13, :N + 1])
        fsteps = jnp.asarray(msg[13:13 + cfg.N_gait, :12])
        if cfg.type_MPC:
            res = mpc_mod.solve_mpc(cfg, xref, fsteps, state)
        else:
            res = mpc_ddp.solve_mpc_ddp(cfg, xref, fsteps, state)
        state = res.state
        box_out.write(np.asarray(res.x_f_applied))


class MPCService:
    """Client handle: spawns the worker and exchanges problems/plans
    (MPC_Wrapper.solve / get_latest_result contract,
    scripts/MPC_Wrapper.py:73-126)."""

    def __init__(self, cfg: Config, name: Optional[str] = None):
        self.cfg = cfg
        tag = name or f"qrw_{os.getpid()}_{id(self):x}"
        self._in = Mailbox(f"/{tag}_in", _in_shape(cfg), create=True)
        self._out = Mailbox(f"/{tag}_out", (24, cfg.n_steps),
                            create=True)
        self.last_available_result = np.zeros((24, cfg.n_steps))
        ctx = mp.get_context("spawn")
        cfg_kw = {f: getattr(cfg, f)
                  for f in cfg.__dataclass_fields__}  # type: ignore
        self._proc = ctx.Process(
            target=_worker_main,
            args=(f"/{tag}_in", f"/{tag}_out", cfg_kw), daemon=True)
        self._proc.start()

    def solve(self, k: int, xref: np.ndarray, fsteps: np.ndarray):
        """Publish a problem (non-blocking)."""
        msg = np.zeros(self._in.shape)
        msg[0, 0] = k
        msg[1:13, :self.cfg.n_steps + 1] = xref
        msg[13:13 + self.cfg.N_gait, :12] = fsteps
        self._in.write(msg)

    def get_latest_result(self) -> np.ndarray:
        """Newest plan if available, else the previous one (stale)."""
        fresh = self._out.read()
        if fresh is not None:
            self.last_available_result = fresh
        return self.last_available_result

    def wait_result(self, timeout: float = 10.0) -> np.ndarray:
        """Block until a new plan arrives (test convenience)."""
        t0 = time.time()
        while time.time() - t0 < timeout:
            fresh = self._out.read()
            if fresh is not None:
                self.last_available_result = fresh
                return fresh
            time.sleep(0.001)
        raise TimeoutError("MPC worker did not answer")

    def stop(self):
        """Shutdown (stop_parallel_loop, scripts/MPC_Wrapper.py:300)."""
        if self._proc.is_alive():
            msg = np.zeros(self._in.shape)
            msg[0, 0] = -1.0
            self._in.write(msg)
            self._proc.join(timeout=5.0)
            if self._proc.is_alive():  # pragma: no cover
                self._proc.terminate()
        self._in.close()
        self._out.close()
