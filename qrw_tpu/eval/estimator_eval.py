"""Offline estimator evaluation: estimate vs ground truth.

Re-design of the reference's post-hoc estimator studies
(scripts/plot_IMU_mocap_result.py / _bis.py: compare the onboard
estimator against Qualisys mocap ground truth from saved .npz logs, and
scripts/main_solo12_demo_estimator.py: an estimator-only run). In
simulation the simulator state IS the ground truth (the reference's
perfect-estimator source, scripts/Estimator.py:595-604), so the study
becomes: run a closed-loop rollout, then score the logged estimate
(q_est/v_est) against the logged sim state (base_pos/base_quat/base_vel)
— drift, RMSE, and velocity-tracking error per axis, with the same
figure set. Works on a live RolloutLog or a dict from utils.logger.

Example:
    from qrw_tpu.eval.estimator_eval import run_demo, score
    metrics = run_demo(n_ticks=1000, kf=True)   # estimator-only demo
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.ops.rotations import quat_to_rpy


def _as_dict(logs) -> dict:
    if isinstance(logs, dict):
        return logs
    return {k: np.asarray(v) for k, v in logs._asdict().items()
            if v is not None}


def score(logs, cfg: Optional[Config] = None, skip: int = 50
          ) -> Dict[str, float]:
    """Estimator-vs-ground-truth metrics over a rollout log.

    skip: initial ticks excluded (filter settling). Returns RMSEs for
    base height, roll/pitch, linear velocity, plus final horizontal
    drift of the estimate relative to ground truth [m]."""
    cfg = cfg if cfg is not None else Config()
    d = _as_dict(logs)
    skip = min(skip, d["base_pos"].shape[0] // 2)  # short logs: keep data
    sl = slice(skip, None)

    z_sim = d["base_pos"][sl, 2]
    z_est = d["q_est"][sl, 2]
    rpy_sim = np.asarray(jax.vmap(quat_to_rpy)(
        jnp.asarray(d["base_quat"][sl], jnp.float64)))
    rpy_est = np.asarray(jax.vmap(quat_to_rpy)(
        jnp.asarray(d["q_est"][sl, 3:7], jnp.float64)))
    v_sim = d["base_vel"][sl]
    v_est = d["v_est"][sl, 0:3]

    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b))
                                     ** 2)))

    # horizontal drift: the estimator integrates velocity for x/y, so it
    # drifts; the reference quantifies exactly this against mocap.
    drift = float(np.linalg.norm(d["q_est"][-1, 0:2]
                                 - d["base_pos"][-1, 0:2]))
    return {
        "z_rmse": rmse(z_sim, z_est),
        "roll_rmse": rmse(rpy_sim[:, 0], rpy_est[:, 0]),
        "pitch_rmse": rmse(rpy_sim[:, 1], rpy_est[:, 1]),
        "vx_rmse": rmse(v_sim[:, 0], v_est[:, 0]),
        "vy_rmse": rmse(v_sim[:, 1], v_est[:, 1]),
        "vz_rmse": rmse(v_sim[:, 2], v_est[:, 2]),
        "xy_drift": drift,
        "n_ticks": int(z_sim.shape[0]),
    }


def plot(logs, cfg: Optional[Config] = None, show: bool = True,
         save_prefix: Optional[str] = None):
    """Estimate-vs-truth figures (plot_IMU_mocap_result.py figure set:
    position, orientation, linear velocity per axis)."""
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cfg = cfg if cfg is not None else Config()
    d = _as_dict(logs)
    t = np.arange(d["base_pos"].shape[0]) * cfg.dt_wbc
    rpy_sim = np.asarray(jax.vmap(quat_to_rpy)(
        jnp.asarray(d["base_quat"], jnp.float64)))
    rpy_est = np.asarray(jax.vmap(quat_to_rpy)(
        jnp.asarray(d["q_est"][:, 3:7], jnp.float64)))

    fig, axs = plt.subplots(3, 3, figsize=(14, 9), sharex=True)
    rows = [
        ("pos", d["base_pos"], d["q_est"][:, 0:3], "m"),
        ("rpy", rpy_sim, rpy_est, "rad"),
        ("lin vel", d["base_vel"], d["v_est"][:, 0:3], "m/s"),
    ]
    for r, (name, sim, est, unit) in enumerate(rows):
        for c in range(3):
            axs[r, c].plot(t, sim[:, c], "b", label="ground truth")
            axs[r, c].plot(t, est[:, c], "r--", label="estimate")
            axs[r, c].set_ylabel(f"{name} {'xyz'[c]} [{unit}]")
    axs[0, 0].legend()
    for c in range(3):
        axs[2, c].set_xlabel("t [s]")
    fig.suptitle("Estimator vs ground truth")
    if save_prefix:
        fig.savefig(save_prefix + "_estimator.png", dpi=110)
    if show:  # pragma: no cover
        plt.show()
    return fig


def run_demo(cfg: Optional[Config] = None, n_ticks: int = 500,
             kf: bool = False, dtype=jnp.float64) -> Dict[str, float]:
    """Estimator demo run (main_solo12_demo_estimator.py analog): run the
    closed loop with the chosen estimator and score it."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = cfg if cfg is not None else Config()
    if kf:
        cfg = cfg.replace(kf_enabled=True)
    ctl, carry = make_rollout(cfg, dtype=dtype)
    run = jax.jit(lambda c: rollout(
        ctl, c, n_ticks,
        v_ref_schedule=jnp.zeros((n_ticks, 6), dtype)))
    _, logs = run(carry)
    return score(logs, cfg)
