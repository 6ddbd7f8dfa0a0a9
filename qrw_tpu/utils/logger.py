"""Structured run logging: npz save/load + multi-figure plots.

TPU-native re-design of the reference's logging generation
(scripts/LoggerControl.py, scripts/LoggerSensors.py): instead of host-side
per-tick `sample()` copies into preallocated arrays, the rollout itself
returns a RolloutLog pytree of device arrays (one lax.scan output), and
this module handles the host side — timestamped `.npz` dumps with the
same save/load round-trip contract (LoggerControl.saveAll/loadAll,
scripts/LoggerControl.py:551-714) and the plotAll-style figure set
(scripts/LoggerControl.py:192-549).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def log_to_dict(logs, cfg=None) -> dict:
    """RolloutLog (or any NamedTuple of arrays) -> {name: np.ndarray}."""
    d = {k: np.asarray(v) for k, v in logs._asdict().items()
         if v is not None}
    if cfg is not None:
        d["_dt_wbc"] = np.asarray(cfg.dt_wbc)
    return d


def save_npz(logs, path: Optional[str] = None, cfg=None,
             prefix: str = "data") -> str:
    """Timestamped .npz dump (LoggerControl.saveAll,
    scripts/LoggerControl.py:551-628). Returns the file path."""
    if path is None:
        path = time.strftime(prefix + "_%Y_%m_%d_%H_%M") + ".npz"
    np.savez_compressed(path, **log_to_dict(logs, cfg))
    return path


def load_npz(path: str) -> dict:
    """Symmetric load (LoggerControl.loadAll,
    scripts/LoggerControl.py:630-714)."""
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def plot_all(data: dict, dt: float = 0.002, show: bool = True,
             save_prefix: Optional[str] = None):
    """The plotAll figure set (scripts/LoggerControl.py:192-549): base
    state, joint tracking, torques, contact forces, per-foot references.

    `data` is a dict from log_to_dict/load_npz. Returns the figures."""
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    T = data["base_pos"].shape[0]
    t = np.arange(T) * dt
    figs = []

    # -- figure 1: base position / orientation rate / velocities ----------
    fig, axs = plt.subplots(3, 2, figsize=(12, 8), sharex=True)
    for i, lbl in enumerate("xyz"):
        axs[i, 0].plot(t, data["base_pos"][:, i], "b", label="sim")
        if "q_est" in data:
            axs[i, 0].plot(t, data["q_est"][:, i], "r--", label="estimate")
        axs[i, 0].set_ylabel(f"pos {lbl} [m]")
        axs[i, 1].plot(t, data["base_vel"][:, i], "b")
        axs[i, 1].set_ylabel(f"lin vel {lbl} [m/s]")
    axs[0, 0].legend()
    axs[2, 0].set_xlabel("t [s]")
    axs[2, 1].set_xlabel("t [s]")
    fig.suptitle("Base state")
    figs.append(fig)

    # -- figure 2: joint position tracking --------------------------------
    fig, axs = plt.subplots(4, 3, figsize=(14, 9), sharex=True)
    for j in range(12):
        ax = axs[j // 3, j % 3]
        ax.plot(t, data["q_mes"][:, j], "b", lw=0.8, label="measured")
        ax.plot(t, data["q_des"][:, j], "r--", lw=0.8, label="desired")
        ax.set_title(f"joint {j}", fontsize=8)
    axs[0, 0].legend(fontsize=7)
    fig.suptitle("Joint position tracking")
    figs.append(fig)

    # -- figure 3: feedforward + applied torques --------------------------
    fig, axs = plt.subplots(4, 3, figsize=(14, 9), sharex=True)
    for j in range(12):
        ax = axs[j // 3, j % 3]
        if "tau_applied" in data:
            ax.plot(t, data["tau_applied"][:, j], "b", lw=0.8,
                    label="applied")
        ax.plot(t, data["tau_ff"][:, j], "r--", lw=0.8, label="ff")
        ax.set_title(f"joint {j}", fontsize=8)
    axs[0, 0].legend(fontsize=7)
    fig.suptitle("Joint torques [N m]")
    figs.append(fig)

    # -- figure 4: MPC contact forces -------------------------------------
    fig, axs = plt.subplots(4, 3, figsize=(14, 9), sharex=True)
    names = ["FL", "FR", "HL", "HR"]
    for f in range(4):
        for a, lbl in enumerate("xyz"):
            ax = axs[f, a]
            ax.plot(t, data["f_mpc"][:, 3 * f + a], "b", lw=0.8)
            ax.set_title(f"{names[f]} f{lbl} [N]", fontsize=8)
    fig.suptitle("MPC contact forces")
    figs.append(fig)

    if save_prefix is not None:
        for i, fig in enumerate(figs):
            fig.savefig(f"{save_prefix}_fig{i}.png", dpi=100)
    if show:
        plt.show()
    return figs
