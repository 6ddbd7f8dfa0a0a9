"""Runtime CLI + logging subsystem: save/load round-trip, plots, CLI."""

import os

import jax.numpy as jnp
import numpy as np
import jax

from qrw_tpu.sim.rollout import make_rollout, rollout
from qrw_tpu.utils import logger as qlog


def _tiny_logs():
    ctl, carry = make_rollout(dtype=jnp.float64)
    run = jax.jit(lambda c: rollout(
        ctl, c, 8, v_ref_schedule=jnp.zeros((8, 6), jnp.float64)))
    _, logs = run(carry)
    return ctl.cfg, logs


def test_npz_round_trip(tmp_path):
    cfg, logs = _tiny_logs()
    path = qlog.save_npz(logs, str(tmp_path / "run.npz"), cfg)
    data = qlog.load_npz(path)
    for name, arr in qlog.log_to_dict(logs, cfg).items():
        np.testing.assert_array_equal(data[name], arr)
    assert data["q_des"].shape == (8, 12)
    assert data["base_pos"].shape == (8, 3)


def test_plot_all(tmp_path):
    cfg, logs = _tiny_logs()
    data = qlog.log_to_dict(logs, cfg)
    figs = qlog.plot_all(data, dt=cfg.dt_wbc, show=False,
                         save_prefix=str(tmp_path / "fig"))
    assert len(figs) == 4
    assert os.path.exists(str(tmp_path / "fig_fig0.png"))


def test_cli_main(tmp_path, monkeypatch):
    from qrw_tpu.runtime.main import main
    monkeypatch.chdir(tmp_path)
    rc = main(["--cpu", "--ticks", "8",
               "--save", str(tmp_path / "cli.npz")])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "cli.npz"))
