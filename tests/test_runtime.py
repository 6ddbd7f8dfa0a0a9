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
    assert len(figs) == 13   # the plotAll parity set (utils/logger.py)
    assert os.path.exists(str(tmp_path / "fig_fig0.png"))
    assert os.path.exists(str(tmp_path / "fig_fig12.png"))


def test_cli_main(tmp_path, monkeypatch):
    from qrw_tpu.runtime.main import main
    monkeypatch.chdir(tmp_path)
    rc = main(["--cpu", "--ticks", "8",
               "--save", str(tmp_path / "cli.npz")])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "cli.npz"))


def test_cli_host_loop_and_demo_modes(tmp_path, monkeypatch):
    from qrw_tpu.runtime.main import main
    monkeypatch.chdir(tmp_path)
    assert main(["--cpu", "--f64", "--ticks", "30", "--host-loop"]) == 0
    assert main(["--cpu", "--f64", "--ticks", "30",
                 "--estimator-demo"]) == 0


def test_cli_analyze(tmp_path, monkeypatch):
    """Offline analysis CLI over a saved run (analyse_simu /
    plot_IMU_mocap_result entry-point parity)."""
    import matplotlib
    matplotlib.use("Agg")
    from qrw_tpu.eval.analyze import main as analyze_main
    from qrw_tpu.runtime.main import main
    monkeypatch.chdir(tmp_path)
    npz = str(tmp_path / "run.npz")
    assert main(["--cpu", "--f64", "--ticks", "40", "--save", npz]) == 0
    rc = analyze_main([npz, "--plot", str(tmp_path / "out"),
                       "--estimator", "--forces", "20"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "out") + "_forces.png")


def test_cli_fleet_mpc(capsys):
    """The fleet MPC service CLI mode runs the phase solver end to end."""
    from qrw_tpu.runtime.main import main as cli_main
    rc = cli_main(["--fleet-mpc", "8", "--fleet-cycles", "1", "--cpu"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "fleet MPC service" in out and "conv" in out


def test_pipelined_host_loop_stays_upright_and_reports_periods():
    """Double-buffered host dispatch (runtime/host_loop
    .run_host_loop_pipelined): commands are depth-tick stale (the
    reference's async staleness contract) and the robot still stands;
    the effective-period log is well-formed."""
    from qrw_tpu.runtime.host_loop import run_host_loop_pipelined
    r = run_host_loop_pipelined(n_ticks=120, depth=2)
    assert r.n_ticks == 120
    assert not r.error
    assert r.periods_ms.shape[0] == 119
    assert (r.periods_ms > 0).all()
    # upright through the stale-command pipeline
    assert abs(r.q_log[-1, 2] - 0.2447) < 0.05
