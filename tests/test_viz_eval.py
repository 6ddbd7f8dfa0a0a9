"""Visualization + offline estimator evaluation (reference parity:
scripts/ForceMonitor.py, scripts/LoggerControl.py:716-915 slider replay,
scripts/plot_IMU_mocap_result.py estimator studies)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.config import Config
from qrw_tpu.eval import estimator_eval
from qrw_tpu.utils import viz
from qrw_tpu.utils.logger import log_to_dict

CFG = Config()


@pytest.fixture(scope="module")
def run_logs():
    from qrw_tpu.sim.rollout import make_rollout, rollout
    ctl, carry = make_rollout(CFG, dtype=jnp.float64)
    n = 200
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
    _, logs = run(carry)
    return log_to_dict(logs, CFG)


def test_foot_positions_on_ground(run_logs):
    feet = viz.foot_positions(run_logs)
    assert feet.shape == (200, 4, 3)
    # stance feet sit at ground level (compliant contact: small band)
    assert np.min(feet[:, :, 2]) > -0.02
    assert np.min(feet[50], axis=0)[2] < 0.01


def test_force_monitor_figure(run_logs):
    fig = viz.force_monitor(run_logs, tick=100, show=False)
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_mpc_predictions_and_slider(run_logs):
    ticks, x_f = viz.mpc_predictions(run_logs, CFG)
    assert x_f.shape == (len(ticks), 24, CFG.n_steps)
    assert np.all(np.isfinite(x_f))
    # predicted heights stay near the reference height
    assert np.all(np.abs(x_f[3:, 2, :] - CFG.h_ref) < 0.05)
    fig, slider = viz.slider_replay(run_logs, CFG, show=False)
    slider.set_val(len(ticks) - 1)  # scrub to the last cycle
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_estimator_score_standing(run_logs):
    m = estimator_eval.score(run_logs, CFG)
    # complementary filter on a quiet standing/trot run: tight envelopes
    assert m["z_rmse"] < 0.03
    assert m["roll_rmse"] < 0.05 and m["pitch_rmse"] < 0.05
    assert m["vx_rmse"] < 0.12 and m["vz_rmse"] < 0.12
    assert m["xy_drift"] < 0.2


def test_estimator_plot(run_logs):
    fig = estimator_eval.plot(run_logs, CFG, show=False)
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_estimator_demo_kf():
    m = estimator_eval.run_demo(CFG, n_ticks=200, kf=True)
    assert m["z_rmse"] < 0.05
    assert np.isfinite(m["xy_drift"])


def test_estimator_bis_panels(run_logs):
    """The _bis-style deep-study panels (plot_IMU_mocap_result_bis.py):
    windowed drift, velocity-error FFT, filter internals."""
    t_w, drift = estimator_eval.windowed_drift(run_logs, CFG)
    assert drift.shape[1] == 2 and t_w.shape[0] == drift.shape[0]
    assert np.abs(drift).max() < 0.05   # standing: tiny per-window drift
    freqs, amp = estimator_eval.velocity_error_fft(run_logs, CFG)
    assert freqs.shape[0] == amp.shape[0] and amp.shape[1] == 3
    assert np.all(np.isfinite(amp))
    fig = estimator_eval.plot_bis(run_logs, CFG, show=False)
    assert len(fig.axes) == 3


def test_filter_variant_comparison():
    """Complementary vs 18-state Kalman on the same scenario: both track
    and the comparison figure + metrics come out."""
    fig, metrics = estimator_eval.compare_filters(
        CFG, n_ticks=240, vx=0.3, dtype=jnp.float32, show=False)
    assert set(metrics) == {"complementary", "kalman18"}
    for m in metrics.values():
        assert m["vx_rmse"] < 0.3


def test_rollout_animation(run_logs, tmp_path):
    """3D animation (PyBullet-GUI stand-in): renders and saves without
    an external encoder."""
    out = tmp_path / "roll.html"
    ani = viz.animate_rollout(run_logs, CFG, stride=50, show=False,
                              save_path=str(out))
    assert out.exists() and out.stat().st_size > 10_000
