"""Kalman estimator variants vs a numpy oracle of the reference semantics
(scripts/Estimator.py:88-181, 554-580) + kf_enabled integration rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from qrw_tpu.config import Config
from qrw_tpu.core import kalman

CFG = Config()
DT = CFG.dt_wbc


class _OracleKF18:
    """Direct numpy transcription of the reference KFilterBis update law."""

    def __init__(self, h_init):
        self.n, self.m = 18, 16
        self.A = np.eye(18)
        self.A[0:3, 3:6] = DT * np.eye(3)
        self.B = np.zeros((18, 3))
        self.B[0:3] = 0.5 * DT * DT * np.eye(3)
        self.B[3:6] = DT * np.eye(3)
        self.H = np.zeros((16, 18))
        for i in range(4):
            for j in range(3):
                self.H[3 * i + j, j] = 1.0
                self.H[3 * i + j, j + 6 + 3 * i] = -1.0
            self.H[12 + i, 6 + 3 * i + 2] = 1.0
        self.Q = np.zeros((18, 18))
        self.R = np.zeros((16, 16))
        self.P = np.eye(18)
        self.X = np.zeros(18)
        self.X[2] = h_init

    def update_coeffs(self, status):
        for i in range(4):
            trust = 1.0 if status[i] else 0.01
            self.R[3 * i:3 * i + 3, 3 * i:3 * i + 3] = (
                kalman.SIGMA_KIN ** 2 / trust * np.eye(3))
            self.R[12 + i, 12 + i] = kalman.SIGMA_H ** 2 / trust
            self.Q[6 + 3 * i:9 + 3 * i, 6 + 3 * i:9 + 3 * i] = (
                kalman.SIGMA_DP ** 2
                * (1 + np.exp(kalman.GAMMA * (0.5 - trust)))
                * np.eye(3) * DT * DT)
        self.Q[3:6, 3:6] = kalman.SIGMA_A ** 2 * np.eye(3) * DT * DT

    def step(self, oRb, acc_w, foot_pos_base, status):
        self.update_coeffs(status)
        self.X = self.A @ self.X + self.B @ acc_w
        self.P = self.A @ self.P @ self.A.T + self.Q
        imu_r = np.asarray(CFG.imu_offset)
        Z = np.zeros(16)
        for i in range(4):
            Z[3 * i:3 * i + 3] = oRb @ (imu_r - foot_pos_base[i])
        K = self.P @ self.H.T @ np.linalg.inv(
            self.H @ self.P @ self.H.T + self.R)
        self.X = self.X + K @ (Z - self.H @ self.X)
        self.P = self.P - K @ self.H @ self.P


def test_kf18_matches_oracle():
    rng = np.random.default_rng(3)
    h0 = 0.22
    oracle = _OracleKF18(h0)
    st = kalman.kf18_init(h0, jnp.float64)
    step = jax.jit(lambda st, oRb, acc, fp, fs, w: kalman.kf18_step(
        CFG, st, oRb, acc, fp, fs, w))
    for k in range(50):
        th = rng.normal(scale=0.1)
        oRb = np.array([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        acc = rng.normal(scale=1.0, size=3)
        fp = rng.normal(scale=0.1, size=(4, 3)) + np.array([0, 0, -h0])
        fs = (rng.random(4) > 0.4).astype(float)
        w = rng.normal(scale=0.2, size=3)
        oracle.step(oRb, acc, fp, fs)
        st, pos, vel = step(st, jnp.asarray(oRb), jnp.asarray(acc),
                            jnp.asarray(fp), jnp.asarray(fs),
                            jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(st.X), oracle.X, atol=1e-10)
        np.testing.assert_allclose(np.asarray(st.P), oracle.P, atol=1e-10)
        imu_r = np.asarray(CFG.imu_offset)
        np.testing.assert_allclose(np.asarray(pos), oracle.X[0:3] - imu_r,
                                   atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(vel),
            oRb.T @ (oracle.X[3:6] - np.cross(imu_r, w)), atol=1e-10)


def test_kf6_converges_to_constant_measurement():
    st = kalman.kf6_init(jnp.float64)
    target = jnp.asarray([0.1, -0.2, 0.3, 0.0, 0.0, 0.0])
    step = jax.jit(lambda s: kalman.kf6_step(DT, s, jnp.zeros(3), target))
    for _ in range(100):
        st = step(st)
    np.testing.assert_allclose(np.asarray(st.X), np.asarray(target),
                               atol=1e-3)


def test_kf_enabled_rollout_stands():
    """Closed-loop trot with the Kalman estimator stays upright."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = CFG.replace(kf_enabled=True)
    ctl, carry = make_rollout(cfg, dtype=jnp.float64)
    n = 400
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
    carry2, logs = run(carry)
    bp = np.asarray(logs.base_pos)
    assert abs(bp[-1, 2] - cfg.h_ref) < 0.05, bp[-1]
    assert not bool(np.asarray(logs.error).any())
