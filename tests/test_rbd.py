"""Unit tests for the rigid-body dynamics kernels (ops/rbd.py).

The reference has no C++-tier coverage of its dynamics (SURVEY.md section 4);
here every kernel is validated against finite differences and algebraic
identities (the role Pinocchio's own test suite plays for the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.models.solo12 import H_INIT, Q_INIT, make_solo12
from qrw_tpu.ops import rbd
from qrw_tpu.ops.rotations import quat_integrate, quat_to_rot

MODEL = rbd.to_jax(make_solo12())


def _rand_state(seed):
    rng = np.random.default_rng(seed)
    base_pos = jnp.asarray(rng.normal(size=3) * 0.1)
    quat = rng.normal(size=4)
    quat = jnp.asarray(quat / np.linalg.norm(quat))
    qj = jnp.asarray(Q_INIT + 0.3 * rng.normal(size=12))
    v = jnp.asarray(rng.normal(size=18))
    return base_pos, quat, qj, v


def test_fk_neutral_feet_under_shoulders():
    base_pos = jnp.array([0.0, 0.0, 0.0])
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    kin = rbd.frame_kinematics(MODEL, base_pos, quat, jnp.asarray(Q_INIT),
                               jnp.zeros(6), jnp.zeros(12))
    np.testing.assert_allclose(kin.pos[:, 0], MODEL.shoulders[0], atol=1e-12)
    np.testing.assert_allclose(kin.pos[:, 1], MODEL.shoulders[1], atol=1e-12)
    np.testing.assert_allclose(kin.pos[:, 2], -H_INIT * np.ones(4), atol=1e-12)


def test_foot_jacobian_matches_finite_difference():
    base_pos, quat, qj, v = _rand_state(0)
    J = rbd.foot_jacobians(MODEL, base_pos, quat, qj)
    eps = 1e-7

    def feet(bp, q4, qjv):
        return rbd.frame_kinematics(MODEL, bp, q4, qjv,
                                    jnp.zeros(6), jnp.zeros(12)).pos

    p0 = feet(base_pos, quat, qj)
    # joint columns
    for j in range(12):
        dq = qj.at[j].add(eps)
        fd = (feet(base_pos, quat, dq) - p0) / eps
        np.testing.assert_allclose(np.asarray(J[:, :, 6 + j]), np.asarray(fd),
                                   atol=1e-5)
    # base columns act on the local twist [lin; ang]
    R0 = quat_to_rot(quat)
    for j in range(3):  # linear, local
        d = jnp.zeros(3).at[j].set(eps)
        fd = (feet(base_pos + R0 @ d, quat, qj) - p0) / eps
        np.testing.assert_allclose(np.asarray(J[:, :, j]), np.asarray(fd),
                                   atol=1e-5)
    for j in range(3):  # angular, local
        w = jnp.zeros(3).at[j].set(1.0)
        q2 = quat_integrate(quat, w, eps)
        fd = (feet(base_pos, q2, qj) - p0) / eps
        np.testing.assert_allclose(np.asarray(J[:, :, 3 + j]), np.asarray(fd),
                                   atol=1e-5)


def test_frame_velocity_and_drift_match_finite_difference():
    base_pos, quat, qj, v = _rand_state(1)
    vj = v[6:]
    kin = rbd.frame_kinematics(MODEL, base_pos, quat, qj, v[:6], vj)

    def step(bp, q4, qjv, dt):
        R0 = quat_to_rot(q4)
        bp2 = bp + R0 @ v[0:3] * dt
        q42 = quat_integrate(q4, v[3:6], dt)
        return bp2, q42, qjv + vj * dt

    eps = 1e-6
    bp2, q42, qj2 = step(base_pos, quat, qj, eps)
    kin2 = rbd.frame_kinematics(MODEL, bp2, q42, qj2, v[:6], vj)
    fd_vel = (kin2.pos - kin.pos) / eps
    np.testing.assert_allclose(np.asarray(fd_vel), np.asarray(kin.vel),
                               atol=1e-4)
    fd_acc = (kin2.vel - kin.vel) / eps
    np.testing.assert_allclose(np.asarray(fd_acc), np.asarray(kin.drift),
                               atol=1e-4)


def test_crba_consistent_with_rnea():
    _, quat, qj, v = _rand_state(2)
    M = rbd.crba(MODEL, qj)
    g0 = rbd.rnea(MODEL, quat, qj, jnp.zeros(18), jnp.zeros(18))
    rng = np.random.default_rng(3)
    for _ in range(3):
        a = jnp.asarray(rng.normal(size=18))
        tau = rbd.rnea(MODEL, quat, qj, jnp.zeros(18), a)
        np.testing.assert_allclose(np.asarray(M @ a), np.asarray(tau - g0),
                                   atol=1e-9)


def test_crba_structure():
    M = rbd.crba(MODEL, jnp.zeros(12))
    Mn = np.asarray(M)
    np.testing.assert_allclose(Mn, Mn.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(Mn) > 0)
    np.testing.assert_allclose(Mn[0:3, 0:3],
                               np.eye(3) * float(MODEL.mass.sum()), atol=1e-12)


def test_rnea_gravity_at_rest():
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    tau = rbd.rnea(MODEL, quat, jnp.asarray(Q_INIT), jnp.zeros(18),
                   jnp.zeros(18))
    # net vertical support force equals total weight
    np.testing.assert_allclose(float(tau[2]), float(MODEL.mass.sum()) * 9.81,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tau[0:2]), np.zeros(2), atol=1e-9)


def test_rnea_coriolis_energy_rate():
    """Power balance: v . (M a) with a from forward dynamics equals the rate
    of kinetic energy: d/dt (1/2 v^T M v) when tau = bias forces."""
    _, quat, qj, v = _rand_state(4)
    M = rbd.crba(MODEL, qj)
    bias = rbd.nonlinear_effects(MODEL, quat, qj, v, gravity=0.0)
    # Coriolis forces do no net work: v^T (bias - 0.5 dM/dt v) = 0; use the
    # standard identity v^T C(q, v) v = 0.5 v^T dM/dt v via finite difference.
    eps = 1e-6
    qj2 = qj + v[6:] * eps
    M2 = rbd.crba(MODEL, qj2)
    dM = (M2 - M) / eps
    lhs = float(v @ bias)
    rhs = 0.5 * float(v @ (dM @ v))
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs))


def test_aggregate_matches_reference():
    """The vendored URDF per-link inertials must reproduce the reference's
    own hard-coded whole-robot aggregates (src/MPC.cpp:17-26): total mass
    exactly, composite rotational inertia at q_init within a few percent
    per axis, CoM z-offset near the reference's '-0.03 approximation'."""
    from qrw_tpu.models.solo12 import GI, TOTAL_MASS, make_solo12
    from qrw_tpu.ops.rotations import quat_to_rot

    model = make_solo12()
    np.testing.assert_allclose(float(model.mass.sum()), TOTAL_MASS,
                               rtol=1e-9)

    # composite CoM + inertia at q_init via the FK kernel
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    base_pos = jnp.zeros(3)
    R, p = rbd.fk_world(MODEL, base_pos, quat, jnp.asarray(Q_INIT))
    R, p = np.asarray(R), np.asarray(p)
    m = np.asarray(model.mass)
    c_w = p + np.einsum("bij,bj->bi", R, np.asarray(model.com))
    com = (m[:, None] * c_w).sum(0) / m.sum()
    assert abs(com[0]) < 1e-6 and abs(com[1]) < 1e-6
    assert abs(com[2] - (-0.03)) < 0.005    # reference calls -0.03 approx
    I = np.zeros((3, 3))
    for k in range(len(m)):
        d = c_w[k] - com
        I += (R[k] @ np.asarray(model.inertia[k]) @ R[k].T
              + m[k] * (np.eye(3) * (d @ d) - np.outer(d, d)))
    np.testing.assert_allclose(np.diag(I), np.diag(GI), rtol=0.04)


def test_batched_vmap():
    B = 8
    rng = np.random.default_rng(5)
    qj = jnp.asarray(Q_INIT + 0.1 * rng.normal(size=(B, 12)))
    M = jax.vmap(lambda q: rbd.crba(MODEL, q))(qj)
    assert M.shape == (B, 18, 18)
