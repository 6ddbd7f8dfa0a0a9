"""Tests for rotation conversions (ops/rotations.py) — round-trips and
consistency with the conventions of scripts/utils_mpc.py / Estimator.py."""

import jax.numpy as jnp
import numpy as np

from qrw_tpu.ops import rotations as rot


def test_quat_rpy_roundtrip():
    rng = np.random.default_rng(0)
    rpy = jnp.asarray(rng.uniform(-1.2, 1.2, size=(32, 3)))
    q = rot.rpy_to_quat(rpy)
    back = rot.quat_to_rpy(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rpy), atol=1e-12)


def test_rpy_rot_consistency():
    rng = np.random.default_rng(1)
    rpy = jnp.asarray(rng.uniform(-1.2, 1.2, size=(8, 3)))
    R1 = rot.rpy_to_rot(rpy)
    R2 = rot.quat_to_rot(rot.rpy_to_quat(rpy))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-12)


def test_rot_orthonormal():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(16, 4))
    q = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    R = rot.quat_to_rot(q)
    eye = np.broadcast_to(np.eye(3), (16, 3, 3))
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(16),
                               atol=1e-12)


def test_skew_cross():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=3))
    b = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(np.asarray(rot.skew(a) @ b),
                               np.asarray(jnp.cross(a, b)), atol=1e-12)


def test_quat_integrate_small_angle():
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    w = jnp.array([0.0, 0.0, 1.0])
    q2 = rot.quat_integrate(q, w, 0.5)
    rpy = rot.quat_to_rpy(q2)
    np.testing.assert_allclose(np.asarray(rpy), [0.0, 0.0, 0.5], atol=1e-12)


def test_rot_z_matches_reference_pattern():
    """Rz as used in src/FootstepPlanner.cpp:147-149."""
    yaw = jnp.asarray(0.3)
    R = rot.rot_z(yaw)
    c, s = np.cos(0.3), np.sin(0.3)
    np.testing.assert_allclose(np.asarray(R),
                               [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-12)
