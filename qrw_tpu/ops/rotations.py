"""Rotation utilities (quaternion / RPY / rotation matrix), batched-friendly.

Re-implements the conversions used throughout the reference
(scripts/utils_mpc.py:17-107, scripts/Estimator.py:672-714) as pure jnp
functions. All functions operate on the trailing axis and broadcast over
leading batch axes. Quaternions use the (x, y, z, w) convention like the
reference and PyBullet.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(q):
    """Quaternion (..., 4) [x,y,z,w] -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-30), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    r = jnp.stack([
        jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
        jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
        jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
    ], axis=-2)
    return r


def quat_to_rpy(q):
    """Quaternion (..., 4) [x,y,z,w] -> roll/pitch/yaw (..., 3).

    Same branch-free formulas as scripts/Estimator.py:686-714 with the
    arcsin clamped (jnp.clip) instead of the python if/elif.
    """
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (qy * qz + qw * qx),
                       qw * qw - qx * qx - qy * qy + qz * qz)
    pitch = jnp.arcsin(jnp.clip(-2.0 * (qx * qz - qw * qy), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (qx * qy + qw * qz),
                      qw * qw + qx * qx - qy * qy - qz * qz)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_to_quat(rpy):
    """Roll/pitch/yaw (..., 3) -> quaternion (..., 4) [x,y,z,w].

    Mirrors scripts/Estimator.py:672-684 (EulerToQuaternion)."""
    half = 0.5 * rpy
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    qw = cr * cp * cy + sr * sp * sy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def rpy_to_rot(rpy):
    """Roll/pitch/yaw (..., 3) -> rotation matrix R = Rz(yaw) Ry(pitch) Rx(roll).

    Mirrors scripts/utils_mpc.py:87-107 (EulerToRotation)."""
    cr, sr = jnp.cos(rpy[..., 0]), jnp.sin(rpy[..., 0])
    cp, sp = jnp.cos(rpy[..., 1]), jnp.sin(rpy[..., 1])
    cy, sy = jnp.cos(rpy[..., 2]), jnp.sin(rpy[..., 2])
    r = jnp.stack([
        jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
        jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
        jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
    ], axis=-2)
    return r


def rot_z(yaw):
    """Yaw angle (...,) -> rotation matrix (..., 3, 3) about z."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def skew(v):
    """Vector (..., 3) -> skew-symmetric matrix (..., 3, 3)
    (src/MPC.cpp:654-658)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def quat_mul(q1, q2):
    """Hamilton product of quaternions in [x,y,z,w] convention."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_integrate(q, omega, dt):
    """Integrate body-frame angular velocity omega (..., 3) over dt onto
    quaternion q (..., 4); exponential-map integration, normalized."""
    th = jnp.linalg.norm(omega, axis=-1, keepdims=True) * dt
    half = 0.5 * th
    # sinc-safe axis scaling
    small = th < 1e-8
    k = jnp.where(small, 0.5 * dt, jnp.sin(half) * dt / jnp.maximum(th, 1e-30))
    dq = jnp.concatenate([omega * k, jnp.cos(half)], axis=-1)
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
