"""Parity: lane-major rigid-body kernels vs ops/rbd.py on random states."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrw_tpu.models.solo12 import make_solo12
from qrw_tpu.ops import lin, rbd
from qrw_tpu.ops import rbd_lane as rl

B = 7
TOL = 1e-10


@pytest.fixture(scope="module")
def setup():
    model = rbd.to_jax(make_solo12())
    lane = rl.to_lane(model)
    rng = np.random.default_rng(42)
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    base_pos = rng.normal(size=(B, 3))
    qj = rng.uniform(-1.5, 1.5, size=(B, 12))
    v = rng.normal(size=(B, 18))
    a = rng.normal(size=(B, 18))
    return model, lane, (jnp.asarray(q), jnp.asarray(base_pos),
                         jnp.asarray(qj), jnp.asarray(v), jnp.asarray(a))


def _lane_qj(qj):
    """(B, 12) -> (4, 3, B)."""
    return jnp.transpose(qj.reshape(-1, 4, 3), (1, 2, 0))


def _lane_vec(x):
    """(B, 3) -> Vec of (B,)."""
    return [x[:, i] for i in range(3)]


def _from_vec(v):
    """Vec of (..., B) -> (B, ..., 3) array."""
    return jnp.moveaxis(rl.stack_vec(v), -1, 0)


def test_frame_kinematics_parity(setup):
    model, lane, (q, base_pos, qj, v, a) = setup
    ref = jax.vmap(lambda bp, bq, j, bv, vj: rbd.frame_kinematics(
        model, bp, bq, j, bv, vj))(base_pos, q, qj, v[:, 0:6], v[:, 6:])

    R0 = rl.quat_to_mat([q[:, i] for i in range(4)])
    kin = rl.frame_kinematics(
        lane, _lane_vec(base_pos), R0, _lane_qj(qj),
        (_lane_vec(v[:, 0:3]), _lane_vec(v[:, 3:6])), _lane_qj(v[:, 6:]))

    np.testing.assert_allclose(_from_vec(kin.pos), ref.pos, atol=TOL)
    np.testing.assert_allclose(_from_vec(kin.vel), ref.vel, atol=TOL)
    np.testing.assert_allclose(_from_vec(kin.drift), ref.drift, atol=TOL)
    np.testing.assert_allclose(_from_vec(kin.omega), ref.omega, atol=TOL)


def test_fixed_base_kinematics_parity(setup):
    """The WBC's fixed-base call: identity rotation, zero base motion."""
    model, lane, (q, base_pos, qj, v, a) = setup
    zero3 = jnp.zeros(3)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    ref = jax.vmap(lambda j, vj: rbd.frame_kinematics(
        model, zero3, ident, j, jnp.zeros(6), vj))(qj, v[:, 6:])
    kin = rl.frame_kinematics(lane, rl.ZV3, rl.EYE3, _lane_qj(qj),
                              None, _lane_qj(v[:, 6:]))
    np.testing.assert_allclose(_from_vec(kin.pos), ref.pos, atol=TOL)
    np.testing.assert_allclose(_from_vec(kin.vel), ref.vel, atol=TOL)
    np.testing.assert_allclose(_from_vec(kin.drift), ref.drift, atol=TOL)


def test_foot_jacobians_parity(setup):
    model, lane, (q, base_pos, qj, v, a) = setup
    ref = jax.vmap(lambda bp, bq, j: rbd.foot_jacobians(
        model, bp, bq, j))(base_pos, q, qj)             # (B, 4, 3, 18)

    R0 = rl.quat_to_mat([q[:, i] for i in range(4)])
    kin = rl.frame_kinematics(
        lane, _lane_vec(base_pos), R0, _lane_qj(qj), None,
        _lane_qj(jnp.zeros_like(qj)))
    J = rl.foot_jacobians(lane, kin, R0, _lane_vec(base_pos))

    # base-linear block: R0 for every foot
    Jb_lin = np.asarray(ref[:, :, :, 0:6][..., 0:3])
    R0_d = np.moveaxis(np.asarray(
        rl.stack_mat(J.Jb_lin, jnp.float64, (B,))), -1, 0)  # (B, 3, 3)
    np.testing.assert_allclose(
        Jb_lin, np.broadcast_to(R0_d[:, None], Jb_lin.shape), atol=TOL)

    # base-angular block
    Jb_ang = np.asarray(ref[..., 3:6])                   # (B, 4, 3, 3)
    ours = np.moveaxis(np.asarray(
        rl.stack_mat(J.Jb_ang, jnp.float64, (4, B))), -1, 0)
    np.testing.assert_allclose(ours, Jb_ang, atol=TOL)

    # actuated block: per-leg 3x3 diagonal structure
    for f in range(4):
        blk = np.asarray(ref[:, f, :, 6 + 3 * f:9 + 3 * f])  # (B, 3, 3)
        ours_f = np.stack(
            [[np.asarray(rl._mul(1.0, J.Jleg[i][j]))[f]
              for j in range(3)] for i in range(3)])         # (3,3,B)
        np.testing.assert_allclose(np.moveaxis(ours_f, -1, 0), blk,
                                   atol=TOL)


def test_rnea_parity(setup):
    model, lane, (q, base_pos, qj, v, a) = setup
    ref = jax.vmap(lambda bq, j, vv, aa: rbd.rnea(
        model, bq, j, vv, aa))(q, qj, v, a)              # (B, 18)

    R0 = rl.quat_to_mat([q[:, i] for i in range(4)])
    f_b, n_b, tau = rl.rnea(
        lane, R0, _lane_qj(qj),
        (_lane_vec(v[:, 0:3]), _lane_vec(v[:, 3:6]), _lane_qj(v[:, 6:])),
        (_lane_vec(a[:, 0:3]), _lane_vec(a[:, 3:6]), _lane_qj(a[:, 6:])))
    np.testing.assert_allclose(_from_vec(f_b), ref[:, 0:3], atol=1e-9)
    np.testing.assert_allclose(_from_vec(n_b), ref[:, 3:6], atol=1e-9)
    tau_bm = jnp.transpose(tau, (2, 0, 1)).reshape(B, 12)
    np.testing.assert_allclose(tau_bm, ref[:, 6:], atol=1e-9)


def test_rnea_fixed_base_parity(setup):
    """The WBC call shape: identity orientation, zero base velocity
    (scripts/QP_WBC.py:104 passes the full v; the WBC uses b_v with
    nonzero base rows, so keep base velocity nonzero here too)."""
    model, lane, (q, base_pos, qj, v, a) = setup
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    ref = jax.vmap(lambda j, vv, aa: rbd.rnea(
        model, ident, j, vv, aa))(qj, v, a)
    f_b, n_b, tau = rl.rnea(
        lane, rl.EYE3, _lane_qj(qj),
        (_lane_vec(v[:, 0:3]), _lane_vec(v[:, 3:6]), _lane_qj(v[:, 6:])),
        (_lane_vec(a[:, 0:3]), _lane_vec(a[:, 3:6]), _lane_qj(a[:, 6:])))
    np.testing.assert_allclose(_from_vec(f_b), ref[:, 0:3], atol=1e-9)
    np.testing.assert_allclose(_from_vec(n_b), ref[:, 3:6], atol=1e-9)
    tau_bm = jnp.transpose(tau, (2, 0, 1)).reshape(B, 12)
    np.testing.assert_allclose(tau_bm, ref[:, 6:], atol=1e-9)


def _dense_M(blocks, B_):
    """LaneMassBlocks -> (B, 18, 18) dense, Pinocchio row order
    (symbolic-zero/constant entries broadcast to (4, B))."""
    M = np.zeros((B_, 18, 18))

    def leg_entry(e):
        return np.broadcast_to(np.asarray(e, dtype=float), (4, B_))

    for i in range(6):
        for j in range(6):
            e = blocks.Mbb[i][j]
            M[:, i, j] = np.broadcast_to(np.asarray(e, dtype=float),
                                         (B_,))
    for l in range(3):
        col = blocks.Mbj[l][0] + blocks.Mbj[l][1]    # 6 entries (4, B)
        for r in range(6):
            e = leg_entry(col[r])
            for f in range(4):
                M[:, r, 6 + 3 * f + l] = e[f]
                M[:, 6 + 3 * f + l, r] = e[f]
    for i in range(3):
        for j in range(3):
            e = leg_entry(blocks.Mleg[i][j])
            for f in range(4):
                M[:, 6 + 3 * f + i, 6 + 3 * f + j] = e[f]
    return M


def test_crba_parity(setup):
    model, lane, (q, base_pos, qj, v, a) = setup
    ref = jax.vmap(lambda j: rbd.crba(model, j))(qj)     # (B, 18, 18)
    blocks = rl.crba(lane, _lane_qj(qj))
    M = _dense_M(blocks, B)
    np.testing.assert_allclose(M, np.asarray(ref), atol=1e-9)


def test_forward_dynamics_parity(setup):
    model, lane, (q, base_pos, qj, v, a) = setup
    rhs = jnp.asarray(np.random.default_rng(3).normal(size=(B, 18)))
    Mref = jax.vmap(lambda j: rbd.crba(model, j))(qj)
    aref = jax.vmap(lin.chol_solve)(Mref, rhs)

    blocks = rl.crba(lane, _lane_qj(qj))
    a_base, a_j = rl.forward_dynamics(
        blocks, [rhs[:, r] for r in range(6)], _lane_qj(rhs[:, 6:]))
    ours = jnp.concatenate(
        [jnp.stack(a_base, axis=1),
         jnp.transpose(a_j, (2, 0, 1)).reshape(B, 12)], axis=1)
    np.testing.assert_allclose(ours, aref, atol=1e-8)
