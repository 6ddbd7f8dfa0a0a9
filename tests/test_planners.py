"""Tests for gait scheduler, state planner, footstep planner and swing
trajectories — golden-value and invariant tests per SURVEY.md section 4."""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core import gait as G
from qrw_tpu.core.foot_trajectory import (make_foot_traj_state,
                                          update_foot_trajectory)
from qrw_tpu.core.footstep import make_footstep_state, update_footsteps
from qrw_tpu.core.state_planner import compute_reference_states

CFG = Config()
PATS = G.gait_patterns(CFG)
SHOULDERS = np.array([[0.1946, 0.1946, -0.1946, -0.1946],
                      [0.14695, -0.14695, 0.14695, -0.14695],
                      [0.0, 0.0, 0.0, 0.0]])


# ----------------------------------------------------------------------
# Gait
# ----------------------------------------------------------------------

def test_trot_structure():
    # make_gait initializes one row BEFORE a phase boundary so that the k=0
    # roll (Controller rolls at every k % k_mpc == 0, including k=0) lands
    # exactly on a boundary and the first swing starts at t0=0.
    gs = G.make_gait(CFG, "trot")
    cur = np.asarray(gs.current)
    assert np.all(cur[0] == [0.0, 1.0, 1.0, 0.0])
    assert np.all(cur[1:9] == [1.0, 0.0, 0.0, 1.0])
    assert np.all(cur[9:16] == [0.0, 1.0, 1.0, 0.0])
    assert np.all(cur[16:] == 0.0)
    # After the k=0 roll the window starts at the canonical trot boundary
    # (src/Gait.cpp:56-68 sequence order).
    gs = G.roll_gait(gs)
    cur = np.asarray(gs.current)
    assert np.all(cur[:8] == [1.0, 0.0, 0.0, 1.0])
    assert np.all(cur[8:16] == [0.0, 1.0, 1.0, 0.0])
    assert np.all(cur[16:] == 0.0)


def test_roll_periodicity():
    gs = G.make_gait(CFG, "trot")
    cur0 = np.asarray(gs.current)
    for _ in range(16):
        gs = G.roll_gait(gs)
    np.testing.assert_array_equal(np.asarray(gs.current), cur0)


def test_new_phase_flags():
    # make_gait sits one row before a phase boundary, so the very first
    # roll (the controller's k=0 roll) lands ON the boundary: new_phase
    # fires at rolls 0, 8, 16, ... (trot half-period = 8 MPC steps).
    gs = G.make_gait(CFG, "trot")
    flags = []
    for _ in range(16):
        gs = G.roll_gait(gs)
        flags.append(bool(gs.new_phase))
    assert flags == [i % 8 == 0 for i in range(16)]


def test_phase_durations_trot():
    # Query the post-k=0-roll state — the controller always rolls at k=0
    # before any phase-duration consumer runs, so the pre-roll window
    # (whose row 0 is a 1-step tail of the previous phase) is never seen.
    gs = G.roll_gait(G.make_gait(CFG, "trot"))
    info = G.phase_durations(gs, 1.0, CFG.dt_mpc)
    d = np.asarray(info.duration)
    # stance phases all last half a gait period
    cur = np.asarray(gs.current)
    np.testing.assert_allclose(d[cur == 1.0], 0.16)
    # remaining steps decrease along the phase
    rem = np.asarray(info.remaining)
    np.testing.assert_array_equal(rem[:8, 0], np.arange(8, 0, -1))


def test_phase_duration_uses_past_after_roll():
    gs = G.make_gait(CFG, "trot")
    # roll 1 lands on the phase boundary (k=0 roll); rolls 2-4 consume
    # three rows of foot 0's 8-step stance into pastGait
    for _ in range(4):
        gs = G.roll_gait(gs)
    info = G.phase_durations(gs, 1.0, CFG.dt_mpc)
    # foot 0: 3 steps of its stance already in pastGait, 5 remaining
    assert int(np.asarray(info.remaining)[0, 0]) == 5
    np.testing.assert_allclose(np.asarray(info.duration)[0, 0], 0.16)


def test_gait_switch_codes():
    gs = G.make_gait(CFG, "trot")
    for code, pattern in [(1, "pacing"), (2, "bounding"), (3, "trot"),
                          (4, "static")]:
        out = G.change_gait(gs, code, PATS)
        np.testing.assert_array_equal(np.asarray(out.desired),
                                      np.asarray(G._pattern(CFG, pattern)))
    # code 0 leaves the desired gait untouched
    out = G.change_gait(gs, 0, PATS)
    np.testing.assert_array_equal(np.asarray(out.desired),
                                  np.asarray(gs.desired))


# ----------------------------------------------------------------------
# State planner
# ----------------------------------------------------------------------

def test_state_planner_straight():
    q7 = jnp.asarray([0.3, -0.1, 0.21, 0.0, 0.0, 0.0, 1.0])
    v = jnp.asarray([0.4, 0.1, 0.0, 0.0, 0.0, 0.0])
    xref = compute_reference_states(q7, v, v, dt_mpc=CFG.dt_mpc,
                                    n_steps=CFG.n_steps, h_ref=CFG.h_ref)
    x = np.asarray(xref)
    assert x.shape == (12, 17)
    np.testing.assert_allclose(x[0, 1:], 0.4 * CFG.dt_mpc * np.arange(1, 17))
    np.testing.assert_allclose(x[2, 1:], CFG.h_ref)
    np.testing.assert_allclose(x[2, 0], 0.21)     # keeps measured height
    np.testing.assert_allclose(x[0:2, 0], 0.0)    # horizontal frame origin
    np.testing.assert_allclose(x[6, 1:], 0.4)


def test_state_planner_yaw_arc():
    q7 = jnp.asarray([0.0, 0.0, CFG.h_ref, 0.0, 0.0, 0.0, 1.0])
    v = jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.0, 0.8])
    xref = np.asarray(compute_reference_states(
        q7, v, v, dt_mpc=CFG.dt_mpc, n_steps=CFG.n_steps, h_ref=CFG.h_ref))
    t = CFG.dt_mpc * np.arange(1, 17)
    r = np.hypot(xref[0, 1:], xref[1, 1:])
    np.testing.assert_allclose(r, 2 * (0.5 / 0.8) * np.sin(0.8 * t / 2),
                               atol=1e-12)
    # velocity directions rotate with yaw
    np.testing.assert_allclose(xref[6, 1:], 0.5 * np.cos(0.8 * t))
    np.testing.assert_allclose(xref[5, 1:], 0.8 * t)


# ----------------------------------------------------------------------
# Footstep planner
# ----------------------------------------------------------------------

def _run_planner(n_ticks, b_v, vref, q7=None):
    gs = G.make_gait(CFG, "trot")
    fs = make_footstep_state(CFG, jnp.asarray(SHOULDERS))
    if q7 is None:
        q7 = jnp.asarray([0.0, 0.0, CFG.h_ref, 0.0, 0.0, 0.0, 1.0])
    tgt = fsteps = None
    for k in range(n_ticks):
        gs = G.update_gait(gs, k, CFG.k_mpc, 0, PATS)
        fs, tgt, fsteps = update_footsteps(
            CFG, jnp.asarray(SHOULDERS), gs, fs,
            (k % CFG.k_mpc == 0) & (k != 0), CFG.k_mpc - k % CFG.k_mpc,
            q7, jnp.asarray(b_v), jnp.asarray(vref))
    return gs, fs, tgt, fsteps


def test_zero_velocity_targets_under_shoulders():
    _, _, tgt, _ = _run_planner(40, np.zeros(6), np.zeros(6))
    np.testing.assert_allclose(np.asarray(tgt)[:2], SHOULDERS[:2], atol=1e-12)


def test_raibert_symmetry_term():
    v = np.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0])
    _, _, tgt, fsteps = _run_planner(1, v, v)
    # swing feet (FR, HL) touch down ahead: shoulder + t_stance/2 * v
    # + horizon displacement at the transition row
    f = np.asarray(fsteps)
    row8 = f[8].reshape(4, 3)
    assert row8[1, 0] > SHOULDERS[0, 1] + 0.03
    # stance feet at row 0 hold the current anchor
    np.testing.assert_allclose(f[0].reshape(4, 3)[0, :2], SHOULDERS[:2, 0],
                               atol=2e-3)


def test_step_limit_clamp():
    v = np.array([5.0, 0.0, 0.0, 0.0, 0.0, 0.0])  # absurd velocity
    vref = np.zeros(6)
    _, _, _, fsteps = _run_planner(1, v, vref)
    f = np.asarray(fsteps)
    row8 = f[8].reshape(4, 3)
    # clamp keeps offsets within L of the shoulder (plus horizon drift dx
    # which uses b_v; with vref = 0 the drag/arc term vanishes at row 8
    # only through dx = v * dt_cum — so check against that bound)
    assert np.all(np.abs(row8[[1, 2], 1] - SHOULDERS[1, [1, 2]]) <=
                  CFG.step_limit + 1e-9)


def test_world_frame_conversion():
    yaw = 0.7
    q7 = jnp.asarray([1.0, 2.0, CFG.h_ref,
                      0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)])
    _, _, tgt, _ = _run_planner(3, np.zeros(6), np.zeros(6), q7)
    t = np.asarray(tgt)
    c, s = np.cos(yaw), np.sin(yaw)
    expect_x = c * SHOULDERS[0] - s * SHOULDERS[1] + 1.0
    expect_y = s * SHOULDERS[0] + c * SHOULDERS[1] + 2.0
    np.testing.assert_allclose(t[0], expect_x, atol=1e-9)
    np.testing.assert_allclose(t[1], expect_y, atol=1e-9)


# ----------------------------------------------------------------------
# Swing trajectories
# ----------------------------------------------------------------------

def test_swing_trajectory_boundary_conditions():
    gs = G.make_gait(CFG, "trot")
    p0 = jnp.asarray(np.vstack([SHOULDERS[:2], np.zeros((1, 4))]))
    ft = make_foot_traj_state(p0)
    target = jnp.asarray(SHOULDERS + np.array([[0.08], [0.0], [0.0]]))
    zs, xs, z_stance = [], [], []
    for k in range(80):  # one half period = one full swing
        gs = G.update_gait(gs, k, CFG.k_mpc, 0, PATS)
        ft = update_foot_trajectory(CFG, gs, ft, k, target)
        zs.append(float(ft.position[2, 1]))
        xs.append(float(ft.position[0, 1]))
        if k < 70:  # foot 0 is in stance until the window flips at k=70
            z_stance.append(float(ft.position[2, 0]))
    zs = np.asarray(zs)
    # apex at max_height near mid-swing, touchdown back at z ~ 0
    assert abs(zs.max() - CFG.max_height) < 1e-6
    assert abs(zs[-1]) < 1e-4
    # the swing began before tick 0 (gait rolls at k=0), so mid-swing
    # lands slightly before the window center
    assert 20 < int(zs.argmax()) < 50
    # x lands on the target
    np.testing.assert_allclose(xs[-1], float(target[0, 1]), atol=1e-4)
    # stance foot (index 0) never moves while in stance
    np.testing.assert_allclose(z_stance, 0.0, atol=1e-12)


def test_swing_velocity_consistency():
    """Finite differences of the reported positions match the reported
    velocities away from refit boundaries."""
    gs = G.make_gait(CFG, "trot")
    p0 = jnp.asarray(np.vstack([SHOULDERS[:2], np.zeros((1, 4))]))
    ft = make_foot_traj_state(p0)
    target = jnp.asarray(SHOULDERS + np.array([[0.05], [0.02], [0.0]]))
    pos, vel = [], []
    for k in range(60):
        gs = G.update_gait(gs, k, CFG.k_mpc, 0, PATS)
        ft = update_foot_trajectory(CFG, gs, ft, k, target)
        pos.append(np.asarray(ft.position[:, 1]))
        vel.append(np.asarray(ft.velocity[:, 1]))
    pos, vel = np.asarray(pos), np.asarray(vel)
    # pos[k] and vel[k] are both evaluated at ev_k, so the finite
    # difference approximates the midpoint velocity
    fd = (pos[25:40] - pos[24:39]) / CFG.dt_wbc
    mid = 0.5 * (vel[24:39] + vel[25:40])
    np.testing.assert_allclose(fd, mid, atol=1e-3)
