"""Tests of the lane-major phase-grouped MPC path (core/mpc_lane +
ops/qp_phase): assembly equivalence against the batch-major builders,
matrix-free Hx against the dense reduced Hessian, full solves against
the f64 interior-point oracle, and warm-chain behavior across a gait
roll (the production 50 Hz cadence)."""

import numpy as np
import jax
import jax.numpy as jnp

from qrw_tpu.config import Config
from qrw_tpu.core import mpc
from qrw_tpu.core import mpc_lane as ml
from qrw_tpu.ops import qp_phase
from tests.qp_oracle import solve_qp_oracle

CFG = Config()
N = CFG.n_steps
H0 = 0.24474949993103629


def _batch(phases, per_phase, seed=0, vmax=0.6):
    rng = np.random.default_rng(seed)
    phase_fs = ml.trot_phase_fsteps(CFG)
    B = len(phases) * per_phase
    xrefs = np.zeros((12, N + 1, B), np.float32)
    xrefs[2, :, :] = H0
    xrefs[:, 0, :] += rng.normal(scale=0.02, size=(12, B)).astype(
        np.float32)
    xrefs[6, 1:, :] = rng.uniform(0, vmax, B).astype(np.float32)
    fsteps = np.zeros((CFG.N_gait, 12, B), np.float32)
    for i, p in enumerate(phases):
        fsteps[:, :, i * per_phase:(i + 1) * per_phase] = \
            phase_fs[p][:, :, None]
    return xrefs, fsteps, phase_fs


def test_assembly_matches_batch_major():
    xrefs, fsteps, _ = _batch([0, 5], 2)
    Bl, hblk, gait = ml.assemble_lane(CFG, jnp.asarray(xrefs),
                                      jnp.asarray(fsteps))
    for b in range(4):
        Bl_ref, h_ref, *_ = mpc._assemble_common(
            CFG, jnp.asarray(xrefs[..., b]), jnp.asarray(fsteps[..., b]))
        np.testing.assert_allclose(np.asarray(Bl[..., b]),
                                   np.asarray(Bl_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hblk[..., b]),
                                   np.asarray(h_ref), atol=1e-5)


def test_hx_matfree_matches_dense():
    xrefs, fsteps, phase_fs = _batch([3], 1)
    ps = ml.build_phase_data(CFG, phase_fs)
    b, p = 0, 3
    Hr, qr, *_ = mpc.build_qp_reduced(CFG, jnp.asarray(xrefs[..., b]),
                                      jnp.asarray(fsteps[..., b]),
                                      ps.cap)
    Bl, hblk, _ = ml.assemble_lane(CFG, jnp.asarray(xrefs),
                                   jnp.asarray(fsteps))
    Blf = np.asarray(Bl).reshape(N, 6, 4, 3, 1) \
        .transpose(1, 0, 2, 3, 4).reshape(6, 4 * N, 3, 1)
    BlS = np.einsum("sk,akib->asib", np.asarray(ps.onehot2[p]),
                    Blf).reshape(6, 3 * ps.cap, 1)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3 * ps.cap, 1)).astype(np.float32)
    hx = qp_phase.hx_matfree(jnp.asarray(x),
                             qp_phase.tor_slabs(jnp.asarray(BlS)),
                             jnp.asarray(ps.data.G1[p]),
                             jnp.asarray(ps.data.G2[p]), ps.data)
    want = ps.c_scale * (np.asarray(Hr) @ x[:, 0])
    np.testing.assert_allclose(np.asarray(hx)[:, 0], want,
                               atol=2e-3 * max(1.0, np.abs(want).max()))


def test_phase_solve_matches_oracle_cold_and_warm():
    xrefs, fsteps, phase_fs = _batch([0, 5], 2, vmax=0.5)
    B = 4
    phases_of = np.array([0, 5])
    ps = ml.build_phase_data(CFG, phase_fs)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, phases_of,
        n_iters=600, tile=2, interpret=True))()
    assert bool(np.asarray(sol.converged).all())
    A_full = mpc.cone_matrix(N, CFG.mu)
    for b in range(B):
        H, qlin, l, u, *_ = mpc.build_qp(CFG, jnp.asarray(xrefs[..., b]),
                                         jnp.asarray(fsteps[..., b]))
        f_star = solve_qp_oracle(np.asarray(H, np.float64),
                                 np.asarray(qlin, np.float64), A_full,
                                 np.asarray(l, np.float64),
                                 np.asarray(u, np.float64), tol=1e-10)
        got = np.asarray(st.f[..., b]).reshape(-1)
        # production tolerance (eps 1e-4): the WBC consumes the FIRST
        # step; horizon-tail forces are the least determined
        assert np.abs((got - f_star)[:12]).max() < 0.1
        assert np.abs(got - f_star).max() < 1.5
        sw = ~np.repeat(np.asarray(ps.supports[phases_of[b // 2]]), 3)
        np.testing.assert_allclose(got[sw], 0.0, atol=0.0)

    # warm re-solve with a gait roll (phase p -> p-1, shifted carry)
    phases2 = (phases_of - 1) % N
    fsteps2 = np.zeros_like(fsteps)
    for b in range(B):
        fsteps2[:, :, b] = phase_fs[phases2[b // 2]]
    xrefs2 = xrefs.copy()
    xrefs2[:, 0, :] += 0.002
    x2, st2, sol2 = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs2), jnp.asarray(fsteps2), ps, phases2,
        state=st, shift=True, n_iters=600, tile=2, interpret=True))()
    assert bool(np.asarray(sol2.converged).all())
    for b in range(B):
        H, qlin, l, u, *_ = mpc.build_qp(
            CFG, jnp.asarray(xrefs2[..., b]),
            jnp.asarray(fsteps2[..., b]))
        f_star = solve_qp_oracle(np.asarray(H, np.float64),
                                 np.asarray(qlin, np.float64), A_full,
                                 np.asarray(l, np.float64),
                                 np.asarray(u, np.float64), tol=1e-10)
        got = np.asarray(st2.f[..., b]).reshape(-1)
        assert np.abs((got - f_star)[:12]).max() < 0.1
        assert np.abs(got - f_star).max() < 1.5


def test_divergence_fallback_ships_stale_plan():
    """A lane that fails to converge must ship the (shifted) stale plan
    and reset its carry (the reference's async staleness fallback)."""
    xrefs, fsteps, phase_fs = _batch([2], 2, vmax=0.3)
    phases_of = np.array([2])
    ps = ml.build_phase_data(CFG, phase_fs)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, phases_of,
        n_iters=600, tile=2, interpret=True))()
    assert bool(np.asarray(sol.converged).all())
    # re-solve a JUMPED problem with a 1-iteration budget: nothing
    # converges -> outputs must equal the carried (unshifted) stale
    # forces, carry must be 0
    xrefs_far = xrefs.copy()
    xrefs_far[6, 1:, :] += 1.0
    x2, st2, sol2 = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs_far), jnp.asarray(fsteps), ps, phases_of,
        state=st, n_iters=1, tile=2, interpret=True))()
    assert not bool(np.asarray(sol2.converged).any())
    forces = np.asarray(x2)[12:, :, :]            # (12, N, B)
    stale = np.asarray(st.f).reshape(N, 12, 2).transpose(1, 0, 2)
    np.testing.assert_allclose(forces, stale, atol=1e-6)
    assert float(np.abs(np.asarray(st2.f)).max()) == 0.0


def test_kernel_matches_ref_path():
    """The pallas kernel (interpret) and the pure-XLA reference path run
    the same update equations — iterates must match to fp tolerance."""
    xrefs, fsteps, phase_fs = _batch([0, 9], 2, vmax=0.4)
    ps = ml.build_phase_data(CFG, phase_fs)
    a = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps,
        np.array([0, 9]), n_iters=120, tile=2, interpret=True))()
    b = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps,
        np.array([0, 0, 9, 9]), n_iters=120, tile=1, use_ref=True))()
    np.testing.assert_allclose(np.asarray(a[1].f), np.asarray(b[1].f),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(a[2].pri_res),
                               np.asarray(b[2].pri_res), atol=2e-4)


def test_support_mismatch_marks_unconverged():
    """A problem whose stance pattern does not match its claimed phase
    class must be flagged non-converged (wrong reduced QP) and take the
    stale-plan path rather than ship silently wrong forces."""
    xrefs, fsteps, phase_fs = _batch([4], 2, vmax=0.2)
    ps = ml.build_phase_data(CFG, phase_fs)
    # claim phase 9 while the fsteps are phase 4
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([9]),
        n_iters=400, tile=2, interpret=True))()
    assert not bool(np.asarray(sol.converged).any())
    # correctly-claimed phase converges
    x2, st2, sol2 = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([4]),
        n_iters=400, tile=2, interpret=True))()
    assert bool(np.asarray(sol2.converged).all())


def test_traced_phases_match_static():
    """phases_of as a TRACED jnp array (the fleet rollout's in-graph
    phase rotation) must converge to the same solution as static numpy
    phases. (Mid-transient iterates are NOT compared: the traced gather
    changes XLA fusion order, and the resulting ~1e-7 assembly wobble
    amplifies through the ADMM transient; converged endpoints agree.)"""
    xrefs, fsteps, phase_fs = _batch([1, 7], 2, vmax=0.4)
    ps = ml.build_phase_data(CFG, phase_fs)
    a = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps,
        np.array([1, 7]), n_iters=600, tile=2, interpret=True))()
    b = jax.jit(lambda p: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, p,
        n_iters=600, tile=2, interpret=True))(
            jnp.asarray([1, 7], jnp.int32))
    assert bool(np.asarray(a[2].converged).all())
    assert bool(np.asarray(b[2].converged).all())
    np.testing.assert_allclose(np.asarray(a[1].f), np.asarray(b[1].f),
                               atol=2e-2)


def test_iteration_counts_are_real():
    """Converged lanes must report iters-to-converge strictly below the
    budget when they converge early (VERDICT r3 #8: iters was always
    n_iters); counts have check_every granularity."""
    xrefs, fsteps, phase_fs = _batch([0], 4, vmax=0.3)
    ps = ml.build_phase_data(CFG, phase_fs)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([0]),
        n_iters=800, tile=4, interpret=True))()
    conv = np.asarray(sol.converged)
    iters = np.asarray(sol.iters)
    assert conv.all()
    assert (iters[conv] < 800).all(), iters
    assert (iters % 25 == 0).all()
    # warm re-solve from the solution converges almost immediately
    x2, st2, sol2 = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([0]),
        state=st, n_iters=800, tile=4, interpret=True))()
    assert (np.asarray(sol2.iters) <= iters).all()


def test_stop_at_eps_early_exit():
    """stop_at_eps=True stops the chunk loop once every lane passes the
    OSQP termination test: still converged, solution within the
    eps-level tolerance of the refined full-budget solve, and the
    refined run must not report MORE iterations (same first-pass
    counts; the exit only drops post-convergence refinement)."""
    xrefs, fsteps, phase_fs = _batch([0], 4, vmax=0.3)
    ps = ml.build_phase_data(CFG, phase_fs)
    x_full, st_full, sol_full = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([0]),
        n_iters=800, tile=4, interpret=True))()
    x_ee, st_ee, sol_ee = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([0]),
        n_iters=800, tile=4, interpret=True, stop_at_eps=True))()
    assert bool(np.asarray(sol_ee.converged).all())
    np.testing.assert_array_equal(np.asarray(sol_ee.iters),
                                  np.asarray(sol_full.iters))
    # eps-level agreement on the shipped first-step forces (~1 N at
    # eps 1e-4 on ~25 N stance forces — the measured accuracy cost of
    # stopping at the termination test instead of refining; why the
    # parity-grade paths keep stop_at_eps=False)
    d = np.abs(np.asarray(x_ee[12:, 0]) - np.asarray(x_full[12:, 0]))
    assert d.max() < 2.0, d.max()


def test_rescue_recovers_failed_lanes():
    """rescue_cap routes lanes that fail the phase solve into the
    per-problem support-reduced path: a budget-starved phase solve (1
    iteration -> nothing converges) must come back fully converged via
    the rescue, with forces matching the oracle."""
    from tests.qp_oracle import solve_qp_oracle
    xrefs, fsteps, phase_fs = _batch([3], 2, vmax=0.3)
    ps = ml.build_phase_data(CFG, phase_fs)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([3]),
        n_iters=1, tile=2, interpret=True, rescue_cap=2))()
    assert bool(np.asarray(sol.converged).all()), "rescue did not fire"
    A_full = mpc.cone_matrix(N, CFG.mu)
    for b in range(2):
        H, qlin, l, u, *_ = mpc.build_qp(CFG, jnp.asarray(xrefs[..., b]),
                                         jnp.asarray(fsteps[..., b]))
        f_star = solve_qp_oracle(np.asarray(H, np.float64),
                                 np.asarray(qlin, np.float64), A_full,
                                 np.asarray(l, np.float64),
                                 np.asarray(u, np.float64), tol=1e-10)
        got = np.asarray(st.f[..., b]).reshape(-1)
        assert np.abs((got - f_star)[:12]).max() < 0.1
        assert np.abs(got - f_star).max() < 1.5


def test_rescue_respects_capacity():
    """With more failures than rescue capacity, exactly `cap` lanes are
    rescued and the rest take the stale-plan fallback."""
    xrefs, fsteps, phase_fs = _batch([5], 4, vmax=0.3)
    ps = ml.build_phase_data(CFG, phase_fs)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([5]),
        n_iters=1, tile=4, interpret=True, rescue_cap=2))()
    conv = np.asarray(sol.converged)
    assert conv.sum() == 2, conv


# ----------------------------------------------------------------------
# Generalized phase-class sets (walk / pacing / bounding + transitions)
# ----------------------------------------------------------------------

def _batch_for(phase_fs, phases, per_phase, seed=0, vmax=0.4):
    rng = np.random.default_rng(seed)
    B = len(phases) * per_phase
    xrefs = np.zeros((12, N + 1, B), np.float32)
    xrefs[2, :, :] = H0
    xrefs[:, 0, :] += rng.normal(scale=0.02, size=(12, B)).astype(
        np.float32)
    xrefs[6, 1:, :] = rng.uniform(0, vmax, B).astype(np.float32)
    fsteps = np.zeros((CFG.N_gait, 12, B), np.float32)
    for i, p in enumerate(phases):
        fsteps[:, :, i * per_phase:(i + 1) * per_phase] = \
            phase_fs[p][:, :, None]
    return xrefs, fsteps


def test_gait_phase_set_matches_legacy_trot():
    """gait_phase_fsteps('trot') spans the same 16 supports as the
    legacy trot_phase_fsteps and obeys the cyclic roll convention
    (phase p-1's window is phase p's shifted one row)."""
    legacy = ml.trot_phase_fsteps(CFG)
    gen = ml.gait_phase_fsteps(CFG, "trot")
    assert gen.shape[0] == 16
    sup = lambda fs: (fs[:N, 0::3] != 0).tobytes()
    assert {sup(f) for f in legacy} == {sup(f) for f in gen}
    for p in range(16):
        a = gen[p][:N, 0::3] != 0
        b = gen[(p - 1) % 16][:N, 0::3] != 0
        assert (b[:-1] == a[1:]).all(), p


def test_pacing_phase_set_solves_to_oracle():
    """A pacing-gait phase set (src/Gait.cpp:70-85) solves through the
    phase kernel to oracle accuracy."""
    phase_fs = ml.gait_phase_fsteps(CFG, "pacing")
    assert phase_fs.shape[0] == 16
    ps = ml.build_phase_data(CFG, phase_fs)
    xrefs, fsteps = _batch_for(phase_fs, [0, 7], 2, vmax=0.3)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps,
        np.array([0, 7]), n_iters=600, tile=2, interpret=True))()
    assert bool(np.asarray(sol.converged).all())
    A_full = mpc.cone_matrix(N, CFG.mu)
    for b in [0, 2]:
        H, qlin, l, u, *_ = mpc.build_qp(CFG, jnp.asarray(xrefs[..., b]),
                                         jnp.asarray(fsteps[..., b]))
        f_star = solve_qp_oracle(np.asarray(H, np.float64),
                                 np.asarray(qlin, np.float64), A_full,
                                 np.asarray(l, np.float64),
                                 np.asarray(u, np.float64), tol=1e-10)
        got = np.asarray(st.f[..., b]).reshape(-1)
        assert np.abs((got - f_star)[:12]).max() < 0.1
        assert np.abs(got - f_star).max() < 1.5


def test_walk_phase_set_raises_cap_and_solves():
    """The 4-phase walk has 3 stance feet per row: build_phase_data must
    auto-raise the stance capacity to 3N and the solver must still
    converge with swing forces exactly zero."""
    phase_fs = ml.gait_phase_fsteps(CFG, "walk")
    ps = ml.build_phase_data(CFG, phase_fs)
    assert ps.cap == 3 * N, ps.cap
    xrefs, fsteps = _batch_for(phase_fs, [2], 2, vmax=0.2)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        CFG, jnp.asarray(xrefs), jnp.asarray(fsteps), ps, np.array([2]),
        n_iters=800, tile=2, interpret=True))()
    assert bool(np.asarray(sol.converged).all())
    sw = ~np.repeat(np.asarray(ps.supports[2]), 3)
    for b in range(2):
        got = np.asarray(st.f[..., b]).reshape(-1)
        np.testing.assert_allclose(got[sw], 0.0, atol=0.0)
        fz = got.reshape(N, 4, 3)[:, :, 2]
        stance = np.asarray(ps.supports[2]).reshape(N, 4)
        W = CFG.mass * CFG.gravity
        assert abs(np.median(fz[stance].reshape(N, 3).sum(axis=1)) - W) \
            < 0.4 * W


def test_static_phase_set_collapses_to_one():
    assert ml.gait_phase_fsteps(CFG, "static").shape[0] == 1


def test_transition_set_covers_gait_switch_capture():
    """Closed-loop capture with a joystick gait switch trot -> pacing
    (src/Gait.cpp:197-219): EVERY captured MPC cycle's support must
    match the union of {trot classes, pacing classes, trot->pacing
    transition windows} — phase_match_rate 1.0 on a switching capture
    (VERDICT r3 #5)."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    n = 400
    ctl, carry = make_rollout(CFG, dtype=jnp.float64)
    # one-tick pulse: the reference's joystick emits the code once per
    # button press (scripts/Joystick.py:144-158 clears the button flag)
    js = np.zeros(n, np.int32)
    js[200] = 1                        # switch to pacing at tick 200
    carry, logs = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64),
        joystick_schedule=jnp.asarray(js), perfect_estimator=True))(
            carry)
    assert not bool(np.asarray(logs.error).any())
    union = ml.union_phase_fsteps(CFG, [
        ml.gait_phase_fsteps(CFG, "trot"),
        ml.gait_phase_fsteps(CFG, "pacing"),
        ml.transition_phase_fsteps(CFG, "trot", "pacing")])
    sups = (union[:, :N, 0::3] != 0).reshape(union.shape[0], -1)
    fsteps = np.asarray(logs.mpc_fsteps)[::CFG.k_mpc]
    have = (fsteps[:, :N, 0::3] != 0).reshape(fsteps.shape[0], -1)
    matched = np.array([(sups == h).all(axis=1).any() for h in have])
    assert matched.all(), np.where(~matched)[0]
    # and the capture really switched: both pure-gait sets are hit
    pac = (ml.gait_phase_fsteps(CFG, "pacing")[:, :N, 0::3] != 0)
    pac = pac.reshape(16, -1)
    hit_pac = np.array([(pac == h).all(axis=1).any() for h in have])
    assert hit_pac.any()


def test_calibrate_phase_fsteps_mechanics():
    """Metric calibration re-centers each class's stance footholds on
    the mean captured foothold of matched cycles, preserves the support
    pattern exactly (swing entries stay zero), and leaves unmatched
    classes at their nominals."""
    phase_fs = ml.gait_phase_fsteps(CFG, "pacing")
    rng = np.random.default_rng(0)
    # fake capture: 3 cycles of class 2 with displaced footholds
    cap = np.repeat(phase_fs[2][None], 3, axis=0).copy()
    stance = np.repeat((phase_fs[2][:N, 0::3] != 0), 3, axis=1)
    for i in range(3):
        cap[i, :N] += stance * (0.05 * (i + 1))
    cal = ml.calibrate_phase_fsteps(CFG, phase_fs, cap)
    # class 2: stance entries moved by the mean displacement (0.10)
    np.testing.assert_allclose(cal[2][:N][stance],
                               phase_fs[2][:N][stance] + 0.10,
                               atol=1e-6)
    np.testing.assert_allclose(cal[2][:N][~stance], 0.0, atol=0.0)
    # unmatched classes untouched
    np.testing.assert_array_equal(cal[5], phase_fs[5])
    # support patterns identical -> build_phase_data accepts the set
    ps = ml.build_phase_data(CFG, cal)
    assert (np.asarray(ps.supports)
            == (phase_fs[:, :N, 0::3] != 0).reshape(16, -1)).all()
