"""DDP MPC physics invariants (mirror of the QP-MPC tier-2 tests applied
to the Crocoddyl-equivalent backend, scripts/crocoddyl_class/
MPC_crocoddyl.py + scripts/test_mpc.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from qrw_tpu.config import Config
from qrw_tpu.core import mpc_ddp
from tests.test_mpc import (_fsteps_fourstance, _fsteps_trot, _xref, H0,
                            MG4, CFG)


def _closed_loop_ddp(xref, fsteps_fn, iters, nonlinear=False):
    settings = mpc_ddp.DDPSettings(nonlinear=nonlinear)
    st = mpc_ddp.init_ddp_state(CFG, jnp.float64)
    xref = jnp.asarray(xref)
    res = None
    for i in range(iters):
        res = mpc_ddp.solve_mpc_ddp(CFG, xref, jnp.asarray(fsteps_fn(i)),
                                    st, settings)
        st = res.state
        xref = xref.at[:, 0].set(res.x_f_applied[:12, 0])
    return res, xref


def test_ddp_fourstance_equilibrium():
    res, xref = _closed_loop_ddp(_xref(), lambda i: _fsteps_fourstance(),
                                 30)
    x_f = np.asarray(res.x_f_applied)
    f0 = x_f[12:, 0]
    # forces symmetric left/right and front/back pairs, fz near mg/4
    np.testing.assert_allclose(f0[2::3], MG4, rtol=0.05)
    np.testing.assert_allclose(f0[0::3], 0.0, atol=0.1)
    # converged near the reference state
    np.testing.assert_allclose(x_f[:12, 0], np.asarray(xref[:, 1]),
                               atol=5e-3)


def test_ddp_trot_tracks_reference():
    res, xref = _closed_loop_ddp(_xref(), lambda i: _fsteps_trot(i % 16),
                                 48)
    x_f = np.asarray(res.x_f_applied)
    np.testing.assert_allclose(x_f[:12, 0], np.asarray(xref[:, 1]),
                               atol=2e-2)
    # swing feet carry zero force
    gait0 = _fsteps_trot(0)[0, 0::3] != 0
    np.testing.assert_allclose(
        x_f[12:, 0].reshape(4, 3)[~gait0], 0.0, atol=1e-9)
    # stance feet within the (inner) friction cone and fz bounds
    stance_f = x_f[12:, 0].reshape(4, 3)[gait0]
    assert np.all(stance_f[:, 2] > 0.0)
    assert np.all(stance_f[:, 2] < CFG.fz_max + 1e-6)


def test_ddp_nonlinear_variant_runs():
    """ActionModelQuadrupedNonLinear analog: yaw from the iterate."""
    xref = _xref()
    xref[5, 1:] = np.linspace(0.0, 0.3, CFG.n_steps)  # yaw ramp
    res, _ = _closed_loop_ddp(xref, lambda i: _fsteps_fourstance(), 10,
                              nonlinear=True)
    x_f = np.asarray(res.x_f_applied)
    assert np.all(np.isfinite(x_f))
    np.testing.assert_allclose(x_f[2, 0], H0, atol=2e-2)


def test_ddp_batched_matches_single():
    xrefs = np.stack([_xref(), _xref([0.02, 0, H0, 0, 0, 0,
                                      0.1, 0, 0, 0, 0, 0])])
    fsteps = np.stack([_fsteps_fourstance(), _fsteps_trot(3)])
    single = [mpc_ddp.solve_mpc_ddp(CFG, jnp.asarray(xrefs[i]),
                                    jnp.asarray(fsteps[i]))
              for i in range(2)]
    batched = jax.vmap(lambda x, f: mpc_ddp.solve_mpc_ddp(CFG, x, f))(
        jnp.asarray(xrefs), jnp.asarray(fsteps))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(batched.x_f_applied[i]),
                                   np.asarray(single[i].x_f_applied),
                                   atol=1e-8)


def test_ddp_v2_variant_equilibrium():
    """MPC_crocoddyl_2 analog (scripts/crocoddyl_class/MPC_crocoddyl_2.py
    :45-48,69-71): implicit integration + relative-force regularization.
    With the regularizer centered at the static gravity distribution the
    stance forces should sit essentially exactly at mg/4."""
    settings = mpc_ddp.DDPSettings(implicit_integration=True,
                                   relative_forces=True)
    st = mpc_ddp.init_ddp_state(CFG, jnp.float64)
    xref = jnp.asarray(_xref())
    for i in range(30):
        res = mpc_ddp.solve_mpc_ddp(CFG, xref,
                                    jnp.asarray(_fsteps_fourstance()),
                                    st, settings)
        st = res.state
        xref = xref.at[:, 0].set(res.x_f_applied[:12, 0])
    f0 = np.asarray(res.x_f_applied)[12:, 0]
    np.testing.assert_allclose(f0[2::3], MG4, rtol=0.01)
    np.testing.assert_allclose(f0[0::3], 0.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(res.x_f_applied)[:12, 0],
                               np.asarray(xref[:, 1]), atol=5e-3)


def test_ddp_derivatives_match_finite_differences():
    """crocoddyl_eval/test_2 analog (scripts/crocoddyl_eval/README.md:8-10):
    the reference checks its hand-coded action-model derivatives against
    ActionModelNumDiff; here the autodiff Jacobians/gradients the iLQR
    sweep consumes are checked against central finite differences."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(scale=0.1, size=12) + np.eye(12)[2] * H0)
    u = jnp.asarray(rng.uniform(1.0, 8.0, size=12))
    feet = jnp.asarray(_fsteps_fourstance()[0], jnp.float64)
    gait = jnp.ones(4, jnp.float64)
    xref_k = jnp.asarray(_xref(), jnp.float64)[:, 1]

    for implicit in (False, True):
        def f(xu):
            return mpc_ddp._dynamics(CFG, xu[:12], xu[12:], feet, gait,
                                     xu[5], implicit=implicit)
        xu = jnp.concatenate([x, u])
        J = np.asarray(jax.jacobian(f)(xu))
        eps = 1e-6
        J_fd = np.zeros_like(J)
        for i in range(24):
            e = np.zeros(24); e[i] = eps
            J_fd[:, i] = (np.asarray(f(xu + e)) - np.asarray(f(xu - e))) \
                / (2 * eps)
        np.testing.assert_allclose(J, J_fd, atol=1e-6)

    for rel in (False, True):
        def c(xu):
            return mpc_ddp._stage_cost(CFG, xu[:12], xu[12:], xref_k,
                                       feet, gait, relative_forces=rel)
        xu = jnp.concatenate([x, u])
        g = np.asarray(jax.grad(c)(xu))
        eps = 1e-6
        g_fd = np.array([(float(c(xu + eps * jnp.eye(24)[i]))
                          - float(c(xu - eps * jnp.eye(24)[i])))
                         / (2 * eps) for i in range(24)])
        np.testing.assert_allclose(g, g_fd, atol=1e-5)


def test_ddp_every_tick_mode():
    """crocoddyl_eval/test_5 analog: DDP re-solved every WBC tick with a
    shrinking first node. The closed loop must stand at least as well as
    the 50 Hz mode."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = CFG.replace(type_MPC=False, mpc_every_tick=True)
    ctl, carry = make_rollout(cfg, dtype=jnp.float64)
    n = 300
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
    _, logs = run(carry)
    bp = np.asarray(logs.base_pos)
    assert abs(bp[-1, 2] - cfg.h_ref) < 0.05, bp[-1]
    assert not bool(np.asarray(logs.error).any())
    # first-node duration shrink: solve at k just before a boundary has
    # dt_first = dt_wbc; sanity-check via a direct solve
    st = mpc_ddp.init_ddp_state(cfg, jnp.float64)
    xref = jnp.asarray(_xref())
    r_full = mpc_ddp.solve_mpc_ddp(cfg, xref,
                                   jnp.asarray(_fsteps_fourstance()), st,
                                   dt_first=cfg.dt_mpc, shift_warm=False)
    r_tiny = mpc_ddp.solve_mpc_ddp(cfg, xref,
                                   jnp.asarray(_fsteps_fourstance()), st,
                                   dt_first=cfg.dt_wbc, shift_warm=False)
    # with a shorter first node the first predicted state moves less
    d_full = np.abs(np.asarray(r_full.x_f_applied)[2, 0] - H0)
    d_tiny = np.abs(np.asarray(r_tiny.x_f_applied)[2, 0] - H0)
    assert np.isfinite(d_full) and np.isfinite(d_tiny)
    assert d_tiny <= d_full + 1e-9


def test_ddp_backend_rollout_stands():
    """Full closed-loop rollout with type_MPC=False (DDP backend)."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    cfg = CFG.replace(type_MPC=False)
    ctl, carry = make_rollout(cfg, dtype=jnp.float64)
    n = 400
    run = jax.jit(lambda c: rollout(
        ctl, c, n, v_ref_schedule=jnp.zeros((n, 6), jnp.float64)))
    carry2, logs = run(carry)
    bp = np.asarray(logs.base_pos)
    assert abs(bp[-1, 2] - cfg.h_ref) < 0.05, bp[-1]
    assert not bool(np.asarray(logs.error).any())
