"""Solver parity over a 320-cycle closed-loop trot (BASELINE.md target:
"match OSQP-MPC ground-reaction forces / joint torques within tolerance
over a 320-step horizon").

Procedure:
  1. capture 320 MPC cycles (3200 WBC ticks) of the closed-loop trot at
     the reference's own velID=2 ramp, solved in f64 at the reference
     tolerances (eps 1e-6, src/MPC.cpp:529-530);
  2. re-solve every cycle's QP with
       a. the f64 interior-point ORACLE (tests/qp_oracle — the role OSQP
          plays for the reference; verified by KKT residuals),
       b. the production Pallas f32 path at its relaxed controller
          tolerance (eps 1e-4, warm-started cycle to cycle exactly like
          bench.py / the 50 Hz controller),
       c. the XLA f64 sync path at reference tolerances (eps 1e-6);
  3. report max/mean force errors vs the oracle (first-step forces — the
     ones the WBC actually consumes — and the full horizon), plus the
     relaxed path's convergence rate, and the induced joint-torque error
     via the contact-Jacobian map tau = -Jc' f at the logged
     configuration (upper-bounding the WBC torque deviation).

Run: python -m qrw_tpu.eval.parity_320 [--cycles 320] [--backend auto]
Prints one JSON dict; paste into PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


SWITCH_CODES = {"pacing": 1, "bounding": 2, "trot": 3, "static": 4}


def capture(cfg, n_cycles: int, perfect: bool = False,
            gait: str = "trot", switch_to: str = None):
    """(C, 12, N+1) xrefs + (C, N_gait, 12) fsteps from a closed-loop
    run driven by the velID=2 profile (f64, reference tolerances).
    perfect=False (default) runs the REAL complementary-filter estimator
    — the reference's shipping configuration
    (scripts/Controller.py:102-111). switch_to injects a one-tick
    joystick gait-switch pulse at the capture midpoint
    (src/Gait.cpp:197-219)."""
    import jax
    import jax.numpy as jnp
    from qrw_tpu.sim.rollout import make_rollout, rollout

    n_ticks = n_cycles * cfg.k_mpc
    ctl, carry = make_rollout(cfg, dtype=jnp.float64, gait=gait)
    js = None
    if switch_to is not None:
        js_np = np.zeros(n_ticks, np.int32)
        js_np[(n_cycles // 2) * cfg.k_mpc] = SWITCH_CODES[switch_to]
        js = jnp.asarray(js_np)
    _, logs = jax.jit(lambda c: rollout(
        ctl, c, n_ticks, perfect_estimator=perfect,
        joystick_schedule=js))(carry)
    assert not bool(np.asarray(logs.error).any()), "capture run latched"
    ticks = np.arange(0, n_ticks, cfg.k_mpc)
    return (np.asarray(logs.mpc_xref)[ticks],
            np.asarray(logs.mpc_fsteps)[ticks],
            np.asarray(logs.q_mes)[ticks])


def build_phase_set(cfg, gait: str, switch_to: str = None):
    """(P, N_gait, 12) phase classes covering the capture: the cyclic
    set of `gait`, plus — for a switching capture — the target gait's
    set and the mixed transition windows."""
    from qrw_tpu.core import mpc_lane as ml
    if switch_to is None:
        return ml.gait_phase_fsteps(cfg, gait)
    return ml.union_phase_fsteps(cfg, [
        ml.gait_phase_fsteps(cfg, gait),
        ml.gait_phase_fsteps(cfg, switch_to),
        ml.transition_phase_fsteps(cfg, gait, switch_to)])


def solve_oracle(cfg, xrefs, fsteps):
    """Ground-truth forces per cycle: f64 IPM on the exact condensed QP."""
    import jax.numpy as jnp
    from qrw_tpu.core import mpc as mpc_mod
    sys.path.insert(0, "tests")
    from qp_oracle import solve_qp_oracle

    C = xrefs.shape[0]
    A = mpc_mod.cone_matrix(cfg.n_steps, cfg.mu)
    out = np.zeros((C, 12 * cfg.n_steps))
    for i in range(C):
        H, qlin, l, u, _, _ = mpc_mod.build_qp(
            cfg, jnp.asarray(xrefs[i], jnp.float64),
            jnp.asarray(fsteps[i], jnp.float64))
        out[i] = solve_qp_oracle(np.asarray(H), np.asarray(qlin), A,
                                 np.asarray(l), np.asarray(u), tol=1e-10)
    return out


def solve_pallas_seq(cfg, xrefs, fsteps, interpret: bool):
    """The production relaxed-tolerance path, warm-started cycle to cycle
    (the controller's 50 Hz execution pattern). Batch of 1 per call."""
    import jax
    import jax.numpy as jnp
    from qrw_tpu.core import mpc as mpc_mod
    from qrw_tpu.ops import qp

    settings = qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=450,
                             adaptive_rho_interval=200)
    tile = 8
    refactor = "ns"       # the production warm K^-1 policy (bench.py
                          # --mode full); measured explicitly rather
                          # than relying on the "stale" default
    C = xrefs.shape[0]
    xs = jnp.asarray(xrefs, jnp.float32)
    fs = jnp.asarray(fsteps, jnp.float32)

    # The whole 320-cycle warm chain runs as ONE jitted lax.scan (cold
    # first cycle, then warm carries) — a single dispatch and a single
    # device->host fetch instead of 2 reads x C cycles through the
    # remote-TPU tunnel (sequential host dispatches proved flaky there).
    def chain(xs, fs):
        _, st0, sol0 = mpc_mod.solve_mpc_batch_pallas(
            cfg, xs[0:1], fs[0:1], settings=settings, tile=tile,
            interpret=interpret)

        def body(st, xf):
            x, f = xf
            _, st2, sol = mpc_mod.solve_mpc_batch_pallas(
                cfg, x[None], f[None], state=st, settings=settings,
                schedule=[100], tile=tile, refactor=refactor,
                interpret=interpret)
            return st2, (sol.x[0], sol.converged[0])

        _, (x_rest, conv_rest) = jax.lax.scan(body, st0,
                                              (xs[1:], fs[1:]))
        x_all = jnp.concatenate([sol0.x, x_rest], axis=0)
        conv_all = jnp.concatenate([sol0.converged, conv_rest], axis=0)
        return x_all, conv_all

    x_all, conv_all = jax.jit(chain)(xs, fs)
    return (np.asarray(x_all, np.float64),
            np.asarray(conv_all, bool).reshape(C))


def solve_phase_cold(cfg, xrefs, fsteps, phase_fs=None):
    """The lane-major phase solver (the production throughput path,
    core/mpc_lane) on every captured cycle, cold at the production
    300-iteration budget, via the pure-XLA reference path (identical
    update equations to the pallas kernel —
    tests/test_mpc_lane.py::test_kernel_matches_ref_path). Cycles whose
    stance support is not in the phase-class set are excluded (reported
    as phase_match_rate). Returns (forces (C, 12N), conv (C,),
    matched (C,))."""
    import jax
    import jax.numpy as jnp
    from qrw_tpu.core import mpc_lane as ml

    C = xrefs.shape[0]
    N = cfg.n_steps
    if phase_fs is None:
        phase_fs = ml.trot_phase_fsteps(cfg)
    ps = ml.build_phase_data(cfg, phase_fs)
    sup = (fsteps[:, :N, 0::3] != 0).reshape(C, -1)      # (C, 4N)
    phases = np.full(C, -1, np.int32)
    for i in range(C):
        m = np.where((ps.supports == sup[i]).all(axis=1))[0]
        if m.size:
            phases[i] = m[0]
    matched = phases >= 0
    idx = np.where(matched)[0]
    xr = jnp.asarray(np.moveaxis(xrefs[idx], 0, -1), jnp.float32)
    fs = jnp.asarray(np.moveaxis(fsteps[idx], 0, -1), jnp.float32)
    x_f, st, sol = jax.jit(lambda: ml.solve_mpc_batch_phase(
        cfg, xr, fs, ps, phases[idx], n_iters=300, tile=1,
        use_ref=True))()
    out = np.zeros((C, 12 * N))
    conv = np.zeros(C, bool)
    out[idx] = np.asarray(st.f).reshape(4 * N * 3, -1).T
    conv[idx] = np.asarray(sol.converged)
    return out, conv, matched


def solve_phase_warm_streams(cfg, xrefs, fsteps, phase_fs=None):
    """The phase solver in its production FLEET pattern: the captured
    cycle sequence is grouped into 16 phase-streams (consecutive cycles
    rotate through the gait offsets), each stream warm-starting from its
    own previous solve (one gait period earlier). All 16 streams solve
    in parallel per round at the production 300-iteration budget.
    Rounds containing an unmatched cycle (e.g. a gait-switch window)
    reset the warm carry and are skipped. Returns (forces (C, 12N),
    conv (C,), matched (C,))."""
    import jax
    import jax.numpy as jnp
    from qrw_tpu.core import mpc_lane as ml

    C = xrefs.shape[0]
    N = cfg.n_steps
    if phase_fs is None:
        phase_fs = ml.trot_phase_fsteps(cfg)
    ps = ml.build_phase_data(cfg, phase_fs)
    sup = (fsteps[:, :N, 0::3] != 0).reshape(C, -1)
    phases = np.full(C, -1, np.int32)
    for i in range(C):
        m = np.where((ps.supports == sup[i]).all(axis=1))[0]
        if m.size:
            phases[i] = m[0]
    matched = phases >= 0
    out = np.zeros((C, 12 * N))
    conv = np.zeros(C, bool)
    # rounds of 16 consecutive cycles — one problem per phase-stream
    P = N
    R = C // P
    st = None
    solve = jax.jit(lambda xr, fs, ph, st: ml.solve_mpc_batch_phase(
        cfg, xr, fs, ps, ph, state=st, n_iters=300, tile=1,
        use_ref=True), static_argnums=2)
    for r in range(R):
        idx = np.arange(r * P, (r + 1) * P)
        if not matched[idx].all():
            st = None
            continue
        xr = jnp.asarray(np.moveaxis(xrefs[idx], 0, -1), jnp.float32)
        fs = jnp.asarray(np.moveaxis(fsteps[idx], 0, -1), jnp.float32)
        x_f, st, sol = solve(xr, fs, tuple(phases[idx]), st)
        out[idx] = np.asarray(st.f).reshape(4 * N * 3, P).T
        conv[idx] = np.asarray(sol.converged)
    return out, conv, matched


def solve_xla64_seq(cfg, xrefs, fsteps):
    """The f64 sync path at reference tolerances, warm-started."""
    import jax
    import jax.numpy as jnp
    from qrw_tpu.core import mpc as mpc_mod

    solve = jax.jit(lambda x, f, st: mpc_mod.solve_mpc(cfg, x, f, st))
    C = xrefs.shape[0]
    out = np.zeros((C, 12 * cfg.n_steps))
    st = None
    for i in range(C):
        res = solve(jnp.asarray(xrefs[i], jnp.float64),
                    jnp.asarray(fsteps[i], jnp.float64), st)
        st = res.state
        out[i] = np.asarray(res.state.f)
    return out


def torque_error(cfg, q_mes, df_first):
    """|tau| error induced by a first-step force error df via the
    stance-feet contact-Jacobian map tau = -Jc[:, 6:]' f at the logged
    joint configuration (scripts/QP_WBC.py:110-117)."""
    import jax.numpy as jnp
    from qrw_tpu.models.solo12 import make_solo12
    from qrw_tpu.ops import rbd

    model = rbd.to_jax(make_solo12())
    C = q_mes.shape[0]
    errs = np.zeros(C)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64)
    base = jnp.asarray([0.0, 0.0, cfg.h_ref], jnp.float64)
    for i in range(C):
        J = rbd.foot_jacobians(model, base, ident,
                               jnp.asarray(q_mes[i], jnp.float64))
        Jc = np.asarray(J).reshape(12, 18)[:, 6:]
        errs[i] = np.max(np.abs(Jc.T @ df_first[i]))
    return errs


def _pallas_phase(data_path: str, out_path: str, interpret: bool):
    """Subprocess phase: the production f32 Pallas chain. Runs WITHOUT
    jax_enable_x64 (x64 mode leaks i64 scalars into the Mosaic kernel,
    which the TPU toolchain rejects)."""
    import jax
    from qrw_tpu.config import Config
    cfg = Config(velID=2)
    with np.load(data_path) as f:
        xrefs, fsteps = f["xrefs"], f["fsteps"]
    f_relaxed, conv = solve_pallas_seq(cfg, xrefs, fsteps, interpret)
    np.savez(out_path, f_relaxed=f_relaxed, conv=conv)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=320)
    ap.add_argument("--perfect-estimator", action="store_true",
                    help="capture with ground-truth state injection "
                         "(default: the real complementary filter)")
    ap.add_argument("--gait", default="trot",
                    choices=["trot", "walk", "pacing", "bounding"],
                    help="gait of the capture (phase set matches)")
    ap.add_argument("--switch", default=None, metavar="TO",
                    choices=["trot", "pacing", "bounding", "static"],
                    help="inject a joystick gait switch at the capture "
                         "midpoint; the phase set becomes the union of "
                         "both gaits' classes + transition windows")
    ap.add_argument("--no-calibrate", action="store_true",
                    help="keep shoulder-nominal metric footholds "
                         "instead of calibrating to the capture")
    ap.add_argument("--backend", choices=["auto", "pallas", "interpret"],
                    default="auto")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--phase", choices=["all", "pallas"], default="all")
    ap.add_argument("--data", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import os
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    on_tpu = (not args.cpu
              and any(d.platform != "cpu" for d in jax.devices()))
    interpret = (args.backend == "interpret") or (args.backend == "auto"
                                                  and not on_tpu)
    if args.phase == "pallas":
        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        _pallas_phase(args.data, args.out, interpret)
        return None

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from qrw_tpu.config import Config
    cfg = Config(velID=2)

    # f64 work (capture, oracle QP builds, reference-tolerance path) runs
    # on host CPU; the production Pallas f32 path runs in a subprocess
    # without x64 (accelerator when present, interpret mode otherwise).
    cpu0 = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu0):
        xrefs, fsteps, q_mes = capture(cfg, args.cycles,
                                       perfect=args.perfect_estimator,
                                       gait=args.gait,
                                       switch_to=args.switch)
        phase_fs = build_phase_set(cfg, args.gait, args.switch)
        if not args.no_calibrate:
            # re-center the shared metrics on the captured foothold
            # distribution (a production deployment would calibrate
            # from a shakedown run the same way) — essential for gaits
            # whose planner footholds deviate far from the shoulder
            # nominals (core/mpc_lane.calibrate_phase_fsteps)
            from qrw_tpu.core import mpc_lane as ml
            phase_fs = ml.calibrate_phase_fsteps(cfg, phase_fs, fsteps)
        f_star = solve_oracle(cfg, xrefs, fsteps)
        f_ref64 = solve_xla64_seq(cfg, xrefs, fsteps)
        f_phase, conv_phase, matched = solve_phase_cold(
            cfg, xrefs, fsteps, phase_fs)
        f_ph_w, conv_ph_w, matched_w = solve_phase_warm_streams(
            cfg, xrefs, fsteps, phase_fs)

    import subprocess
    import sys as _sys
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        dp = os.path.join(td, "cycles.npz")
        op = os.path.join(td, "pallas.npz")
        np.savez(dp, xrefs=xrefs, fsteps=fsteps)
        cmd = [_sys.executable, "-m", "qrw_tpu.eval.parity_320",
               "--phase", "pallas", "--data", dp, "--out", op,
               "--backend", args.backend]
        if args.cpu:
            cmd.append("--cpu")
        r = subprocess.run(cmd, timeout=3600, capture_output=True,
                           text=True)
        if r.returncode != 0:
            print(r.stderr[-1500:], file=sys.stderr)
            raise RuntimeError("pallas phase failed")
        with np.load(op) as f:
            f_relaxed, conv = f["f_relaxed"], f["conv"]

    N = cfg.n_steps

    def stats(f):
        d = f - f_star
        d1 = d.reshape(-1, N, 12)[:, 0, :]          # first-step forces
        return {
            "force_err_max_first_step_N": float(np.abs(d1).max()),
            "force_err_mean_first_step_N": float(np.abs(d1).mean()),
            "force_err_max_horizon_N": float(np.abs(d).max()),
            "force_err_rms_horizon_N": float(np.sqrt((d ** 2).mean())),
        }

    df1 = (f_relaxed - f_star).reshape(-1, N, 12)[:, 0, :]
    with jax.default_device(cpu0):
        tau_err = torque_error(cfg, q_mes, df1)
    fz_scale = cfg.mass * cfg.gravity / 2.0   # per-foot stance force scale

    def stats_sel(f, sel):
        if not np.any(sel):
            # short --cycles runs or captures whose startup segment never
            # phase-matches can select nothing; report that rather than
            # crashing on an empty max
            return {"n_selected": 0}
        d = (f - f_star)[sel]
        d1 = d.reshape(-1, N, 12)[:, 0, :]
        return {
            "force_err_max_first_step_N": float(np.abs(d1).max()),
            "force_err_mean_first_step_N": float(np.abs(d1).mean()),
            "force_err_max_horizon_N": float(np.abs(d).max()),
        }

    out = {
        "cycles": int(args.cycles),
        "gait": args.gait + (f"->{args.switch}" if args.switch else ""),
        "n_phase_classes": int(phase_fs.shape[0]),
        "metric_calibration": ("none (shoulder nominals)"
                               if args.no_calibrate
                               else "captured-foothold means"),
        "estimator": ("perfect" if args.perfect_estimator
                      else "complementary (reference default)"),
        "backend_relaxed": "pallas-interpret" if interpret else "pallas",
        "relaxed_conv_rate": float(conv.mean()),
        "relaxed_eps": 1e-4,
        "relaxed": stats(f_relaxed),
        "f64_eps1e-6": stats(f_ref64),
        "phase_solver_cold": stats_sel(f_phase, matched & conv_phase),
        "phase_conv_rate": float(conv_phase[matched].mean()),
        "phase_match_rate": float(matched.mean()),
        "phase_solver_warm_streams": stats_sel(f_ph_w,
                                               matched_w & conv_ph_w),
        "phase_solver_warm_steady": stats_sel(
            f_ph_w, matched_w & conv_ph_w
            & (np.arange(int(args.cycles)) >= cfg.n_steps)),
        "phase_warm_conv_rate": float(conv_ph_w[matched_w].mean()),
        "torque_err_max_Nm_relaxed": float(tau_err.max()),
        "torque_budget_Nm": 8.0,
        "stance_fz_scale_N": float(fz_scale),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":  # pragma: no cover
    main()
