"""Main entry point: closed-loop Solo-12 walking runs from the CLI.

TPU-native re-design of the reference entry point
(scripts/main_solo12_control.py:91-354). The reference's 500 Hz host loop
(device.UpdateMeasurment -> controller.compute -> device.SendCommand)
becomes one jitted lax.scan rollout on the accelerator; the CLI keeps the
same user-facing contract (choose scenario/velocity profile/duration, run,
then log/plot) and adds the TPU-native scale-out axis: --batch N runs N
perturbed scenarios simultaneously via vmap, sharded over all local
devices when --mesh is given.

Usage examples:
    python -m qrw_tpu.runtime.main --ticks 3000 --velID 2 --save
    python -m qrw_tpu.runtime.main --batch 256 --mesh --ticks 1000
    python -m qrw_tpu.runtime.main --cpu --ticks 480 --plot out
"""

from __future__ import annotations

import argparse
import time


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="qrw_tpu closed-loop walking runner")
    p.add_argument("--ticks", type=int, default=None,
                   help="number of 2 ms control ticks (default from config)")
    p.add_argument("--velID", type=int, default=None,
                   help="predefined velocity profile 0..6")
    p.add_argument("--gait", default="trot",
                   choices=["trot", "walk", "pacing", "bounding", "static"])
    p.add_argument("--envID", type=int, default=None,
                   help="0 flat, 1 stairs obstacle course")
    p.add_argument("--bumpy", action="store_true",
                   help="procedural bumpy terrain (use_flat_plane=False)")
    p.add_argument("--kf", action="store_true",
                   help="use the 18-state Kalman estimator")
    p.add_argument("--ddp", action="store_true",
                   help="use the DDP (Crocoddyl-equivalent) MPC backend")
    p.add_argument("--perfect", action="store_true",
                   help="perfect estimator (simulator ground truth)")
    p.add_argument("--batch", type=int, default=0,
                   help="run N perturbed scenarios in parallel (0 = single)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--f64", action="store_true", help="run in float64 (CPU)")
    p.add_argument("--save", nargs="?", const="", default=None,
                   metavar="PATH", help="save logs to .npz")
    p.add_argument("--plot", nargs="?", const="qrw_run", default=None,
                   metavar="PREFIX", help="save plotAll figures as PNGs")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--host-loop", action="store_true",
                   help="drive the masterboard-style device facade from "
                        "the host instead of the in-graph rollout")
    p.add_argument("--clone", action="store_true",
                   help="mirror commands to a second simulated robot "
                        "(host-loop mode; reference -c option)")
    p.add_argument("--gamepad", action="store_true",
                   help="read a physical gamepad (host-loop mode; "
                        "requires the `inputs` package)")
    p.add_argument("--realtime", action="store_true",
                   help="pace the host loop to 500 Hz real time")
    p.add_argument("--sweep", action="store_true",
                   help="run the batched velocity-envelope sweep "
                        "(crocoddyl_eval/test_4 analog) and exit")
    p.add_argument("--estimator-demo", action="store_true",
                   help="estimator-only evaluation run "
                        "(main_solo12_demo_estimator analog) and exit")
    p.add_argument("--fleet-mpc", type=int, default=0, metavar="B",
                   help="MPC-fleet service demo: solve B phase-sorted "
                        "trot scenarios per 50 Hz cycle on the "
                        "lane-major phase solver and report solves/s + "
                        "convergence (the production throughput path)")
    p.add_argument("--fleet-cycles", type=int, default=10,
                   help="warm cycles for --fleet-mpc")
    p.add_argument("--fleet", type=int, default=0, metavar="B",
                   help="CLOSED-LOOP fleet: B simultaneous scenarios "
                        "whose MPC solves all run through ONE lane-major "
                        "phase-solver dispatch per 50 Hz cycle "
                        "(sim/fleet.py — the production fleet loop; "
                        "--batch by contrast vmaps the per-problem "
                        "solver)")
    p.add_argument("--hetero", type=int, default=0, metavar="B",
                   help="HETEROGENEOUS closed-loop fleet: B scenarios "
                        "over gaits {trot,walk,bounding} (per tile) x "
                        "velocity profiles velID 0-6 x terrains "
                        "{flat,bumpy,stairs}, real estimator in the "
                        "loop (the reference's mixed-world sweep, "
                        "scripts/PyBulletSimulator.py:36-175)")
    p.add_argument("--rescue", type=int, default=None,
                   help="rescue-stage capacity for --fleet "
                        "(default B/32)")
    return p


def _run_fleet(args, cfg, dtype):
    """Closed-loop lane-major fleet rollout (sim/fleet.py): the phase
    solver IS the fleet's MPC, in the loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qrw_tpu.core import mpc_lane as ml
    from qrw_tpu.sim import fleet as fl

    on_cpu = all(d.platform == "cpu" for d in jax.devices())
    tile = 1 if on_cpu else 128
    B = max(args.fleet, tile)
    B = (B // tile) * tile
    ps = ml.build_phase_data(cfg, ml.trot_phase_fsteps(cfg))
    ctl, carry = fl.make_fleet(cfg, B, ps, tile=tile, seed=args.seed)
    n_cycles = max(1, cfg.N_SIMULATION // cfg.k_mpc)
    rescue = args.rescue if args.rescue is not None else max(4, B // 32)
    run = jax.jit(lambda c: fl.fleet_rollout(
        ctl, c, n_cycles, ps, tile=tile, n_iters=300,
        rescue_cap=rescue, use_ref=on_cpu, interpret=on_cpu,
        perfect_estimator=args.perfect))
    t0 = time.perf_counter()
    carry2, logs, cyc = run(carry)
    jax.block_until_ready(carry2)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry2, logs, cyc = run(carry)
    jax.block_until_ready(carry2)
    wall = time.perf_counter() - t0
    n_ticks = n_cycles * cfg.k_mpc
    h = np.asarray(logs.base_pos)[:, :, 2]
    err = np.asarray(logs.error)
    conv = np.asarray(cyc.converged)
    print(f"fleet: {B} scenarios x {n_ticks} ticks in {wall:.2f}s "
          f"({B * n_ticks / wall:.0f} ticks/s aggregate, "
          f"{B * n_cycles / wall:.0f} in-loop MPC solves/s; compile "
          f"{t_compile:.0f}s); MPC conv {conv.mean():.4f} "
          f"(rescue cap {rescue}); errors "
          f"{int(err[-1].sum())}/{B}; final height "
          f"mean {h[-1].mean():.4f} min {h[-1].min():.4f}")
    return 0 if not err[-1].any() else 1


def _run_hetero(args, cfg):
    """Heterogeneous closed-loop fleet (sim/fleet.make_hetero_fleet)."""
    import jax
    import numpy as np

    from qrw_tpu.sim import fleet as fl

    on_cpu = all(d.platform == "cpu" for d in jax.devices())
    tile = 1 if on_cpu else 128
    B = max(args.hetero, 3 * tile)
    B = (B // tile) * tile
    cal = (None if on_cpu else
           {"bounding": fl.hetero_shakedown_capture(cfg, "bounding")})
    ctl, carry, ps, terrain, meta = fl.make_hetero_fleet(
        cfg, B, tile=tile, seed=args.seed, calibration=cal)
    n_cycles = max(1, cfg.N_SIMULATION // cfg.k_mpc)
    rescue = args.rescue if args.rescue is not None else max(4, B // 32)
    sched = fl.hetero_v_ref_schedule(cfg, meta.velID,
                                     n_cycles * cfg.k_mpc)
    run = jax.jit(lambda c, s: fl.fleet_rollout(
        ctl, c, n_cycles, ps, tile=tile, rescue_cap=rescue,
        terrain=terrain, phase_offsets=meta.phase_offsets,
        phase_periods=meta.phase_periods, perfect_estimator=False,
        v_ref_schedule=s, with_logs=False, use_ref=on_cpu,
        interpret=on_cpu))
    t0 = time.perf_counter()
    c2, _, cyc = run(carry, sched)
    jax.block_until_ready(c2)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    c2, _, cyc = run(carry, sched)      # timed repeat from the init
    jax.block_until_ready(c2)
    wall = time.perf_counter() - t0
    n_ticks = n_cycles * cfg.k_mpc
    z = np.asarray(c2.sim_states.q[:, 2])
    up = z > 0.15
    conv = float(np.asarray(cyc.converged).mean())
    scen_gait = np.repeat(meta.tile_gait, tile)
    per_gait = " ".join(
        f"{meta.gait_names[g]} {up[scen_gait == g].mean():.2f}"
        for g in range(len(meta.gait_names)))
    per_ter = " ".join(
        f"{n} {up[meta.tid == t].mean():.2f}"
        for t, n in enumerate(["flat", "bumpy", "stairs"]))
    print(f"hetero fleet: {B} scenarios x {n_ticks} ticks in "
          f"{wall:.2f}s ({B * n_ticks / wall:.0f} ticks/s; compile "
          f"{t_compile:.0f}s); MPC conv {conv:.4f}; upright "
          f"{up.mean():.3f} [{per_gait} | {per_ter}]")


def _run_fleet_mpc(args, cfg):
    """Fleet MPC service demo (the bench.py phase-mode workload behind a
    user-facing entry point): B scenarios phase-sorted over the trot's
    16 gait offsets, warm-cycled on ops/qp_phase."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qrw_tpu.core import mpc_lane as ml

    B = args.fleet_mpc
    P = cfg.n_steps
    on_cpu = all(d.platform == "cpu" for d in jax.devices())
    tile = 4 if on_cpu else 512     # bench.py tile sweep: 512 optimal
    per = max(tile, (B // (P * tile)) * tile)
    phase_ids = list(range(P)) if B >= P * tile else [0, P // 2]
    B = per * len(phase_ids)
    rng = np.random.default_rng(args.seed)
    phase_fs = ml.trot_phase_fsteps(cfg)
    xr = np.zeros((12, cfg.n_steps + 1, B), np.float32)
    xr[2] = cfg.h_ref
    xr[:, 0, :] += rng.normal(scale=0.01, size=(12, B))
    xr[6, 1:, :] = rng.uniform(0, 1.0, size=B)
    fs = np.zeros((cfg.N_gait, 12, B), np.float32)
    for i, p_id in enumerate(phase_ids):
        fs[:, :, i * per:(i + 1) * per] = phase_fs[p_id][:, :, None]
    phases_of = np.repeat(phase_ids, per // tile)
    ps = ml.build_phase_data(cfg, phase_fs)
    xrj, fsj = jnp.asarray(xr), jnp.asarray(fs)

    solve = jax.jit(lambda x, f, st: ml.solve_mpc_batch_phase(
        cfg, x, f, ps, phases_of, state=st, n_iters=300, tile=tile,
        interpret=on_cpu))
    _, st, sol = jax.jit(lambda x, f: ml.solve_mpc_batch_phase(
        cfg, x, f, ps, phases_of, n_iters=300, tile=tile,
        interpret=on_cpu))(xrj, fsj)
    float(jnp.sum(sol.pri_res))
    t0 = time.perf_counter()
    convs = []
    for c in range(args.fleet_cycles):
        xrj = xrj.at[:, 0, :].add(0.001)
        _, st, sol = solve(xrj, fsj, st)
        convs.append(float(jnp.mean(sol.converged.astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / args.fleet_cycles
    print(f"fleet MPC service: {B} scenarios/cycle, "
          f"{B / dt:.0f} solves/s, conv {np.mean(convs):.4f} "
          f"({'CPU interpret' if on_cpu else 'TPU'}; per-dispatch "
          f"timing — see bench.py for the scanned steady-state number)")
    return 0


def _run_host_loop(args, cfg, dtype):
    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    from qrw_tpu.runtime.host_loop import run_host_loop
    from qrw_tpu.sim.device import SimDevice

    clone = None
    if args.clone:
        clone = SimDevice(cfg, dtype=dtype)
        clone.Init(q_init=cfg.q_init)
    gamepad = None
    if args.gamepad:
        from qrw_tpu.runtime.gamepad import GamepadReader
        gamepad = GamepadReader()
    try:
        res = run_host_loop(cfg, n_ticks=cfg.N_SIMULATION, clone=clone,
                            gamepad=gamepad, realtime=args.realtime,
                            shutdown=True, gait=args.gait, dtype=dtype)
    finally:
        if gamepad is not None:
            gamepad.stop()
    print(f"host loop: {res.n_ticks} ticks, startup_abort="
          f"{res.startup_abort}, error={res.error}, timeout={res.timeout}")
    if res.n_ticks:
        bp = res.q_log[-1]
        print(f"final pos [{bp[0]:.3f} {bp[1]:.3f} {bp[2]:.3f}], "
              f"max |tau_ff| {np.abs(res.tau_log).max():.2f}")
    return 0 if not (res.startup_abort or res.error or res.timeout) else 1


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from qrw_tpu.config import load_config
    from qrw_tpu.sim.rollout import make_rollout, rollout

    overrides = {}
    if args.velID is not None:
        overrides["velID"] = args.velID
    if args.ticks is not None:
        overrides["N_SIMULATION"] = args.ticks
    if args.kf:
        overrides["kf_enabled"] = True
    if args.ddp:
        overrides["type_MPC"] = False
    if args.envID is not None:
        overrides["envID"] = args.envID
    if args.bumpy:
        overrides["use_flat_plane"] = False
    cfg = load_config(args.config, **overrides)
    dtype = jnp.float64 if args.f64 else jnp.float32
    n_ticks = cfg.N_SIMULATION

    if args.fleet_mpc:
        return _run_fleet_mpc(args, cfg)
    if args.fleet:
        return _run_fleet(args, cfg, dtype)
    if args.hetero:
        return _run_hetero(args, cfg)

    if args.host_loop:
        return _run_host_loop(args, cfg, dtype)
    if args.sweep:
        from qrw_tpu.eval.speed_sweep import plot_envelope, run_sweep
        mesh = None
        if args.mesh:
            from qrw_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
        res = run_sweep(cfg, n_ticks=n_ticks, dtype=dtype, mesh=mesh)
        print(f"sweep: {int(res.success.sum())}/{res.success.size} cells "
              f"succeeded; max vx err {res.vx_err.max():.3f} m/s")
        if args.plot is not None:
            plot_envelope(res, show=False,
                          save_path=args.plot + "_envelope.png")
            print(f"envelope saved as {args.plot}_envelope.png")
        return 0
    if args.estimator_demo:
        from qrw_tpu.eval.estimator_eval import run_demo
        m = run_demo(cfg, n_ticks=n_ticks, kf=args.kf, dtype=dtype)
        print("estimator metrics:",
              {k: round(v, 5) for k, v in m.items()})
        return 0

    from qrw_tpu.sim.faults import default_perturbations
    from qrw_tpu.sim.terrain import make_terrain
    terrain = make_terrain(cfg, dtype)
    f_ext = jnp.asarray(default_perturbations(cfg, n_ticks), dtype)
    ctl, carry = make_rollout(cfg, dtype=dtype, gait=args.gait,
                              terrain=terrain)
    print(f"backend={jax.default_backend()} devices={len(jax.devices())} "
          f"ticks={n_ticks} velID={cfg.velID} gait={args.gait} "
          f"batch={args.batch or 1}")

    if args.batch:
        B = args.batch
        rng = np.random.default_rng(args.seed)
        carry = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), carry)
        # perturb initial joint configurations per scenario
        dq = jnp.asarray(rng.normal(scale=0.01, size=(B, 12)), dtype)
        sim = carry.sim_state
        carry = carry._replace(
            sim_state=sim._replace(q=sim.q.at[:, 7:].add(dq)))

        def run1(c):
            return rollout(ctl, c, n_ticks, f_ext_schedule=f_ext,
                           terrain=terrain,
                           perfect_estimator=args.perfect)

        if args.mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from qrw_tpu.parallel.mesh import make_mesh, sharded_vmap
            mesh = make_mesh()
            run = jax.jit(sharded_vmap(run1, mesh))
            carry = jax.device_put(carry, NamedSharding(mesh, P("dp")))
        else:
            run = jax.jit(jax.vmap(run1))
    else:
        run = jax.jit(lambda c: rollout(ctl, c, n_ticks,
                                        f_ext_schedule=f_ext,
                                        terrain=terrain,
                                        perfect_estimator=args.perfect))

    t0 = time.perf_counter()
    out_carry, logs = run(carry)
    jax.block_until_ready(out_carry)
    wall = time.perf_counter() - t0
    n_runs = args.batch or 1
    sim_s = n_ticks * cfg.dt_wbc
    print(f"rollout done: {wall:.2f}s wall for {n_runs} x {sim_s:.1f}s sim "
          f"({n_runs * sim_s / wall:.1f}x realtime aggregate)")

    # ---- run summary (the reference prints security status at shutdown,
    # scripts/main_solo12_control.py:244-253) ---------------------------
    bp = np.asarray(logs.base_pos)
    err = np.asarray(logs.error)
    ec = np.asarray(logs.error_code)
    if args.batch:
        n_err = int(err[:, -1].sum())
        print(f"final height mean={bp[:, -1, 2].mean():.4f} "
              f"min={bp[:, -1, 2].min():.4f}; "
              f"errors {n_err}/{n_runs} (codes {np.unique(ec[err > 0]) if n_err else '[]'})")
    else:
        print(f"final pos [{bp[-1, 0]:.3f} {bp[-1, 1]:.3f} {bp[-1, 2]:.3f}]"
              f" error={bool(err[-1])} code={int(ec[-1])}")

    if args.save is not None or args.plot is not None:
        from qrw_tpu.utils import logger as qlog
        one = (jax.tree.map(lambda a: a[0], logs) if args.batch else logs)
        if args.save is not None:
            path = qlog.save_npz(one, args.save or None, cfg)
            print(f"logs saved to {path}")
        if args.plot is not None:
            data = qlog.log_to_dict(one, cfg)
            qlog.plot_all(data, dt=cfg.dt_wbc, show=False,
                          save_prefix=args.plot)
            print(f"figures saved as {args.plot}_fig*.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
