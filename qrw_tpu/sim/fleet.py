"""Lane-major closed-loop fleet rollout: B scenarios, ONE batched MPC.

This is the production fleet architecture: in the reference, the one
real MPC implementation is what the controller calls every cycle
(scripts/MPC_Wrapper.py:73,140-148); at fleet scale the TPU-native
equivalent is the lane-major phase-grouped solver (core/mpc_lane +
ops/qp_phase) solving ALL scenarios' MPC problems in one kernel
dispatch per 50 Hz cycle, while the per-scenario pipeline (estimator,
planners, WBC, in-graph physics) runs under vmap. The per-problem
solver of core/mpc.py never appears in this graph — the throughput
path IS the loop path.

Execution pattern per MPC cycle (k_mpc = 10 ticks):
  tick k0:   vmap(compute_pre)  -> (xref, fsteps) per scenario
             lane-major transpose -> solve_mpc_batch_phase (shift=True,
             warm carry, per-tile phases rotated in-graph p -> p-1 as
             the gait rolls — core/mpc_lane.shift_lane_state)
             vmap(compute_post) consuming the fresh plan
  ticks +1..+9: vmap(compute_pre) -> vmap(compute_post) with the held
             plan (the dual-rate cadence, scripts/Controller.py:246-250)

Failed lanes follow the layered fallback of core/mpc_lane: optional
capacity-bounded rescue through the per-problem support-reduced path,
then the stale-plan fallback with a cold-restart carry (the reference's
async staleness contract, scripts/MPC_Wrapper.py:111-126).

Scope: all scenarios in a kernel tile must share the gait phase, and
the phase set must be a cyclic per-gait class set (one class per gait
offset) so the roll maps phase p to (p-1) mod P each cycle. A scenario
whose support leaves the set (e.g. mid gait switch) is caught by the
support guard and served by rescue/stale fallback until it re-enters.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qrw_tpu.config import Config
from qrw_tpu.core import mpc_lane as ml
from qrw_tpu.core.controller import (Controller, ControllerState,
                                     compute_post, compute_pre,
                                     init_state, make_controller)
from qrw_tpu.core.estimator import DeviceData
from qrw_tpu.core.joystick import v_ref_profile
from qrw_tpu.sim.physics import SimState, init_sim_state


class FleetCarry(NamedTuple):
    """Resumable fleet state: batched per-scenario pytrees + the shared
    lane-major MPC warm carry + the per-tile phase pointer."""
    ctl_states: ControllerState     # (B, ...) batched pytree
    sim_states: SimState            # (B, ...)
    devices: DeviceData             # (B, ...)
    lane_state: ml.MPCLaneState     # lane-major warm carry (..., B)
    tile_phase: jnp.ndarray         # (B // tile,) int32 phase per tile
    cycle: jnp.ndarray              # () int32 cycles completed


class FleetLog(NamedTuple):
    """Per-tick fleet signals (shapes (T, B, ...))."""
    base_pos: jnp.ndarray           # (T, B, 3)
    base_quat: jnp.ndarray          # (T, B, 4)
    f_mpc: jnp.ndarray              # (T, B, 12) first-step plan consumed
    tau_ff: jnp.ndarray             # (T, B, 12)
    error: jnp.ndarray              # (T, B)


class FleetCycleLog(NamedTuple):
    """Per-MPC-cycle solver health (shapes (C, ...))."""
    converged: jnp.ndarray          # (C, B)
    iters: jnp.ndarray              # (C, B)
    phase: jnp.ndarray              # (C, B // tile)


def _device_from_sim(ss: SimState) -> DeviceData:
    return DeviceData(
        base_lin_acc=jnp.zeros(3, ss.q.dtype),
        base_ang_vel=ss.v[3:6],
        base_quat=ss.q[3:7],
        q_mes=ss.q[7:],
        v_mes=ss.v[6:],
        dummy_pos=ss.q[0:3],
        b_base_vel=ss.v[0:3],
    )


def make_fleet(cfg: Config, batch: int, ps: ml.PhaseStructure,
               tile: int = 128, seed: int = 0, dtype=jnp.float32,
               perturb_q: float = 0.01, perturb_v: float = 0.02,
               gait: str = "trot") -> Tuple[Controller, FleetCarry]:
    """(controller, initial fleet carry): B scenarios from the standard
    init with per-scenario joint-angle / base-velocity perturbations
    (the scenario diversity of a batched study). All scenarios start at
    the same gait offset; the shared initial phase is matched against
    `ps` by probing the tick-0 footstep support. `ps` must be the
    cyclic phase set of `gait` (ml.gait_phase_fsteps)."""
    assert batch % tile == 0, "batch must be a multiple of the tile"
    ctl = make_controller(cfg)
    cs0 = init_state(ctl, dtype, gait=gait)
    ss0 = init_sim_state(cfg, dtype=dtype)
    tile_b = lambda a: jnp.broadcast_to(a, (batch,) + a.shape)
    cs_b = jax.tree.map(tile_b, cs0)
    ss_b = jax.tree.map(tile_b, ss0)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    ss_b = ss_b._replace(
        q=ss_b.q.at[:, 7:].add(
            perturb_q * jax.random.normal(k1, (batch, 12), dtype)),
        v=ss_b.v.at[:, 0:3].add(
            perturb_v * jax.random.normal(k2, (batch, 3), dtype)))
    dev_b = jax.vmap(_device_from_sim)(ss_b)

    # probe the tick-0 stance support (gait-determined; v_ref-independent)
    pre0 = jax.jit(lambda s, d: jax.vmap(
        lambda ss, dd: compute_pre(ctl, ss, dd, 0))(s, d))(cs_b, dev_b)
    sup = (np.asarray(pre0.fsteps[0])[:cfg.n_steps, 0::3] != 0)
    sup = sup.reshape(-1)
    m = np.where((ps.supports == sup).all(axis=1))[0]
    assert m.size, "initial gait support not in the phase set"
    tile_phase = jnp.full((batch // tile,), int(m[0]), jnp.int32)

    carry = FleetCarry(
        ctl_states=cs_b, sim_states=ss_b, devices=dev_b,
        lane_state=ml.init_lane_state(cfg, batch),
        tile_phase=tile_phase, cycle=jnp.zeros((), jnp.int32))
    return ctl, carry


def fleet_rollout(ctl: Controller, carry: FleetCarry, n_cycles: int,
                  ps: ml.PhaseStructure, tile: int = 128,
                  n_iters: int = 300, rescue_cap: int = 0,
                  v_ref_schedule=None, f_ext_schedule=None,
                  perfect_estimator: bool = True,
                  use_ref: bool = False, interpret: bool = False,
                  with_logs: bool = True, stop_at_eps: bool = True,
                  terrain=None, phase_offsets=None, phase_periods=None
                  ) -> Tuple[FleetCarry, Optional[FleetLog],
                             FleetCycleLog]:
    """Run `n_cycles` MPC cycles (n_cycles * k_mpc ticks) of the fleet.

    v_ref_schedule: optional (n_ticks, 6) shared or (n_ticks, B, 6)
    per-scenario commands (default: the cfg.velID profile).
    f_ext_schedule: optional (n_ticks, B, 3) world-frame base forces.
    use_ref=True runs the pure-XLA solver path (tile must be 1).
    stop_at_eps=True (default) lets each kernel tile exit at the OSQP
    termination test instead of running all n_iters — the reference's
    own solve-to-tolerance semantics (src/MPC.cpp:527-540), and ~15%
    fleet throughput.
    terrain: optional sim.terrain.Terrain (shared) or FleetTerrain
    (per-scenario) height field for the lane physics.
    phase_offsets / phase_periods: optional (B // tile,) int32 arrays
    for HETEROGENEOUS fleets whose union phase set concatenates several
    gaits' cyclic classes: tile t's phase rotates within
    [offset_t, offset_t + period_t) as offset + (p - offset - 1) % period
    (make_hetero_fleet builds them). Default: one cyclic set of size P.
    Returns (carry, FleetLog | None, FleetCycleLog); resumable — call
    again with the returned carry to continue (the straggler-injection
    test drives one crippled cycle in between)."""
    cfg = ctl.cfg
    k_mpc = cfg.k_mpc
    B = carry.lane_state.f.shape[-1]
    n_ticks = n_cycles * k_mpc
    P = int(np.asarray(ps.data.Kbar_inv).shape[0])
    dtype = carry.sim_states.q.dtype

    if v_ref_schedule is not None:
        v_ref_schedule = jnp.asarray(v_ref_schedule, dtype)
        if v_ref_schedule.ndim == 2:
            v_ref_schedule = jnp.broadcast_to(
                v_ref_schedule[:, None, :], (n_ticks, B, 6))
        v_cyc = v_ref_schedule.reshape(n_cycles, k_mpc, B, 6)
    else:
        v_cyc = None
    if f_ext_schedule is not None:
        f_cyc = jnp.asarray(f_ext_schedule, dtype).reshape(
            n_cycles, k_mpc, B, 3)
    else:
        f_cyc = jnp.zeros((n_cycles, k_mpc, B, 3), dtype)

    def vref_at(k, v_slice):
        if v_slice is None:
            return jnp.broadcast_to(
                v_ref_profile(k, cfg.velID, dtype)[None, :], (B, 6))
        return v_slice

    vmap_pre_fk = jax.vmap(
        lambda s, d, v, k, fk: compute_pre(ctl, s, d, k, v, 0,
                                           perfect_estimator, est_fk=fk),
        in_axes=(0, 0, 0, None, 0))

    def vmap_pre(cs2, dev2, vr2, k2):
        """compute_pre for the fleet with the estimator FK hoisted into
        one lane-major dispatch (ops/rbd_lane) shared by all scenarios."""
        import qrw_tpu.ops.rbd_lane as rl
        qm = jnp.transpose(dev2.q_mes.reshape(B, 4, 3), (1, 2, 0))
        vm = jnp.transpose(dev2.v_mes.reshape(B, 4, 3), (1, 2, 0))
        kin = rl.frame_kinematics(lane_model, rl.ZV3, rl.EYE3, qm,
                                  None, vm)
        pos = jnp.stack([jnp.transpose(p) for p in kin.pos], axis=2)
        vel = jnp.stack([jnp.transpose(p) for p in kin.vel], axis=2)
        return vmap_pre_fk(cs2, dev2, vr2, k2, (pos, vel))
    # post: batch-major glue under vmap, ONE lane-major WBC dispatch
    # for the whole fleet between (core/wbc_lane)
    from qrw_tpu.core.controller import wbc_inputs
    from qrw_tpu.core.wbc_lane import compute_wbc_lane
    vmap_wbc_in = jax.vmap(
        lambda s, p, xf: wbc_inputs(ctl, s, p, xf))
    vmap_finalize = jax.vmap(
        lambda s, p, xf, k, wr: compute_post(
            ctl, s, p, k, xf, xf, s.mpc, s.planner_target, wbc_res=wr),
        in_axes=(0, 0, 0, None, 0))

    def vmap_post(cs2, pre2, x_f_b2, k2):
        inp = vmap_wbc_in(cs2, pre2, x_f_b2)
        wbc_b = compute_wbc_lane(
            cfg, lane_model, cs2.wbc, inp.qj, inp.b_v, inp.f_cmd,
            inp.contacts, inp.feet_p_cmd, inp.feet_v_cmd,
            inp.feet_a_cmd)
        return vmap_finalize(cs2, pre2, x_f_b2, k2, wbc_b)
    # lane-major physics: one batch-on-lanes dispatch for the whole
    # fleet (sim/physics_lane) instead of vmap-of-small-ops
    from qrw_tpu.ops.rbd_lane import solo12_lane
    from qrw_tpu.sim.physics_lane import step_lane
    lane_model = solo12_lane()
    vmap_sim = (
        lambda ss, r, fe: step_lane(cfg, lane_model, ss, r.P, r.D,
                                    r.q_des, r.v_des, r.tau_ff,
                                    f_ext=fe, terrain=terrain))

    def held_tick(cs, ss, dev, k, vr, fe):
        """One tick consuming the held plan (no MPC solve)."""
        pre = vmap_pre(cs, dev, vr, k)
        cs, res = vmap_post(cs, pre, cs.x_f_mpc, k)
        ss, dev = vmap_sim(ss, res, fe)
        log = FleetLog(base_pos=ss.q[:, 0:3], base_quat=ss.q[:, 3:7],
                       f_mpc=cs.x_f_mpc[:, 12:, 0], tau_ff=res.tau_ff,
                       error=cs.error) if with_logs else None
        return cs, ss, dev, log

    def cycle_body(c, inputs):
        cs, ss, dev, lane_st, phases = (
            c.ctl_states, c.sim_states, c.devices, c.lane_state,
            c.tile_phase)
        cyc_i, v_slice, fe_slice = inputs
        k0 = (c.cycle + cyc_i) * k_mpc

        # ---- solve tick: ONE batched MPC for the whole fleet ----------
        vr0 = vref_at(k0, None if v_slice is None else v_slice[0])
        pre = vmap_pre(cs, dev, vr0, k0)
        xr_l = pre.xref.astype(jnp.float32).transpose(1, 2, 0)
        fs_l = pre.fsteps.astype(jnp.float32).transpose(1, 2, 0)
        x_f_l, lane_st, sol = ml.solve_mpc_batch_phase(
            cfg, xr_l, fs_l, ps, phases, state=lane_st, shift=True,
            n_iters=n_iters, tile=tile, interpret=interpret,
            use_ref=use_ref, rescue_cap=rescue_cap,
            stop_at_eps=stop_at_eps)
        x_f_b = x_f_l.transpose(2, 0, 1).astype(dtype)   # (B, 24, N)
        cs, res = vmap_post(cs, pre, x_f_b, k0)
        ss, dev = vmap_sim(ss, res, fe_slice[0])
        log0 = FleetLog(base_pos=ss.q[:, 0:3], base_quat=ss.q[:, 3:7],
                        f_mpc=x_f_b[:, 12:, 0], tau_ff=res.tau_ff,
                        error=cs.error) if with_logs else None

        # ---- held ticks ----------------------------------------------
        def tick(carry2, inp):
            cs, ss, dev = carry2
            dk, vs, fe = inp
            vr = vref_at(k0 + dk, None if v_slice is None else vs)
            cs, ss, dev, log = held_tick(cs, ss, dev, k0 + dk, vr, fe)
            return (cs, ss, dev), log

        dks = jnp.arange(1, k_mpc)
        v_rest = None if v_slice is None else v_slice[1:]
        (cs, ss, dev), logs_r = lax.scan(tick, (cs, ss, dev),
                                         (dks, v_rest, fe_slice[1:]))

        if phase_offsets is None:
            next_phase = (phases - 1) % P
        else:
            offs = jnp.asarray(phase_offsets, jnp.int32)
            pers = jnp.asarray(phase_periods, jnp.int32)
            next_phase = offs + (phases - offs - 1) % pers
        new_c = FleetCarry(ctl_states=cs, sim_states=ss, devices=dev,
                           lane_state=lane_st,
                           tile_phase=next_phase, cycle=c.cycle)
        logs = (jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0),
            log0, logs_r) if with_logs else None)
        cyc_log = FleetCycleLog(converged=sol.converged, iters=sol.iters,
                                phase=phases)
        return new_c, (logs, cyc_log)

    def scan_body(c, inputs):
        return cycle_body(c, inputs)

    cyc_is = jnp.arange(n_cycles, dtype=jnp.int32)
    carry2, (logs, cyc_logs) = lax.scan(
        scan_body, carry,
        (cyc_is, v_cyc, f_cyc) if v_cyc is not None
        else (cyc_is, None, f_cyc))
    carry2 = carry2._replace(cycle=carry.cycle + n_cycles)
    if with_logs:
        logs = jax.tree.map(
            lambda a: a.reshape((n_ticks,) + a.shape[2:]), logs)
    return carry2, logs, cyc_logs


# ----------------------------------------------------------------------
# Heterogeneous fleet: gaits x velocity profiles x terrain
# ----------------------------------------------------------------------

class HeteroMeta(NamedTuple):
    """Static description of a heterogeneous fleet (make_hetero_fleet):
    the BASELINE mixed-scenario sweep — scenarios spread over gaits
    (per kernel tile: tiles are phase-homogeneous), predefined velocity
    profiles, and terrains (flat / bumpy / stairs, the reference's
    use_flat_plane=False and envID=1 worlds,
    scripts/PyBulletSimulator.py:36-175)."""
    gait_names: tuple          # gait per tile-gait index
    tile_gait: np.ndarray      # (n_tiles,) index into gait_names
    velID: np.ndarray          # (B,) predefined-profile id per scenario
    tid: np.ndarray            # (B,) terrain id (0 flat/1 bumpy/2 stairs)
    phase_offsets: np.ndarray  # (n_tiles,) union-set offset per tile
    phase_periods: np.ndarray  # (n_tiles,) cyclic period per tile


def make_hetero_fleet(cfg: Config, batch: int, tile: int = 128,
                      gaits=("trot", "walk", "bounding"),
                      velIDs=(0, 1, 2, 3, 4, 5, 6),
                      terrain_ids=(0, 1, 2), seed: int = 0,
                      dtype=jnp.float32, perturb_q: float = 0.01,
                      perturb_v: float = 0.02, calibration=None):
    """Build a heterogeneous fleet: returns
    (ctl, carry, ps, terrain, meta).

    Gaits are assigned per kernel tile (tiles must share the gait phase;
    the union phase set concatenates each gait's cyclic classes and the
    per-tile rotation stays inside its gait's range). Velocity profiles
    and terrains are assigned per scenario round-robin, so every tile
    mixes velIDs and terrains. Run with:
        fleet_rollout(ctl, carry, C, ps, tile=tile, terrain=terrain,
                      phase_offsets=meta.phase_offsets,
                      phase_periods=meta.phase_periods,
                      perfect_estimator=False,
                      v_ref_schedule=hetero_v_ref_schedule(...))
    (the REAL estimator: its FK-relative base height is what makes the
    h_ref regulation terrain-relative, like the reference's own loop)."""
    from qrw_tpu.core import gait as gait_mod
    from qrw_tpu.sim.terrain import (FleetTerrain, height_at,
                                     make_bumpy, make_stairs)
    assert batch % tile == 0
    n_tiles = batch // tile
    N = cfg.n_steps

    # ---- union phase set with per-gait offsets ------------------------
    # calibration: optional {gait: captured fsteps (C, N_gait, 12)} —
    # re-centers that gait's metric footholds on its operating
    # distribution (ml.calibrate_phase_fsteps; supports unchanged).
    # Bounding's nominal metric converges at only ~0.66 in the mixed
    # sweep; one hetero_shakedown_capture restores ~0.98.
    sets = []
    for g in gaits:
        s = ml.gait_phase_fsteps(cfg, g)
        if calibration and g in calibration:
            s = ml.calibrate_phase_fsteps(cfg, s, calibration[g])
        sets.append(s)
    offs, lens = [], []
    off = 0
    seen = set()
    for s in sets:
        for fs in np.asarray(s):
            key = (fs[:N, 0::3] != 0).tobytes()
            assert key not in seen, \
                "gait phase classes overlap; offsets would be ambiguous"
            seen.add(key)
        offs.append(off)
        lens.append(len(s))
        off += len(s)
    union = np.concatenate([np.asarray(s) for s in sets], axis=0)
    ps = ml.build_phase_data(cfg, union)

    # ---- per-tile gait / per-scenario velID + terrain -----------------
    tile_gait = np.arange(n_tiles) % len(gaits)
    scen_gait = np.repeat(tile_gait, tile)             # (B,)
    velID = np.asarray([velIDs[b % len(velIDs)] for b in range(batch)])
    tid = np.asarray([terrain_ids[(b // len(velIDs)) % len(terrain_ids)]
                      for b in range(batch)])
    phase_offsets = np.asarray([offs[g] for g in tile_gait], np.int32)
    phase_periods = np.asarray([lens[g] for g in tile_gait], np.int32)

    terrain = FleetTerrain(
        tid=jnp.asarray(tid, jnp.int32),
        terrains=(make_bumpy(dtype=dtype), make_stairs(dtype=dtype)))

    # ---- controller states: per-gait init, gathered per scenario ------
    ctl = make_controller(cfg)
    cs_per_gait = [init_state(ctl, dtype, gait=g) for g in gaits]
    gidx = jnp.asarray(scen_gait)
    cs_b = jax.tree.map(
        lambda *xs: jnp.stack(xs)[gidx], *cs_per_gait)

    # ---- sim states: settle each scenario onto ITS terrain ------------
    from qrw_tpu.models.solo12 import make_solo12
    ss0 = init_sim_state(cfg, dtype=dtype)
    ss_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy(), ss0)
    sh = jnp.asarray(make_solo12().shoulders[0:2].T, dtype)   # (4, 2)
    z_off = np.zeros(batch, np.float32)
    for i, t in enumerate(terrain.terrains):
        h = float(jnp.max(height_at(t, sh)))
        z_off[tid == i + 1] = h
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    ss_b = ss_b._replace(
        q=ss_b.q.at[:, 2].add(jnp.asarray(z_off, dtype))
        .at[:, 7:].add(perturb_q * jax.random.normal(k1, (batch, 12),
                                                     dtype)),
        v=ss_b.v.at[:, 0:3].add(
            perturb_v * jax.random.normal(k2, (batch, 3), dtype)))
    dev_b = jax.vmap(_device_from_sim)(ss_b)

    # ---- initial phase per tile -----------------------------------------
    # The controller rolls the gait at k=0 before the planner consumes
    # it (core/gait.update_gait with k % k_mpc == 0), so the tick-0 MPC
    # support is the ROLLED gait matrix's window.
    tile_phase = np.zeros(n_tiles, np.int32)
    for t in range(n_tiles):
        g = tile_gait[t]
        rolled = gait_mod.roll_gait(gait_mod.make_gait(cfg, gaits[g]))
        sup = (np.asarray(rolled.current)[:N] != 0).reshape(-1)
        rng_s = ps.supports[offs[g]:offs[g] + lens[g]]
        m = np.where((rng_s == sup).all(axis=1))[0]
        assert m.size, f"tile {t}: initial {gaits[g]} support not in set"
        tile_phase[t] = offs[g] + int(m[0])

    carry = FleetCarry(
        ctl_states=cs_b, sim_states=ss_b, devices=dev_b,
        lane_state=ml.init_lane_state(cfg, batch),
        tile_phase=jnp.asarray(tile_phase), cycle=jnp.zeros((), jnp.int32))
    meta = HeteroMeta(gait_names=tuple(gaits), tile_gait=tile_gait,
                      velID=velID, tid=tid,
                      phase_offsets=phase_offsets,
                      phase_periods=phase_periods)
    return ctl, carry, ps, terrain, meta


def hetero_v_ref_schedule(cfg: Config, velID: np.ndarray, n_ticks: int,
                          dtype=jnp.float32) -> jnp.ndarray:
    """(n_ticks, B, 6) velocity commands: each scenario follows ITS
    predefined profile (scripts/Joystick.py:160-239)."""
    from qrw_tpu.core.joystick import v_ref_profile
    ks = jnp.arange(n_ticks)
    uniq = sorted(set(int(v) for v in velID))
    tables = {}
    for vid in uniq:
        tables[vid] = jax.vmap(
            lambda k: v_ref_profile(k, vid, dtype))(ks)  # noqa: B023
    stack = jnp.stack([tables[vid] for vid in uniq])     # (U, T, 6)
    lut = {vid: i for i, vid in enumerate(uniq)}
    sel = jnp.asarray([lut[int(v)] for v in velID])      # (B,)
    return jnp.transpose(stack[sel], (1, 0, 2))          # (T, B, 6)


def hetero_shakedown_capture(cfg: Config, gait: str,
                             v_cruise: float = 0.4,
                             n_ticks: int = 1200) -> np.ndarray:
    """(C, N_gait, 12) footstep matrices captured from one single-robot
    shakedown run of `gait` ramping to v_cruise — the calibration input
    for make_hetero_fleet (the production procedure PARITY.md describes
    for off-nominal gaits)."""
    from qrw_tpu.sim.rollout import make_rollout, rollout
    ctl, carry = make_rollout(cfg, gait=gait)
    t = np.arange(n_ticks)
    vx = np.clip((t - 200) / 600.0, 0.0, 1.0) * v_cruise
    sched = np.zeros((n_ticks, 6), np.float32)
    sched[:, 0] = vx
    _, logs = jax.jit(lambda c: rollout(
        ctl, c, n_ticks, v_ref_schedule=jnp.asarray(sched)))(carry)
    return np.asarray(logs.mpc_fsteps)[::cfg.k_mpc]
