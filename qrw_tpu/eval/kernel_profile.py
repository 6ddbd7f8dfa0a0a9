"""Warm-cycle time decomposition + tile sweep for the Pallas MPC kernel.

BASELINE.md asks for a speed-of-light analysis of the QP kernel; bench.py
reports the model-based roofline. This tool measures where the warm-cycle
wall time actually goes on hardware, by differencing configurations:

  * schedule=[1] vs schedule=[50]: the pure in-kernel iteration cost
    (49 extra ADMM iterations) vs the fixed per-cycle overhead
    (QP build + refactorization + residual/termination glue);
  * refactor "chol" vs "ns" vs "stale": the refactorization share;
  * tile sweep: MXU row utilization of the in-kernel A-matmuls.

Run on the TPU:  python -m qrw_tpu.eval.kernel_profile [--batch 4096]
Prints one JSON dict of {config: seconds-per-cycle | solves/s}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiles", type=int, nargs="*", default=[16, 32])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import os
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from qrw_tpu.config import Config
    from qrw_tpu.core import mpc as mpc_mod
    from qrw_tpu.ops import qp
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import bench

    cfg = Config()
    interpret = bool(args.cpu)
    rng = np.random.default_rng(0)
    x_np, f_np = bench.build_batch(cfg, args.batch, rng)
    xs, fs = jnp.asarray(x_np), jnp.asarray(f_np)
    ST = qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=450,
                       adaptive_rho_interval=200)
    sync = lambda sol: float(jnp.sum(sol.iters).astype(jnp.float32))

    results = {}

    def clock(fn, *a):
        _, st2, sol = fn(*a)
        sync(sol)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            _, st2, sol = fn(*a)
            sync(sol)
        dt = (time.perf_counter() - t0) / args.reps
        return dt, float(jnp.mean(sol.converged.astype(jnp.float32)))

    for tile in args.tiles:
        cold = jax.jit(lambda x, f, t=tile: mpc_mod.solve_mpc_batch_pallas(
            cfg, x, f, settings=ST, tile=t, interpret=interpret))
        t0 = time.perf_counter()
        _, st, sol = cold(xs, fs)
        sync(sol)
        t_compile = time.perf_counter() - t0
        for policy, iters in (("ns", 50), ("ns", 1), ("chol", 50),
                              ("stale", 50)):
            warm = jax.jit(
                lambda x, f, s, t=tile, p=policy, it=iters:
                mpc_mod.solve_mpc_batch_pallas(
                    cfg, x, f, state=s, settings=ST, refactor=p,
                    schedule=[it], tile=t, interpret=interpret))
            dt, conv = clock(warm, xs, fs, st)
            key = f"tile{tile}_{policy}_{iters}it"
            results[key] = {
                "s_per_cycle": round(dt, 5),
                "solves_per_s": round(args.batch / dt, 1),
                "conv": round(conv, 4),
            }
            print(f"{key}: {dt * 1e3:.1f} ms/cycle = "
                  f"{args.batch / dt:.0f} solves/s (conv {conv:.3f})",
                  file=sys.stderr)
        results[f"tile{tile}_compile_s"] = round(t_compile, 1)

    # decomposition from the tile entries: kernel-iteration share vs
    # fixed overhead (build + factor + glue)
    for tile in args.tiles:
        a = results.get(f"tile{tile}_ns_50it")
        b = results.get(f"tile{tile}_ns_1it")
        if a and b:
            per_iter = (a["s_per_cycle"] - b["s_per_cycle"]) / 49.0
            results[f"tile{tile}_per_admm_iter_us"] = round(
                per_iter * 1e6, 2)
            results[f"tile{tile}_fixed_overhead_ms"] = round(
                b["s_per_cycle"] * 1e3, 3)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
