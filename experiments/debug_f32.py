"""Diagnose the RUNTIME_F32 production-path divergence (VERDICT item 1).

Runs the exact bench configuration tick-by-tick and prints per-tick
success-rate / max-violation, plus identifies the first diverging scenario.

Usage:
    JAX_PLATFORMS=cpu python experiments/debug_f32.py [--method pcg] [--B 16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--method", default=None, help="override solver method")
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--mu-warm", type=float, default=None)
    ap.add_argument("--tol-step", type=float, default=None)
    ap.add_argument("--n-ls", type=int, default=None)
    ap.add_argument("--ls-decay", type=float, default=None)
    ap.add_argument("--tol-feas", type=float, default=None)
    ap.add_argument("--tol-merit", type=float, default=None)
    ap.add_argument("--jac", default=None)
    ap.add_argument("--delta", type=float, default=None)
    ap.add_argument("--dump", type=int, default=None,
                    help="save the batched EngineState BEFORE this tick")
    ap.add_argument("--dump-file", default="/tmp/fleet_state.npz")
    ap.add_argument("--platform", default=None, help="cpu to force local CPU")
    ap.add_argument("--subset", default=None,
                    help="comma-separated scenario indices (of the full "
                         "--B batch) to run as their own small batch")
    ap.add_argument("--f64", action="store_true", help="float64 solve")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from boundmpc_tpu import batch, ocp, solver as solver_mod
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    if args.method:
        scfg = scfg._replace(method=args.method)
    if args.max_iters:
        scfg = scfg._replace(max_iters=args.max_iters)
    if args.mu_warm is not None:
        scfg = scfg._replace(mu_warm=args.mu_warm)
    if args.tol_step is not None:
        scfg = scfg._replace(tol_step=args.tol_step)
    if args.n_ls is not None:
        scfg = scfg._replace(n_ls=args.n_ls)
    if args.ls_decay is not None:
        scfg = scfg._replace(ls_decay=args.ls_decay)
    if args.tol_feas is not None:
        scfg = scfg._replace(tol_feas=args.tol_feas)
    if args.tol_merit is not None:
        scfg = scfg._replace(tol_merit=args.tol_merit)
    if args.jac is not None:
        scfg = scfg._replace(jac=args.jac)
    if args.delta is not None:
        scfg = scfg._replace(delta=args.delta)
    print(f"platform={jax.devices()[0].platform} scfg={scfg}", flush=True)

    import jax.numpy as _j
    dtype = _j.float64 if args.f64 else _j.float32
    B = args.B
    states, paths, weights, x_phi_d = _build_batch(B, cfg, dtype=dtype)
    if args.subset:
        idx = jnp.asarray([int(s) for s in args.subset.split(",")])
        take = lambda tree: jax.tree.map(lambda a: a[idx], tree)
        states, paths = take(states), take(paths)
        weights, x_phi_d = weights[idx], x_phi_d[idx]
        B = len(idx)
        print(f"subset of {args.B}: {[int(i) for i in idx]}")
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=dtype, donate=False)
    pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d,
                                      dtype=dtype)

    import time
    first_bad = None
    for t in range(args.ticks):
        if args.dump is not None and t == args.dump:
            flat = {f"s{i}": np.asarray(l)
                    for i, l in enumerate(jax.tree.leaves(states))}
            np.savez_compressed(args.dump_file, **flat)
            print(f"dumped pre-tick-{t} state -> {args.dump_file}", flush=True)
        t0 = time.perf_counter()
        states, out = tick_b(states, paths, weights, x_phi_d, pref)
        jax.block_until_ready(states.phi)
        wall = time.perf_counter() - t0
        succ = np.asarray(out.success)
        viol = np.asarray(out.stats.viol)
        iters = np.asarray(out.stats.iters)
        conv = np.asarray(out.stats.converged)
        phi = np.asarray(states.phi)
        print(f"tick {t:3d}: success {succ.mean():.3f}  max_viol {viol.max():.3e}"
              f"  med_iters {np.median(iters):.0f}  max_iters {iters.max():d}"
              f"  conv {conv.mean():.2f}"
              f"  mean_phi {phi.mean():.3f}  {wall*1e3:6.1f}ms", flush=True)
        if not succ.all():
            bad = np.where(~succ)[0]
            print(f"  failures: {bad[:10]}  viols {viol[bad[:10]]}", flush=True)
            if first_bad is None:
                first_bad = (t, bad)


if __name__ == "__main__":
    main()
