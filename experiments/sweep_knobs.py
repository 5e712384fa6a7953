"""Sweep solver knobs over the mixed-scenario fleet and report
success / iteration statistics per combination.

Usage: python experiments/sweep_knobs.py [--B 8] [--ticks 25] [--platform cpu]
       [--set name=value ...]   (overrides applied to every combo)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_combo(cfg, scfg, B, ticks, seed=7):
    import jax
    import jax.numpy as jnp
    from boundmpc_tpu import batch
    from boundmpc_tpu.runtime.fleet import FleetRunner
    from boundmpc_tpu.runtime.scenarios import experiment1, random_scenario

    rng = np.random.default_rng(seed)
    scs = [experiment1()] + [random_scenario(rng) for _ in range(B - 1)]
    f = FleetRunner(scs, solver_cfg=scfg)
    states, paths, weights, x_phi_d, pref = (
        f.states, f.paths, f.weights, f.x_phi_d, f._pref)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                     donate=False)
    succ, iters, viol = [], [], []
    for _ in range(ticks):
        states, out = tick_b(states, paths, weights, x_phi_d, pref)
        succ.append(np.asarray(out.success))
        iters.append(np.asarray(out.stats.iters))
        viol.append(np.asarray(out.stats.viol))
    succ = np.stack(succ); iters = np.stack(iters); viol = np.stack(viol)
    fails = np.argwhere(~succ)
    return dict(success=float(succ.mean()), mean_iters=float(iters.mean()),
                lockstep=float(iters.max(axis=1).mean()),
                max_viol=float(viol.max()),
                fail_ticks=[(int(t), int(l), float(viol[t, l]),
                             int(iters[t, l])) for t, l in fails[:8]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=25)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--combos", default=None,
                    help="semicolon-separated k=v,k=v combo list; default "
                         "bisects carry_reg x tol_feas")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from boundmpc_tpu import ocp, solver as solver_mod
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    cfg = ocp.OcpConfig()
    base = solver_mod.RUNTIME_F32
    if args.combos:
        combos = []
        for part in args.combos.split(";"):
            kv = {}
            for item in part.split(","):
                k, v = item.split("=")
                fld = type(base)._field_defaults[k]
                kv[k] = type(fld)(eval(v)) if not isinstance(fld, str) else v
            combos.append(kv)
    else:
        combos = [
            dict(carry_reg=False, tol_feas=3e-5),  # round-3 behavior
            dict(carry_reg=True, tol_feas=3e-5),
            dict(carry_reg=False, tol_feas=4e-4),
            dict(carry_reg=True, tol_feas=4e-4),  # HEAD
        ]
    for kv in combos:
        scfg = base._replace(**kv)
        r = run_combo(cfg, scfg, args.B, args.ticks, seed=args.seed)
        print({**kv, **r})


if __name__ == "__main__":
    main()
