"""Find cap-hitting lanes and dump the pre-tick fleet state for trace_solve.

Runs the production fleet tick-by-tick; at the first tick (after warmup)
where some lane burns >= --thr iterations, dumps the PRE-tick EngineState
batch (trace_solve.py's npz format) and prints the offending lanes with
their shock classification (window crossing / error_count / warm).

Usage: python experiments/dump_stragglers.py [--B 256] [--ticks 40]
       [--thr 40] [--out /tmp/fleet_state.npz]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=40)
    ap.add_argument("--thr", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--out", default="/tmp/fleet_state.npz")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from boundmpc_tpu import batch, ocp, solver as solver_mod
    from boundmpc_tpu.path import advance_sector, window
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    B = args.B

    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                     donate=False)

    dumped = False
    for t in range(args.ticks):
        prev = jax.tree.map(lambda a: np.asarray(a), states)
        states, out = tick_b(states, paths, weights, x_phi_d, pref)
        it = np.asarray(out.stats.iters)
        viol = np.asarray(out.stats.viol)
        succ = np.asarray(out.success)
        mx = int(it.max())
        bad = np.nonzero(it >= args.thr)[0]
        print(f"tick {t}: max_iters {mx}  lanes>= {args.thr}: {len(bad)}  "
              f"succ {succ.sum()}/{B}")
        if t >= args.warmup and len(bad) and not dumped:
            leaves = jax.tree.leaves(jax.tree.map(lambda a: a, prev))
            np.savez_compressed(args.out,
                                **{f"s{i}": np.asarray(l)
                                   for i, l in enumerate(leaves)})
            print(f"dumped pre-tick state -> {args.out}")
            for lane in bad[:12]:
                sec_prev = prev.sector[lane]
                phi = prev.phi[lane]
                ec = prev.error_count[lane]
                # would this tick slide the window?
                sec_new = int(np.asarray(advance_sector(
                    jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[lane]), paths),
                    jnp.asarray(sec_prev), jnp.asarray(phi))))
                print(f"  lane {lane}: iters {it[lane]}  viol {viol[lane]:.2e}"
                      f"  succ {succ[lane]}  phi {phi:.3f}  sector {sec_prev}"
                      f"->{sec_new}  error_count {ec}"
                      f"  dead {prev.dead[lane]}  has_prev {prev.has_prev[lane]}")
            dumped = True
    if not dumped:
        print("no lane hit the threshold after warmup")


if __name__ == "__main__":
    main()
