"""Lockstep straggler analysis: the vmap'd while_loop runs until the SLOWEST
lane converges, so the tick cost is set by max(iters) over lanes, not the
mean.  Record per-tick (mean, p50, p90, max) of per-lane iteration counts
and the count of lanes above various thresholds to size a two-phase
(full-batch + compacted-tail) solve.

Usage: python experiments/prof_stragglers.py [--B 256] [--ticks 60]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from boundmpc_tpu import batch, ocp, solver as solver_mod
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    B = args.B

    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                     donate=False)

    all_iters = []
    n_succ = 0
    for t in range(args.ticks):
        states, out = tick_b(states, paths, weights, x_phi_d, pref)
        it = np.asarray(out.stats.iters)
        all_iters.append(it)
        n_succ += int(np.asarray(out.success).sum())
        if t >= 3:  # skip cold ticks in the summary
            pass
    it = np.stack(all_iters)  # (ticks, B)
    warm = it[3:]
    print(f"B={B} ticks={args.ticks} success={n_succ}/{B*args.ticks}")
    print(f"per-lane mean iters: {warm.mean():.1f}")
    mx = warm.max(axis=1)
    print(f"per-tick max iters: mean {mx.mean():.1f}  p50 {np.percentile(mx,50):.0f}  p90 {np.percentile(mx,90):.0f}  max {mx.max()}")
    for thr in (8, 12, 16, 20, 24, 32):
        frac = (warm > thr).mean(axis=1)  # fraction of lanes above thr per tick
        cnt = (warm > thr).sum(axis=1)
        print(f"lanes >{thr:2d} iters: mean {cnt.mean():6.1f}/{B}  p90 {np.percentile(cnt,90):6.1f}  max {cnt.max():4d}")
    # Tick-level histogram of the lockstep trip count
    hist, edges = np.histogram(mx, bins=[0, 4, 8, 12, 16, 20, 24, 28, 32, 36, 41])
    print("lockstep trip-count histogram (ticks):",
          {f"{edges[i]}-{edges[i+1]}": int(hist[i]) for i in range(len(hist))})


if __name__ == "__main__":
    main()
