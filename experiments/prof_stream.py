"""Throughput comparison: lockstep scanned ticks vs the stream executor.

Runs the production fleet (same construction as bench.py / __graft_entry__)
through K ticks with both executors and reports wall time, solves/s,
success, and violation stats.

Usage: python experiments/prof_stream.py [--B 256] [--ticks 40] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--executor", default="both",
                    choices=["both", "scan", "stream"])
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--start-ticks", type=int, default=0,
                    help="advance the fleet this many ticks (stream executor,"
                         " untimed) before measuring — probe deep-path"
                         " regions")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from boundmpc_tpu import batch, ocp, solver as solver_mod, stream
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    if args.max_iters:
        scfg = scfg._replace(max_iters=args.max_iters)
    B, K = args.B, args.ticks

    states0, paths, weights, x_phi_d = _build_batch(B, cfg)
    pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d)
    if args.start_ticks:
        # Advance with the SAME K-sized program the measurement uses (one
        # compile); K=70-sized one-off stream programs have wedged the
        # remote compiler.
        adv = stream.make_stream_ticks(cfg, scfg, K, donate=False)
        for _ in range((args.start_ticks + K - 1) // K):
            states0, _ = adv(states0, paths, weights, x_phi_d, pref)
        jax.block_until_ready(states0.phi)
        print(f"advanced {args.start_ticks} ticks; mean_phi "
              f"{float(states0.phi.mean()):.3f}", flush=True)

    def run(name, fn):
        # fn donates states; rebuild per rep.
        results = []
        for rep in range(args.reps + 1):  # +1 warmup/compile
            states = jax.tree.map(lambda a: jnp.array(a), states0)
            t0 = time.perf_counter()
            st, aux = fn(states, paths, weights, x_phi_d, pref)
            succ, viol, iters = aux[0], aux[1], aux[2]
            n_loop = getattr(aux, "n_loop", None)
            jax.block_until_ready(st.phi)
            dt = time.perf_counter() - t0
            if rep:
                results.append(dt)
        succ = np.asarray(succ)
        viol = np.asarray(viol)
        iters = np.asarray(iters)
        dt = float(np.median(results))
        extra = f"  loop_iters {int(n_loop)}" if n_loop is not None else ""
        print(f"{name:8s}  total {dt*1e3:8.1f} ms  per-tick {dt/K*1e3:6.1f} ms"
              f"  solves/s {B*K/dt:8.1f}  success {succ.mean():.5f}"
              f"  max_viol {viol.max():.2e}  mean_iters {iters.mean():.2f}"
              f"  p99_iters {np.percentile(iters, 99):.0f}" + extra)
        return B * K / dt

    out = {}
    if args.executor in ("both", "scan"):
        scanned = batch.make_scanned_ticks(cfg, scfg, K)
        out["scan"] = run("scan", scanned)
    if args.executor in ("both", "stream"):
        streamed = stream.make_stream_ticks(cfg, scfg, K)
        out["stream"] = run("stream", streamed)
    if len(out) == 2:
        print(f"speedup: {out['stream']/out['scan']:.2f}x")


if __name__ == "__main__":
    main()
