"""Full-path fleet soak: the deep-region robustness gate.

Runs the production fleet (same construction as bench.py / __graft_entry__)
through the STREAM executor from rest to deep into the path (default 120
ticks at B=256 — the region where round-4's 40-tick bench window never
looked and the fleet collapsed), reporting per-chunk live-lane success /
violation / dead counts on stderr and ONE summary JSON line on stdout.

Pass criteria (VERDICT r4 #1): success over ALL live lane-ticks >= 0.999,
n_dead == 0, max_viol < 1e-3.

The reference bar this encodes: Ipopt + the fallback state machine keeps a
robot alive over the whole path (BoundMPC.py:446-506); a fleet lane dying
mid-path is the analog of the reference returning Nones and halting the
robot (BoundMPC.py:498-506) — an outcome, not an accepted cost.

Usage: python experiments/soak.py [--B 256] [--ticks 120] [--chunk 20]
       [--executor stream|tick] [--max-iters N] [--platform cpu] [--seed 0]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--executor", default="stream",
                    choices=["stream", "tick"])
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--margin", type=float, default=None)
    ap.add_argument("--rho-restore", type=float, default=None)
    ap.add_argument("--no-warm-probe", action="store_true")
    ap.add_argument("--no-exec-compare", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dump-worst", default=None,
                    help="npz path: per-tick viol/success/iters/phi series "
                         "of the worst lanes (postmortem material)")
    ap.add_argument("--dump-state-at", type=int, default=None,
                    help="dump the full EngineState batch at this tick "
                         "(rounded down to a chunk boundary) — replay_lane /"
                         " regression-fixture material")
    ap.add_argument("--dump-state", default="/tmp/soak_state.npz")
    ap.add_argument("--dump-each-chunk", default=None,
                    help="directory: dump the EngineState batch at EVERY "
                         "chunk boundary as state_t{N}.npz (forensics)")
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
    if args.margin is not None:
        scfg = scfg._replace(margin=args.margin)
    if args.rho_restore is not None:
        scfg = scfg._replace(rho_restore=args.rho_restore)
    if args.no_warm_probe:
        scfg = scfg._replace(warm_probe=False)
    if args.no_exec_compare:
        scfg = scfg._replace(exec_compare=False)
    B, K = args.B, args.chunk
    n_chunks = (args.ticks + K - 1) // K

    t0 = time.perf_counter()
    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d)
    if args.executor == "stream":
        run_fn = stream.make_stream_ticks(cfg, scfg, K, donate=False)

        def step_chunk(states):
            states, out = run_fn(states, paths, weights, x_phi_d, pref)
            return states, (out.success, out.viol, out.iters, out.dead,
                            out.phi, int(out.n_loop))
    else:
        tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                         donate=False)

        def step_chunk(states):
            sc, vl, it, dd, ph = [], [], [], [], []
            for _ in range(K):
                states, out = tick_b(states, paths, weights, x_phi_d, pref)
                sc.append(out.success)
                vl.append(out.stats.viol)
                it.append(out.stats.iters)
                dd.append(states.dead)
                ph.append(states.phi)
            stk = lambda xs: jnp.stack(xs, axis=0)
            return states, (stk(sc), stk(vl), stk(it), stk(dd), stk(ph), 0)

    log(f"soak: built B={B} fleet in {time.perf_counter() - t0:.1f}s; "
        f"executor={args.executor} max_iters={scfg.max_iters} "
        f"ticks={n_chunks * K}")

    succ_all, viol_all, iters_all, dead_all, phi_all = [], [], [], [], []
    prev_dead = np.asarray(states.dead)
    n_loop_total = 0
    wall0 = time.perf_counter()
    if args.dump_each_chunk:
        os.makedirs(args.dump_each_chunk, exist_ok=True)

    def dump_states(path_npz):
        leaves = jax.tree.leaves(states)
        np.savez_compressed(path_npz, **{f"s{i}": np.asarray(l)
                                         for i, l in enumerate(leaves)})

    for ci in range(n_chunks):
        if args.dump_state_at is not None and ci * K <= args.dump_state_at \
                < (ci + 1) * K:
            dump_states(args.dump_state)
            log(f"dumped pre-chunk EngineState (tick {ci * K}) -> "
                f"{args.dump_state}")
        if args.dump_each_chunk:
            dump_states(os.path.join(args.dump_each_chunk,
                                     f"state_t{ci * K}.npz"))
        tc = time.perf_counter()
        states, (succ, viol, iters, dead, phi, n_loop) = step_chunk(states)
        jax.block_until_ready(states.phi)
        dt = time.perf_counter() - tc
        succ = np.asarray(succ)
        viol = np.asarray(viol)
        dead = np.asarray(dead)
        # Live mask: lane-ticks through (and including) the death tick count;
        # later ticks of a dead lane are a stopped robot (FleetStats contract).
        live = ~np.concatenate([prev_dead[None, :], dead[:-1]], axis=0)
        prev_dead = dead[-1]
        succ_all.append(succ)
        viol_all.append(viol)
        iters_all.append(np.asarray(iters))
        dead_all.append(dead)
        phi_all.append(np.asarray(phi))
        n_loop_total += n_loop
        sr = float(succ[live].mean()) if live.any() else 1.0
        mv = float(np.where(live, viol, 0.0).max())
        log(f"  ticks {ci * K:3d}-{ci * K + K - 1:3d}: success {sr:.4f}  "
            f"max_viol {mv:.2e}  n_dead {int(dead[-1].sum())}  "
            f"mean_phi {float(states.phi.mean()):.2f}  "
            f"p99_iters {float(np.percentile(iters, 99)):.0f}  "
            f"{dt:.1f}s")
    wall = time.perf_counter() - wall0

    succ_all = np.concatenate(succ_all)  # (ticks, B)
    viol_all = np.concatenate(viol_all)
    iters_all = np.concatenate(iters_all)
    dead_all = np.concatenate(dead_all)
    phi_all = np.concatenate(phi_all)
    dead0 = np.zeros_like(dead_all[0])[None]
    live_all = ~np.concatenate([dead0, dead_all[:-1]], axis=0)
    n_dead = int(dead_all[-1].sum())
    viol_live = np.where(live_all, viol_all, 0.0)
    success_rate = float(succ_all[live_all].mean())
    max_viol = float(viol_live.max())

    # Worst lanes by peak live violation (postmortem material).
    lane_peak = viol_live.max(axis=0)
    worst = np.argsort(-lane_peak)[:8]
    worst_lanes = [
        {"lane": int(ln), "peak_viol": float(lane_peak[ln]),
         "dead": bool(dead_all[-1, ln]),
         "first_fail_tick": int(np.argmax(~succ_all[:, ln]))
         if (~succ_all[:, ln]).any() else -1}
        for ln in worst if lane_peak[ln] > 0
    ]
    if args.dump_worst and worst_lanes:
        lanes = np.array([w["lane"] for w in worst_lanes])
        np.savez_compressed(
            args.dump_worst, lanes=lanes, viol=viol_all[:, lanes],
            success=succ_all[:, lanes], iters=iters_all[:, lanes],
            phi=phi_all[:, lanes])
        log(f"dumped worst-lane series -> {args.dump_worst}")

    # Failure census: what the residual failing lane-ticks look like.
    fail_mask = (~succ_all) & live_all
    fv = viol_all[fail_mask]
    buckets = [0, 1e-4, 1e-3, 1e-2, 1e-1, 1.0, np.inf]
    hist = {f"[{buckets[i]:g},{buckets[i+1]:g})":
            int(((fv >= buckets[i]) & (fv < buckets[i + 1])).sum())
            for i in range(len(buckets) - 1)}
    lanes_failing = int((fail_mask.any(axis=0)).sum())
    # Episodes: maximal runs of consecutive failing ticks per lane.
    n_episodes = int(sum(
        (np.diff(np.concatenate([[False], fail_mask[:, j], [False]])
                 .astype(np.int8)) == 1).sum()
        for j in range(fail_mask.shape[1])))
    log(f"failure census: {int(fail_mask.sum())} failing lane-ticks on "
        f"{lanes_failing} lanes in {n_episodes} episodes; viol hist {hist}")

    passed = (success_rate >= 0.999 and n_dead == 0 and max_viol < 1e-3)
    print(json.dumps({
        "soak": {"B": B, "ticks": int(succ_all.shape[0]),
                 "executor": args.executor, "max_iters": scfg.max_iters,
                 "margin": scfg.margin, "rho_restore": scfg.rho_restore,
                 "warm_probe": scfg.warm_probe,
                 "exec_compare": scfg.exec_compare},
        "success_rate": round(success_rate, 5),
        "max_viol": max_viol,
        "n_dead": n_dead,
        "solves_per_s": round(B * succ_all.shape[0] / wall, 1),
        "mean_iters": round(float(iters_all.mean()), 2),
        "p99_iters": float(np.percentile(iters_all, 99)),
        "mean_phi_final": round(float(phi_all[-1].mean()), 3),
        "worst_lanes": worst_lanes,
        "failure_census": {"lane_ticks": int(fail_mask.sum()),
                           "lanes": lanes_failing,
                           "episodes": n_episodes, "viol_hist": hist},
        "passed": passed,
    }))
    sys.exit(0 if passed else 1)


if __name__ == "__main__":
    main()
