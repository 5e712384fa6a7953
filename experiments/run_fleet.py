#!/usr/bin/env python
"""Fleet entry point: thousands of MPC loops in lockstep on one or many
chips — the L5 orchestration layer (the reference's only orchestration is
`ros2 launch` of a single controller; batched/multi-chip scaling is the new
scope demanded by BASELINE.md).

Single host (vmap over one device):
    python experiments/run_fleet.py --batch 256 --ticks 100 \
        --telemetry /tmp/fleet.bin --checkpoint /tmp/fleet.npz

Sharded over all local devices (shard_map scenario mesh, ICI reductions):
    python experiments/run_fleet.py --batch 256 --ticks 100 --sharded

Multi-host (one process per host, same flags everywhere):
    python experiments/run_fleet.py --sharded \
        --coordinator HOST0:1234 --num-processes 2 --process-id $RANK
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--base", choices=["experiment1", "experiment2"],
                    default="experiment1")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--telemetry", default=None,
                    help="native binary telemetry log path")
    ap.add_argument("--mpcdata", default=None,
                    help="MPCData-grade native log (full horizon payload "
                         "per scenario-tick; feed report_from_telemetry)")
    ap.add_argument("--checkpoint", default=None,
                    help="save the fleet state here at the end")
    ap.add_argument("--resume", default=None,
                    help="load a fleet checkpoint before running")
    ap.add_argument("--sharded", action="store_true",
                    help="shard_map over all (global) devices")
    ap.add_argument("--executor", choices=["stream", "tick"],
                    default="stream",
                    help="stream = fused async executor (production serving,"
                         " ~2x); tick = per-tick lockstep (required for"
                         " --mpcdata horizon streaming)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    # multi-host bring-up (jax.distributed; call once per host)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    # distributed init must precede any backend use
    from boundmpc_tpu.distributed import init_multihost
    init_multihost(coordinator=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from boundmpc_tpu import ocp, solver as solver_mod
    from boundmpc_tpu.runtime import FleetRunner, experiment1, experiment2, \
        random_scenario, enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(args.seed)
    base = experiment1 if args.base == "experiment1" else experiment2
    scenarios = [base()] + [random_scenario(rng, base=args.base)
                            for _ in range(args.batch - 1)]

    if args.sharded:
        import time
        from boundmpc_tpu import batch as batch_mod
        from boundmpc_tpu.distributed import ShardedEngine, scenario_mesh

        cfg = ocp.OcpConfig()
        mesh = scenario_mesh()
        eng = ShardedEngine(cfg, solver_mod.RUNTIME_F32, mesh,
                            dtype=jnp.float32)
        fl = FleetRunner(scenarios)  # reuse its batched construction
        states = eng.sharding(fl.states)
        paths = eng.sharding(fl.paths)
        weights = eng.sharding(fl.weights)
        x_phi_d = eng.sharding(fl.x_phi_d)
        pref = eng.prefactor(fl.paths, fl.weights, fl.x_phi_d)
        times = []
        if args.executor == "stream":
            # Async executor under shard_map: each device advances its local
            # lanes through their own ticks in an independent fused loop;
            # only the end-of-chunk metric reduction crosses ICI.  The
            # remainder ticks run through a separate (separately cached)
            # smaller stream call so exactly --ticks ticks execute.
            chunk = 10
            plan = [chunk] * (args.ticks // chunk)
            if args.ticks % chunk:
                plan.append(args.ticks % chunk)
            succ_sum = succ_n = 0
            metrics = {}
            for n_t in plan:
                t0 = time.perf_counter()
                states, sout, metrics = eng.stream(
                    states, paths, weights, x_phi_d, pref, n_ticks=n_t)
                jax.block_until_ready(states.phi)
                times.append(time.perf_counter() - t0)
                # success_rate over LIVE lane-ticks (FleetStats contract):
                # n_success is live-masked in-graph; n_live is the matching
                # denominator.
                succ_sum += int(metrics["n_success"])
                succ_n += int(metrics["n_live"])
            # Median per-tick time over FULL chunks only (the remainder
            # chunk has different per-call overhead amortization).
            full = times[:args.ticks // chunk]
            med = float(np.median(full[1:] or full or times)) / chunk
            success_rate = succ_sum / max(succ_n, 1)
        else:
            metrics = {}
            for k in range(args.ticks):
                t0 = time.perf_counter()
                states, outs, metrics = eng.tick(states, paths, weights,
                                                 x_phi_d, pref)
                jax.block_until_ready(states.phi)
                times.append(time.perf_counter() - t0)
            med = float(np.median(times[1:] or times))
            success_rate = float(metrics["n_success"]) / args.batch
        summary = {
            "mode": f"sharded-{args.executor}",
            "devices": len(mesh.devices.flatten()),
            "processes": jax.process_count(),
            "batch": args.batch,
            "ticks": args.ticks,
            "solves_per_s": round(args.batch / med, 1),
            "success_rate": round(success_rate, 4),
            "n_dead": int(metrics["n_dead"]),
            "max_viol": float(metrics["max_viol"]),
            "mean_phi": float(metrics["mean_phi"]),
        }
        print(json.dumps(summary))
        return

    fleet = FleetRunner(scenarios, telemetry_path=args.telemetry,
                        mpcdata_path=args.mpcdata)
    if args.resume:
        fleet.load_checkpoint(args.resume)
    use_stream = args.executor == "stream" and args.mpcdata is None
    if use_stream:
        stats = fleet.run_stream(ticks=args.ticks)
    else:
        stats = fleet.run(ticks=args.ticks)
    if args.checkpoint:
        fleet.save_checkpoint(args.checkpoint)
        print(f"checkpoint: {args.checkpoint}")
    fleet.close()
    print(json.dumps({
        "mode": "stream" if use_stream else "vmap",
        "batch": stats.batch, "ticks": stats.ticks,
        "solves_per_s": round(stats.solves_per_s, 1),
        "tick_ms_median": round(stats.tick_ms_median, 2),
        "tick_ms_p99": round(stats.tick_ms_p99, 2),
        "success_rate": round(stats.success_rate, 4),
        "max_viol": stats.max_viol,
        "n_dead": stats.n_dead,
        "mean_phi": round(stats.mean_phi, 4),
    }))


if __name__ == "__main__":
    main()
