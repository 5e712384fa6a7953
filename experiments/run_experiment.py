#!/usr/bin/env python
"""Experiment entry point — the L4/L5 analog of the reference's
`ros2 launch bound_mpc experiment{1,2}.launch.py` + experiment runners.

Usage:
    python experiments/run_experiment.py --name experiment1 --out /tmp/exp1
    python experiments/run_experiment.py --name experiment2 --f32
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", choices=["experiment1", "experiment2"],
                    default="experiment1")
    ap.add_argument("--out", default=None, help="report output dir")
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--f32", action="store_true",
                    help="float32 runtime path (TPU); default float64 CPU")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--telemetry", default=None,
                    help="write native binary telemetry log to this path")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from boundmpc_tpu.runtime import ClosedLoopRunner, experiment1, experiment2
    from boundmpc_tpu import solver as solver_mod

    sc = experiment1() if args.name == "experiment1" else experiment2()
    if args.f32:
        runner = ClosedLoopRunner(sc, solver_cfg=solver_mod.RUNTIME_F32,
                                  dtype=jnp.float32)
    else:
        runner = ClosedLoopRunner(sc)

    if args.ticks <= 0:
        ap.error("--ticks must be positive")
    log = runner.run(max_ticks=args.ticks, verbose=args.verbose)

    if args.telemetry:
        from boundmpc_tpu.native.telemetry import TelemetrySink
        fields = ["t", "phi", "dphi", "viol", "iters", "t_comp", "success"]
        with TelemetrySink(args.telemetry, fields) as sink:
            recs = np.stack([
                np.array([log.t[i], log.phi[i], log.dphi[i], log.viol[i],
                          log.iters[i], log.t_comp[i], float(log.success[i])],
                         dtype=np.float32)
                for i in range(len(log.t))
            ])
            sink.push_batch(recs)
            sink.flush()
        print(f"telemetry: {args.telemetry}")

    summary = {
        "scenario": sc.name,
        "ticks": len(log.t),
        "phi_final": round(log.phi[-1], 4),
        "phi_max": round(runner.phi_max, 4),
        "reached_goal": runner.phi_max - log.phi[-1] < 0.01,
        "all_success": all(log.success),
        "max_viol": float(np.max(log.viol)),
        "t_comp_avg_ms": round(1e3 * float(np.mean(log.t_comp[1:])), 2)
        if len(log.t_comp) > 1 else None,
    }
    print(json.dumps(summary))

    if args.out:
        from boundmpc_tpu.observability import generate_report
        rep = generate_report(log, runner, args.out, tail=sc.name)
        print(f"report: {rep.outdir} ({len(rep.figures)} figures), "
              f"npz: {rep.npz_path}")


if __name__ == "__main__":
    main()
