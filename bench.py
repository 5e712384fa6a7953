"""Headline benchmark: batched BoundMPC solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 1000 batched solves/s per host at Ipopt
control-sequence parity on experiment1 (N=10, nr_segs=4) — the reference
itself runs ONE 10 Hz solve per CPU process and is only real-time with the
closed-source HSL MA57.
"""
import json
import time

import numpy as np


BASELINE_SOLVES_PER_S = 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from boundmpc_tpu import batch, ocp, solver as solver_mod
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    platform = jax.devices()[0].platform
    B = 256 if platform != "cpu" else 16

    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32, donate=False)

    # Warm up: compile + let warm starts settle into the receding-horizon
    # regime (the steady state that matters for control throughput).
    for _ in range(3):
        states, out = tick_b(states, paths, weights, x_phi_d)
    jax.block_until_ready(states.phi)

    times = []
    for _ in range(12):
        t0 = time.perf_counter()
        states, out = tick_b(states, paths, weights, x_phi_d)
        jax.block_until_ready(states.phi)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    p99 = float(np.percentile(times, 99))

    solves_per_s = B / dt
    n_success = int(np.asarray(out.success).sum())
    result = {
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
        "batch": B,
        "platform": platform,
        "tick_latency_ms": round(dt * 1e3, 2),
        "tick_latency_p99_ms": round(p99 * 1e3, 2),
        "success_rate": round(n_success / B, 3),
        "max_viol": float(np.asarray(out.stats.viol).max()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
