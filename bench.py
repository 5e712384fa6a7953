"""Headline benchmark: batched BoundMPC solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.md): >= 1000 batched solves/s per host at Ipopt
control-sequence parity on experiment1 (N=10, nr_segs=4) — the reference
itself runs ONE 10 Hz solve per CPU process and is only real-time with the
closed-source HSL MA57.

Measurement discipline:
  * throughput is measured over K ticks fused in one jitted scan (host
    dispatch amortized — the production serving pattern) in the
    receding-horizon steady state;
  * correctness gates the number: success_rate and max violation are
    reported from the SAME ticks — throughput of a diverged solver is
    meaningless (round-1 lesson);
  * p99 per-tick latency is measured on single un-fused ticks (dispatch
    included), plus a B=1 single-scenario latency.
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
    K = 10  # ticks per fused scan

    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32, donate=False)
    scan_b = batch.make_scanned_ticks(cfg, scfg, K, dtype=jnp.float32)

    # Warm up: compile + settle into the receding-horizon regime.
    for _ in range(3):
        states, out = tick_b(states, paths, weights, x_phi_d)
    jax.block_until_ready(states.phi)

    # Single-tick latencies (dispatch included) — the p99 control-period
    # number against the reference's 100 ms budget.
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        states, out = tick_b(states, paths, weights, x_phi_d)
        jax.block_until_ready(states.phi)
        lat.append(time.perf_counter() - t0)

    # Fused-scan throughput + correctness over the same ticks.
    succ_all, viol_all, iters_all = [], [], []
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        states, (succ, viol, iters) = scan_b(states, paths, weights, x_phi_d)
        jax.block_until_ready(states.phi)
        times.append(time.perf_counter() - t0)
        succ_all.append(np.asarray(succ))
        viol_all.append(np.asarray(viol))
        iters_all.append(np.asarray(iters))
    per_tick = float(np.median(times)) / K
    succ_all = np.concatenate(succ_all)  # (ticks, B)
    viol_all = np.concatenate(viol_all)
    iters_all = np.concatenate(iters_all)

    # B=1 latency (single scenario, steady state)
    states1, paths1, weights1, x_phi_d1 = _build_batch(1, cfg)
    tick_1 = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32, donate=False)
    for _ in range(3):
        states1, out1 = tick_1(states1, paths1, weights1, x_phi_d1)
    jax.block_until_ready(states1.phi)
    lat1 = []
    for _ in range(10):
        t0 = time.perf_counter()
        states1, out1 = tick_1(states1, paths1, weights1, x_phi_d1)
        jax.block_until_ready(states1.phi)
        lat1.append(time.perf_counter() - t0)

    solves_per_s = B / per_tick
    result = {
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
        "batch": B,
        "platform": platform,
        "tick_latency_ms": round(per_tick * 1e3, 2),
        "tick_latency_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "b1_latency_ms": round(float(np.median(lat1)) * 1e3, 2),
        "success_rate": round(float(succ_all.mean()), 4),
        "max_viol": float(viol_all.max()),
        "mean_iters": round(float(iters_all.mean()), 1),
        "ticks_measured": int(succ_all.shape[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
