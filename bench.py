"""Headline benchmark: batched BoundMPC solves/s on one chip.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline",
...} and phase-progress lines on stderr (so a timeout leaves a diagnosable
tail).  Baseline (BASELINE.md): >= 1000 batched solves/s per host at Ipopt
control-sequence parity on experiment1 (N=10, nr_segs=4) — the reference
itself runs ONE 10 Hz solve per CPU process and is only real-time with the
closed-source HSL MA57.

Measurement discipline (r5 rules, closing the r4 gating loophole):
  * The HEADLINE value and its correctness gate come from the SAME window:
    B=256 through the STREAM executor (stream.py, the production serving
    pattern; per-lane numerics test-pinned equal to the sequential tick
    path), 120 ticks from rest, of which the last 100 (ticks 20-119) are
    timed — a window that reaches the DEEP path region (mean_phi ~5.5)
    where the round-4 fleet collapsed and the old 40-tick window never
    looked.
  * The gate is success_rate >= 0.999 over live lane-ticks AND
    max_viol < 1e-3 AND n_dead == 0 over that window.  A failing gate
    zeroes the headline: a diverging fleet cannot produce a passing number.
    The raw throughput is still reported (raw_solves_per_s) for diagnosis.
  * Batch-sweep entries are curve ANNOTATIONS, never headline candidates;
    they measure 40 early-region ticks on a fresh fleet and say so
    ("window": "early").  Default sweep {512}; set BENCH_SWEEP=512,1024,2048
    for the full curve (adds compile time).
  * lane_tick_p99_ms_est is an ESTIMATE: p99 of (per-lane-tick GN
    iterations x mean loop-iteration wall time).  Commit-phase iterations
    cost more than pure GN iterations, so the true per-robot tail is
    somewhat higher; the suffix is the label the r4 verdict demanded.
  * mfu: XLA's own FLOP counts for the three straight-line components of
    one GN iteration x executed loop iterations / wall / chip peak — a
    lower bound (excludes per-tick fixed work).
  * If any live lane-tick exceeds viol 1.0 or a lane dies, a postmortem
    record is embedded whose `repro` line replays the EXACT configuration
    (same fleet seed, executor, batch, chunking, tick count — the stream
    chunk boundaries don't change per-lane numerics, so the soak replays
    the bench trajectory bit-for-bit).
  * BENCH_FULL=1 adds the legacy lockstep-tick latency and B=1 latency
    numbers (two extra program compiles — off the driver's budget path).
"""
import json
import os
import sys
import time

import numpy as np


BASELINE_SOLVES_PER_S = 1000.0

# Dense f32 peak TFLOP/s per chip kind (MXU, no sparsity).  Used only for
# the MFU estimate; unknown kinds fall back to None (mfu omitted).
_PEAK_F32_TFLOPS = {
    "TPU v4": 137.5,  # bf16 275 / 2
    "TPU v5": 197.0,
    "TPU v5 lite": 98.5,  # v5e; device_kind reports "TPU v5 lite"
    "TPU v5e": 98.5,  # bf16 197 / 2
    "TPU v5p": 229.5,
    "TPU v6e": 459.0,  # bf16 918 / 2
}


def _peak_tflops(kind: str):
    for k, v in sorted(_PEAK_F32_TFLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return None


_T0 = time.perf_counter()


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _iter_flops(cfg, scfg, B, states, paths, weights, x_phi_d):
    """XLA cost-analysis FLOPs of one batched GN iteration's straight-line
    components (jacobian sweep, TSQR step, line search).  cost_analysis
    counts a while-loop body once, so the fused executor reports ~0; lower
    the components instead and multiply by executed loop iterations."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from boundmpc_tpu import engine as _eng, jerkint as _ji, \
        kinematics as _kin, ocp
    from boundmpc_tpu.ops import tsqr as _tsqr
    from boundmpc_tpu.solver import _barrier as _bar

    _coeffs = _ji.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float32)
    _limits = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32)
        if isinstance(a, jnp.ndarray) else a, _kin.robot_limits())
    ap_b = jax.jit(jax.vmap(partial(_eng.assemble_params, cfg)))
    params_s = ap_b(states, paths, weights, x_phi_d)
    n = cfg.N * (cfg.nr_joints + 1)
    u_s = states.u_warm.reshape(B, -1)

    def _rc(p, uf):
        return ocp.residuals_and_constraints(
            cfg, _coeffs, p, uf.reshape(cfg.N, cfg.nr_joints + 1),
            _limits, scaled=scfg.scale_constraints)

    def _jac(p, uf):
        return jax.vmap(lambda t: jax.jvp(lambda v: _rc(p, v),
                                          (uf,), (t,))[1],
                        out_axes=(1, 1))(jnp.eye(n, dtype=jnp.float32))

    def _ls(p, uf, du):
        al = scfg.ls_decay ** jnp.arange(scfg.n_ls, dtype=jnp.float32)

        def merit(v):
            r, c = _rc(p, v)
            return jnp.sum(r * r) + 1e-6 * jnp.sum(_bar(-c, scfg.delta))
        return jax.vmap(lambda a: merit(uf + a * du))(al)

    def _flops(fn, *xs):
        c = jax.jit(fn).lower(*xs).compile().cost_analysis()
        ca = c[0] if isinstance(c, (list, tuple)) else c
        return float(ca.get("flops", 0.0))

    A_s = jnp.zeros((B, 550, n), jnp.float32)
    b_s = jnp.zeros((B, 550), jnp.float32)
    return (
        _flops(jax.vmap(_jac), params_s, u_s)
        + _flops(lambda A, b: _tsqr.tsqr_ls_solve(A, b), A_s, b_s)
        + _flops(jax.vmap(_ls), params_s, u_s, u_s)
    )


def main():
    import jax
    import jax.numpy as jnp
    from boundmpc_tpu import batch, ocp, solver as solver_mod, stream
    from boundmpc_tpu.runtime import enable_compilation_cache
    from __graft_entry__ import _build_batch

    enable_compilation_cache()
    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    # First device access can block MINUTES waiting for the remote chip
    # allocator (measured: 35s-15min, uncorrelated with our work) — log it
    # explicitly so a driver timeout leaves a self-explaining tail.
    _log("acquiring TPU device (remote allocation; can take minutes)")
    platform = jax.devices()[0].platform
    _log(f"device acquired: {jax.devices()[0].device_kind}")
    on_tpu = platform != "cpu"
    B = 256 if on_tpu else 8
    K = 20 if on_tpu else 4  # ticks per fused stream call
    N_CHUNKS = 6 if on_tpu else 2  # 120 ticks: rest -> deep region
    full = os.environ.get("BENCH_FULL", "") == "1"

    def build(Bi):
        states, paths, weights, x_phi_d = _build_batch(Bi, cfg)
        pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d)
        return states, paths, weights, x_phi_d, pref

    _log(f"build fleet B={B} (platform={platform}, "
         f"max_iters={scfg.max_iters})")
    states, paths, weights, x_phi_d, pref = build(B)
    jax.block_until_ready(pref.R0)
    stream_b = stream.make_stream_ticks(cfg, scfg, K, dtype=jnp.float32,
                                        donate=False)

    # --- headline window: N_CHUNKS*K ticks from rest; chunk 0 is the
    # compile+settle chunk (untimed, but its correctness is still recorded
    # for the full-run report).
    succ_all, viol_all, iters_all, nloop_all, dead_all = [], [], [], [], []
    times = []  # len N_CHUNKS; times[0] includes compile
    prev_dead = np.asarray(states.dead)
    for ci in range(N_CHUNKS):
        _log(f"stream chunk {ci} (ticks {ci * K}-{ci * K + K - 1})"
             + (" [compile]" if ci == 0 else ""))
        t0 = time.perf_counter()
        states, sout = stream_b(states, paths, weights, x_phi_d, pref)
        jax.block_until_ready(states.phi)
        times.append(time.perf_counter() - t0)
        succ_all.append(np.asarray(sout.success))
        viol_all.append(np.asarray(sout.viol))
        iters_all.append(np.asarray(sout.iters))
        nloop_all.append(int(sout.n_loop))
        dead_all.append(np.asarray(sout.dead))
    succ_all = np.concatenate(succ_all)  # (ticks, B)
    viol_all = np.concatenate(viol_all)
    iters_all = np.concatenate(iters_all)
    dead_all = np.concatenate(dead_all)
    # Live mask: a dead lane is a STOPPED robot (the reference node stops
    # logging it, bound_mpc_node.py:306-307) — its death tick counts once
    # as a failure; later ticks are excluded and n_dead reported.
    # sout.dead is dead-AFTER-tick; shift for dead-BEFORE.
    live_all = ~np.concatenate([prev_dead[None, :], dead_all[:-1]], axis=0)
    n_dead = int(dead_all[-1].sum())
    viol_live = np.where(live_all, viol_all, 0.0)

    # Timed/gate window = ticks K .. N_CHUNKS*K-1 (everything after the
    # compile chunk): value and gate from the SAME ticks.
    t_timed = float(np.sum(times[1:]))
    ticks_timed = (N_CHUNKS - 1) * K
    sl = slice(K, None)
    succ_w, live_w = succ_all[sl], live_all[sl]
    viol_w = viol_live[sl]
    success_rate_w = float(succ_w[live_w].mean())
    max_viol_w = float(viol_w.max())
    raw_solves_per_s = B * ticks_timed / t_timed
    gate_ok = (success_rate_w >= 0.999 and max_viol_w < 1e-3
               and n_dead == 0)
    _log(f"headline window: {raw_solves_per_s:.0f} solves/s, success "
         f"{success_rate_w:.4f}, max_viol {max_viol_w:.2e}, n_dead {n_dead},"
         f" gate {'PASS' if gate_ok else 'FAIL'}")

    # Per-lane tail latency ESTIMATE (see module docstring).
    loop_iter_s = t_timed / max(sum(nloop_all[1:]), 1)
    lane_tick_p99_ms_est = (float(np.percentile(iters_all[sl], 99))
                            * loop_iter_s * 1e3)

    # Postmortem: worst LIVE lane-tick if anything diverged, with a repro
    # line that replays the exact configuration (fleet seed 0, stream
    # executor, same B/chunk/ticks — chunk boundaries don't change per-lane
    # numerics).
    postmortem = None
    if viol_live.max() > 1.0 or n_dead:
        t_bad, lane_bad = np.unravel_index(np.argmax(viol_live),
                                           viol_live.shape)
        postmortem = {
            "scenario": int(lane_bad),
            "tick": int(t_bad),
            "viol": float(viol_live[t_bad, lane_bad]),
            "n_dead": n_dead,
            "lane_viol_history": [round(float(v), 6)
                                  for v in viol_all[:, lane_bad]],
            "repro": (f"python experiments/soak.py --B {B} "
                      f"--ticks {N_CHUNKS * K} --chunk {K} "
                      f"--dump-worst /tmp/bench_worst.npz"),
        }

    # --- batch sweep: early-window curve annotations (never headline).
    sweep = []
    if on_tpu:
        sweep_sizes = [int(x) for x in os.environ.get(
            "BENCH_SWEEP", "512").split(",") if x.strip()]
    else:
        sweep_sizes = []
    for Bi in sweep_sizes:
        try:
            _log(f"sweep B={Bi}: build")
            s_i, p_i, w_i, x_i, pr_i = build(Bi)
            str_i = stream.make_stream_ticks(cfg, scfg, K,
                                             dtype=jnp.float32, donate=False)
            _log(f"sweep B={Bi}: compile+settle")
            s_i, _ = str_i(s_i, p_i, w_i, x_i, pr_i)
            jax.block_until_ready(s_i.phi)
            t0 = time.perf_counter()
            n_rep = 2
            sc_i, dd_i = [], []
            pd_i = np.asarray(s_i.dead)
            for _ in range(n_rep):
                s_i, so_i = str_i(s_i, p_i, w_i, x_i, pr_i)
                jax.block_until_ready(s_i.phi)
                sc_i.append(np.asarray(so_i.success))
                dd_i.append(np.asarray(so_i.dead))
            pt = (time.perf_counter() - t0) / (n_rep * K)
            sc_i = np.concatenate(sc_i)
            dd_i = np.concatenate(dd_i)
            lv_i = ~np.concatenate([pd_i[None], dd_i[:-1]], axis=0)
            sweep.append({
                "batch": Bi,
                "solves_per_s": round(Bi / pt, 1),
                "tick_ms": round(pt * 1e3, 2),
                "success_rate": round(float(sc_i[lv_i].mean()), 4),
                "window": f"early (ticks {K}-{(n_rep + 1) * K - 1})",
            })
            _log(f"sweep B={Bi}: {sweep[-1]['solves_per_s']} solves/s")
        except Exception as e:  # OOM etc. — report, don't crash the bench
            sweep.append({"batch": Bi, "error": str(e)[:120]})

    # --- FLOP accounting for the MFU report.
    _log("flop accounting")
    iter_flops = None
    try:
        iter_flops = _iter_flops(cfg, scfg, B, states, paths, weights,
                                 x_phi_d)
    except Exception as e:
        _log(f"flop accounting failed: {e}")

    result = {
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": round(raw_solves_per_s, 1) if gate_ok else 0.0,
        "unit": "solves/s",
        "vs_baseline": round(raw_solves_per_s / BASELINE_SOLVES_PER_S, 3)
        if gate_ok else 0.0,
        "batch": B,
        "platform": platform,
        "executor": "stream",
        "gate": {
            "passed": gate_ok,
            "rule": "success>=0.999 & max_viol<1e-3 & n_dead==0 over the "
                    "timed ticks at the quoted batch",
            "window_ticks": [K, N_CHUNKS * K - 1],
            "success_rate": round(success_rate_w, 5),
            "max_viol": max_viol_w,
            "n_dead": n_dead,
        },
        "raw_solves_per_s": round(raw_solves_per_s, 1),
        "tick_latency_ms": round(t_timed / ticks_timed * 1e3, 2),
        "lane_tick_p99_ms_est": round(lane_tick_p99_ms_est, 2),
        "success_rate": round(float(succ_all[live_all].mean()), 5),
        "max_viol": float(viol_live.max()),
        "n_dead": n_dead,
        "mean_iters": round(float(iters_all.mean()), 1),
        "p99_iters": float(np.percentile(iters_all, 99)),
        "ticks_measured": int(succ_all.shape[0]),
        "batch_sweep": sweep,
        "wall_s": round(time.perf_counter() - _T0, 1),
    }
    if iter_flops:
        # Executed work = one batched GN iteration per stream loop
        # iteration (the counter the executor reports); commit/setup phases
        # are excluded, so this is a lower bound on achieved FLOP/s.
        tflops_achieved = (iter_flops * float(sum(nloop_all[1:]))
                           / t_timed / 1e12)
        result["achieved_tflops"] = round(tflops_achieved, 3)
        result["flops_per_iteration"] = iter_flops
        kind = jax.devices()[0].device_kind
        peak = _peak_tflops(kind)
        result["device_kind"] = kind
        if peak:
            result["mfu"] = round(tflops_achieved / peak, 5)
    if postmortem is not None:
        result["postmortem"] = postmortem

    if full:
        _log("BENCH_FULL: lockstep + B=1 latency")
        tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                         donate=False)
        for _ in range(2):
            states, _ = tick_b(states, paths, weights, x_phi_d, pref)
        jax.block_until_ready(states.phi)
        lat = []
        for _ in range(10):
            t0 = time.perf_counter()
            states, _ = tick_b(states, paths, weights, x_phi_d, pref)
            jax.block_until_ready(states.phi)
            lat.append(time.perf_counter() - t0)
        result["lockstep_tick_ms"] = round(float(np.median(lat)) * 1e3, 2)
        s1, p1, w1, x1, pr1 = build(1)
        tick_1 = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                         donate=False)
        for _ in range(3):
            s1, _ = tick_1(s1, p1, w1, x1, pr1)
        jax.block_until_ready(s1.phi)
        lat1 = []
        for _ in range(10):
            t0 = time.perf_counter()
            s1, _ = tick_1(s1, p1, w1, x1, pr1)
            jax.block_until_ready(s1.phi)
            lat1.append(time.perf_counter() - t0)
        result["b1_latency_ms"] = round(float(np.median(lat1)) * 1e3, 2)

    _log("done")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
