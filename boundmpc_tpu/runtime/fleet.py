"""Fleet runner: thousands of closed MPC loops advancing in lockstep.

This is the scaled counterpart of ClosedLoopRunner (BASELINE.json's batched
configs): one jitted vmapped tick advances every scenario each control
period; per-tick fleet metrics stream into the native telemetry sink
without blocking the loop.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import batch as batch_mod, ocp, solver as solver_mod
from .scenarios import Scenario


@dataclass
class FleetStats:
    ticks: int
    batch: int
    solves_per_s: float
    tick_ms_median: float
    tick_ms_p99: float
    # success/viol aggregate over LIVE lane-ticks only: a dead lane is a
    # STOPPED robot (the reference node stops logging it after N consecutive
    # failures, bound_mpc_node.py:306-307) — its death tick counts as a
    # failure once, and n_dead reports it; replaying its frozen state as a
    # new failure every subsequent tick would double-count one event.
    success_rate: float
    max_viol: float
    mean_phi: float
    n_dead: int = 0


class FleetRunner:
    def __init__(self, scenarios: List[Scenario],
                 solver_cfg: Optional[solver_mod.SolverConfig] = None,
                 dtype=jnp.float32, telemetry_path: Optional[str] = None,
                 mpcdata_path: Optional[str] = None):
        assert scenarios, "need at least one scenario"
        self.B = len(scenarios)
        sc0 = scenarios[0]
        self.cfg = ocp.OcpConfig(N=sc0.N, nr_segs=sc0.nr_segs, dt=sc0.dt)
        self.scfg = solver_cfg or solver_mod.RUNTIME_F32
        self.dtype = dtype

        def cast(tree):
            return jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), dtype)
                if np.issubdtype(np.asarray(a).dtype, np.floating)
                else jnp.asarray(a), tree,
            )

        # Same capacity across the fleet so paths stack.  Stack host-side
        # (build_path returns numpy), cast/transfer ONCE per leaf.
        caps = [len(s.p_via) - 1 + s.nr_segs - 1 for s in scenarios]
        cap = max(caps)
        built = [s.build(capacity=cap, dtype=np.float64) for s in scenarios]
        self.paths = cast(jax.tree.map(lambda *xs: np.stack(xs, axis=0),
                                       *built))
        self.states = batch_mod.batched_init_state(
            self.cfg, np.stack([s.q0 for s in scenarios]), dtype=dtype
        )
        self.weights = jnp.asarray(np.stack([s.weights for s in scenarios]), dtype)
        phim = np.asarray(self.paths.phi_max)
        self.x_phi_d = jnp.asarray(
            np.stack([[p - 1e-4, 0.0, 0.0] for p in phim]), dtype
        )
        self._tick = batch_mod.make_batched_tick(self.cfg, self.scfg, dtype=dtype)
        # Setup-time QR prefactor of the linear residual block (one batched
        # QR per fleet; per tick only a skinny matvec remains).
        self._pref = batch_mod.make_prefactor_batch(
            self.cfg, self.paths, self.weights, self.x_phi_d, dtype=dtype)

        self._sink = None
        if telemetry_path is not None:
            from ..native.telemetry import TelemetrySink
            self._fields = ["tick", "scenario", "phi", "dphi", "viol", "iters",
                            "success", "error_count"]
            self._sink = TelemetrySink(telemetry_path, self._fields)

        # MPCData-grade stream: the full per-tick horizon payload
        # (nodes/bound_mpc_node.py:169-290 analog) through the native sink.
        self._mpc_writer = None
        if mpcdata_path is not None:
            from .mpcdata import MPCDataWriter
            from .. import jerkint, ocp as ocp_mod
            coeffs = jerkint.coeff_matrices(self.cfg.N, self.cfg.dt,
                                            dtype=dtype)
            self._mpc_writer = MPCDataWriter(mpcdata_path, self.cfg)
            self._ev = jax.jit(jax.vmap(
                lambda p, u: ocp_mod.evaluate_stages(self.cfg, coeffs, p, u)))

    def run(self, ticks: int = 100) -> FleetStats:
        states = self.states
        times = []
        succ_sum = 0.0
        succ_n = 0
        max_viol = 0.0
        dead_prev = np.asarray(states.dead)
        for k in range(ticks):
            t0 = time.perf_counter()
            states, out = self._tick(states, self.paths, self.weights,
                                     self.x_phi_d, self._pref)
            jax.block_until_ready(states.phi)
            times.append(time.perf_counter() - t0)
            # Aggregate correctness over EVERY tick, not just the last one —
            # a transient mid-run failure wave must show in the stats (the
            # reference's `fails` series is likewise cumulative,
            # bound_mpc_node.py:310) — but only over LIVE lanes (see
            # FleetStats: a dead lane is a stopped robot, not a repeating
            # failure).
            live = ~dead_prev
            succ = np.asarray(out.success)[live]
            succ_sum += float(succ.sum())
            succ_n += succ.size
            viol = np.asarray(out.stats.viol)[live]
            if viol.size:
                max_viol = max(max_viol, float(viol.max()))
            dead_prev = np.asarray(states.dead)
            if self._mpc_writer is not None:
                ev = self._ev(out.params, jnp.asarray(out.u))
                self._mpc_writer.push_tick(k, states, out, ev.err, ev.ref,
                                           times[-1])
            if self._sink is not None:
                phi = np.asarray(states.phi)
                recs = np.stack([
                    np.full(self.B, k, dtype=np.float32),
                    np.arange(self.B, dtype=np.float32),
                    phi.astype(np.float32),
                    np.asarray(states.dphi, dtype=np.float32),
                    np.asarray(out.stats.viol, dtype=np.float32),
                    np.asarray(out.stats.iters, dtype=np.float32),
                    np.asarray(out.success, dtype=np.float32),
                    np.asarray(out.error_count, dtype=np.float32),
                ], axis=1)
                self._sink.push_batch(recs)
        self.states = states
        if self._sink is not None:
            self._sink.flush()
        if self._mpc_writer is not None:
            self._mpc_writer.flush()

        times = np.asarray(times[1:]) if len(times) > 1 else np.asarray(times)
        return FleetStats(
            ticks=ticks, batch=self.B,
            solves_per_s=float(self.B / np.median(times)),
            tick_ms_median=float(np.median(times) * 1e3),
            tick_ms_p99=float(np.percentile(times, 99) * 1e3),
            success_rate=succ_sum / max(succ_n, 1),
            max_viol=max_viol,
            mean_phi=float(np.asarray(self.states.phi).mean()),
            n_dead=int(np.asarray(self.states.dead).sum()),
        )

    def run_stream(self, ticks: int = 100, chunk: int = 10) -> FleetStats:
        """Serve the fleet through the STREAM executor (stream.py): lanes
        advance through their own ticks asynchronously inside one fused
        device loop — ~2x the lockstep `run` throughput at B=256 (measured
        on-chip, experiments/prof_stream.py).  Telemetry streams per tick
        from the executor's recorded series between chunks; the MPCData
        horizon stream needs per-tick TickOut payloads and is only available
        through `run` (documented trade: full-horizon observability runs the
        per-tick path, production serving runs the stream).
        """
        from .. import stream as stream_mod
        assert self._mpc_writer is None, \
            "MPCData horizon streaming requires the per-tick executor (run)"
        n_chunks = (ticks + chunk - 1) // chunk
        stream_fn = stream_mod.make_stream_ticks(self.cfg, self.scfg, chunk,
                                                 dtype=self.dtype,
                                                 donate=False)
        states = self.states
        times = []
        succ_sum, succ_n, max_viol, n_loop = 0.0, 0, 0.0, 0
        iters_all = []
        prev_dead = np.asarray(states.dead)
        for ci in range(n_chunks):
            t0 = time.perf_counter()
            states, sout = stream_fn(states, self.paths, self.weights,
                                     self.x_phi_d, self._pref)
            jax.block_until_ready(states.phi)
            times.append(time.perf_counter() - t0)
            succ = np.asarray(sout.success)
            viol = np.asarray(sout.viol)
            iters = np.asarray(sout.iters)
            phi = np.asarray(sout.phi)
            dphi = np.asarray(sout.dphi)
            errc = np.asarray(sout.error_count)
            # Live mask: lane-ticks before (and including) the death tick
            # (sout.dead is dead-AFTER-tick; shift by one for dead-BEFORE).
            dead = np.asarray(sout.dead)
            live = ~np.concatenate([prev_dead[None, :], dead[:-1]], axis=0)
            prev_dead = dead[-1]
            succ_sum += float(succ[live].sum())
            succ_n += int(live.sum())
            if live.any():
                max_viol = max(max_viol, float(viol[live].max()))
            n_loop += int(sout.n_loop)
            iters_all.append(iters)
            if self._sink is not None:
                # Same field contract as the per-tick executor's records:
                # dphi/error_count come from the executor's recorded series
                # (StreamOut carries them since r5 — no placeholder zeros).
                for k in range(succ.shape[0]):
                    recs = np.stack([
                        np.full(self.B, ci * chunk + k, dtype=np.float32),
                        np.arange(self.B, dtype=np.float32),
                        phi[k].astype(np.float32),
                        dphi[k].astype(np.float32),
                        viol[k].astype(np.float32),
                        iters[k].astype(np.float32),
                        succ[k].astype(np.float32),
                        errc[k].astype(np.float32),
                    ], axis=1)
                    self._sink.push_batch(recs)
        self.states = states
        if self._sink is not None:
            self._sink.flush()
        iters_all = np.concatenate(iters_all)
        # Per-lane tick latency: a lane's tick spans its own GN iterations,
        # each costing one measured loop iteration.
        loop_iter_s = float(np.sum(times)) / max(n_loop, 1)
        lane_ms = iters_all.astype(np.float64) * loop_iter_s * 1e3
        total = float(np.sum(times))
        return FleetStats(
            ticks=n_chunks * chunk, batch=self.B,
            solves_per_s=float(self.B * n_chunks * chunk / total),
            tick_ms_median=float(np.median(lane_ms)),
            tick_ms_p99=float(np.percentile(lane_ms, 99)),
            success_rate=succ_sum / max(succ_n, 1),
            max_viol=max_viol,
            mean_phi=float(np.asarray(self.states.phi).mean()),
            n_dead=int(np.asarray(self.states.dead).sum()),
        )

    def save_checkpoint(self, path: str):
        """Persist the fleet's carried engine state (warm starts, phi state,
        rotation references, failure counters) — resume == continue the
        receding-horizon loops exactly where they stopped (SURVEY.md §5.4:
        the reference's only 'checkpoint' is its in-memory warm start)."""
        flat = {f"s{i}": np.asarray(leaf)
                for i, leaf in enumerate(jax.tree.leaves(self.states))}
        np.savez_compressed(path, **flat)

    def load_checkpoint(self, path: str):
        from .. import engine as engine_mod
        self.states = engine_mod.load_state_dump(self.states, np.load(path))

    def close(self):
        if self._sink is not None:
            self._sink.close()
            self._sink = None
        if self._mpc_writer is not None:
            self._mpc_writer.close()
            self._mpc_writer = None
