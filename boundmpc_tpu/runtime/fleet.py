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
    success_rate: float
    max_viol: float
    mean_phi: float


class FleetRunner:
    def __init__(self, scenarios: List[Scenario],
                 solver_cfg: Optional[solver_mod.SolverConfig] = None,
                 dtype=jnp.float32, telemetry_path: Optional[str] = None):
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

        # Same capacity across the fleet so paths stack.
        caps = [len(s.p_via) - 1 + s.nr_segs - 1 for s in scenarios]
        cap = max(caps)
        self.paths = batch_mod.stack_paths(
            [cast(s.build(capacity=cap, dtype=np.float64)) for s in scenarios]
        )
        self.states = batch_mod.batched_init_state(
            self.cfg, np.stack([s.q0 for s in scenarios]), dtype=dtype
        )
        self.weights = jnp.asarray(np.stack([s.weights for s in scenarios]), dtype)
        phim = np.asarray(self.paths.phi_max)
        self.x_phi_d = jnp.asarray(
            np.stack([[p - 1e-4, 0.0, 0.0] for p in phim]), dtype
        )
        self._tick = batch_mod.make_batched_tick(self.cfg, self.scfg, dtype=dtype)

        self._sink = None
        if telemetry_path is not None:
            from ..native.telemetry import TelemetrySink
            self._fields = ["tick", "scenario", "phi", "dphi", "viol", "iters",
                            "success", "error_count"]
            self._sink = TelemetrySink(telemetry_path, self._fields)

    def run(self, ticks: int = 100) -> FleetStats:
        states = self.states
        times = []
        last_out = None
        for k in range(ticks):
            t0 = time.perf_counter()
            states, out = self._tick(states, self.paths, self.weights, self.x_phi_d)
            jax.block_until_ready(states.phi)
            times.append(time.perf_counter() - t0)
            last_out = out
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

        times = np.asarray(times[1:]) if len(times) > 1 else np.asarray(times)
        return FleetStats(
            ticks=ticks, batch=self.B,
            solves_per_s=float(self.B / np.median(times)),
            tick_ms_median=float(np.median(times) * 1e3),
            tick_ms_p99=float(np.percentile(times, 99) * 1e3),
            success_rate=float(np.asarray(last_out.success).mean()),
            max_viol=float(np.asarray(last_out.stats.viol).max()),
            mean_phi=float(np.asarray(self.states.phi).mean()),
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
        data = np.load(path)
        leaves = [jnp.asarray(data[f"s{i}"])
                  for i in range(len(data.files))]
        self.states = jax.tree.unflatten(
            jax.tree.structure(self.states), leaves
        )

    def close(self):
        if self._sink is not None:
            self._sink.close()
            self._sink = None
