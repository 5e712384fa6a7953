"""Multi-chip / multi-host scaling over the scenario mesh.

The reference's "distributed backend" is ROS2/DDS pub-sub on one machine
(SURVEY.md §5.8) — no multi-node capability.  Here scaling is a 1-D device
mesh over the scenario axis: per-scenario solves are independent, so the
batch shards embarrassingly with `shard_map`; ICI collectives only carry
metric reductions (solves/s counters, convergence stats), exactly the
pattern BASELINE.json prescribes.  Multi-host initialization uses
`jax.distributed.initialize` (call `init_multihost()` once per host before
building the mesh).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import engine, jerkint, kinematics, ocp, solver as solver_mod


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def scenario_mesh(devices=None) -> Mesh:
    """1-D mesh over all (local or global) devices; axis name 'scenario'."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), axis_names=("scenario",))


class ShardedEngine:
    """Batched MPC engine sharded over a scenario mesh.

    The per-tick program is `shard_map(vmap(tick))`: each device runs its
    shard of scenarios; a `psum` reduces fleet metrics over ICI.  States are
    device-resident across ticks (donated buffers).
    """

    def __init__(self, cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                 mesh: Mesh, dtype=jnp.float32):
        self.cfg, self.scfg, self.mesh, self.dtype = cfg, scfg, mesh, dtype
        coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
        limits = jax.tree.map(
            lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray) else a,
            kinematics.robot_limits(),
        )

        self._tick1 = partial(engine.tick, cfg, scfg, coeffs, limits)
        self._tick_fns = {}
        self._stream_fns = {}

    def _get_tick(self, has_pref: bool):
        if has_pref in self._tick_fns:
            return self._tick_fns[has_pref]
        tick1 = self._tick1
        metric_keys = ("n_success", "n_dead", "total_iters", "max_viol",
                       "mean_phi")

        def shard_tick(states, paths, weights, x_phi_d, *maybe_pref):
            pref = maybe_pref[0] if maybe_pref else None
            axes = (0, 0, 0, 0, None, 0 if has_pref else None)
            new_states, outs = jax.vmap(tick1, in_axes=axes)(
                states, paths, weights, x_phi_d, None, pref)
            # Fleet metrics reduced over ICI (per-shard partial sums).
            metrics = {
                "n_success": jax.lax.psum(
                    jnp.sum(outs.success.astype(jnp.int32)), "scenario"
                ),
                "n_dead": jax.lax.psum(
                    jnp.sum(new_states.dead.astype(jnp.int32)), "scenario"
                ),
                "total_iters": jax.lax.psum(jnp.sum(outs.stats.iters), "scenario"),
                "max_viol": jax.lax.pmax(jnp.max(outs.stats.viol), "scenario"),
                "mean_phi": jax.lax.pmean(jnp.mean(new_states.phi), "scenario"),
            }
            return new_states, outs, metrics

        in_specs = (P("scenario"),) * (5 if has_pref else 4)
        sharded = jax.shard_map(
            shard_tick,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P("scenario"), P("scenario"),
                       {k: P() for k in metric_keys}),
            # Replicated scan carries (e.g. the FK chain's identity init) are
            # promoted to varying inside the body; skip the strict VMA check.
            check_vma=False,
        )
        fn = jax.jit(sharded, donate_argnums=(0,))
        self._tick_fns[has_pref] = fn
        return fn

    def sharding(self, batched_pytree):
        """NamedSharding placement for a batched pytree (leading scenario axis)."""
        sh = NamedSharding(self.mesh, P("scenario"))
        return jax.device_put(batched_pytree, sh)

    def prefactor(self, paths, weights, x_phi_d):
        """Sharded per-scenario QR prefactor (solver.QrPrefactor batch)."""
        f = jax.jit(jax.vmap(
            lambda pm, w, x: solver_mod.make_prefactor(
                self.cfg, pm, w, x, dtype=self.dtype)
        ))
        return self.sharding(f(paths.phi_max, weights, x_phi_d))

    def tick(self, states, paths, weights, x_phi_d, pref=None):
        if pref is None:
            return self._get_tick(False)(states, paths, weights, x_phi_d)
        return self._get_tick(True)(states, paths, weights, x_phi_d, pref)

    def _get_stream(self, n_ticks: int):
        if n_ticks in self._stream_fns:
            return self._stream_fns[n_ticks]
        from . import stream as stream_mod

        fn = stream_mod.make_stream_fn(self.cfg, self.scfg, n_ticks,
                                       dtype=self.dtype)

        def shard_stream(states, paths, weights, x_phi_d, pref):
            # Each device runs its OWN fused async while_loop over its local
            # lanes: a slow lane on one chip never stalls another chip.
            # NO collective lives in this program — per-device trip counts
            # differ WILDLY by design (that is the executor's point), and a
            # trailing all-reduce here makes early-finishing devices sit in
            # a collective rendezvous for the duration of the slowest
            # device's loop (the XLA CPU runtime aborts after 40 s; on TPU
            # it would serialize the mesh on the stragglers).  Metric
            # reduction runs as a separate short program (shard_metrics)
            # whose rendezvous skew is dispatch jitter, not loop skew.
            new_states, out = fn(states, paths, weights, x_phi_d, pref)
            # Per-device scalar loop count -> length-1 shard so it crosses
            # the shard_map boundary as a (n_devices,) global array.
            return new_states, out._replace(n_loop=out.n_loop[None])

        metric_keys = ("n_success", "n_live", "n_dead", "total_iters",
                       "max_viol", "mean_phi", "n_loop")

        def shard_metrics(dead_in, new_states, out):
            # Live mask matches FleetRunner.run_stream: out.dead is
            # dead-AFTER-tick, so shift by one tick (pre-call dead for tick
            # 0) — the death tick's row, typically the violation that
            # killed the lane, stays counted; later ticks of a dead lane
            # are a stopped robot.
            live = ~jnp.concatenate([dead_in[None], out.dead[:-1]], axis=0)
            return {
                "n_success": jax.lax.psum(
                    jnp.sum((out.success & live).astype(jnp.int32)),
                    "scenario"),
                # Live lane-tick count: the success_rate denominator under
                # the FleetStats contract (success_rate = n_success/n_live
                # — dead lanes always record success=False and must not
                # drag the rate).
                "n_live": jax.lax.psum(
                    jnp.sum(live.astype(jnp.int32)), "scenario"),
                "n_dead": jax.lax.psum(
                    jnp.sum(new_states.dead.astype(jnp.int32)), "scenario"),
                "total_iters": jax.lax.psum(jnp.sum(out.iters), "scenario"),
                "max_viol": jax.lax.pmax(
                    jnp.max(jnp.where(live, out.viol, 0.0)), "scenario"),
                "mean_phi": jax.lax.pmean(jnp.mean(new_states.phi),
                                          "scenario"),
                # Per-device loop trip counts DIFFER; report the ICI-summed
                # total as the executed-work unit (out.n_loop arrives as
                # this device's length-1 shard).
                "n_loop": jax.lax.psum(jnp.sum(out.n_loop), "scenario"),
            }

        out_stream_spec = stream_mod.StreamOut(
            success=P(None, "scenario"), viol=P(None, "scenario"),
            iters=P(None, "scenario"), phi=P(None, "scenario"),
            dphi=P(None, "scenario"), error_count=P(None, "scenario"),
            dead=P(None, "scenario"), n_loop=P("scenario"))
        sharded = jax.shard_map(
            shard_stream,
            mesh=self.mesh,
            in_specs=(P("scenario"),) * 5,
            out_specs=(P("scenario"), out_stream_spec),
            check_vma=False,
        )
        metrics_fn = jax.shard_map(
            shard_metrics,
            mesh=self.mesh,
            in_specs=(P("scenario"), P("scenario"), out_stream_spec),
            out_specs={k: P() for k in metric_keys},
            check_vma=False,
        )
        pair = (jax.jit(sharded, donate_argnums=(0,)), jax.jit(metrics_fn))
        self._stream_fns[n_ticks] = pair
        return pair

    def stream(self, states, paths, weights, x_phi_d, pref, n_ticks: int):
        """Run ``n_ticks`` control periods through the async stream executor
        (stream.py) sharded over the scenario mesh.  Returns
        (states', StreamOut, metrics) — StreamOut series are time-major
        (K, B) like the single-mesh executor; metrics are ICI-reduced fleet
        aggregates computed in a follow-up short program (see shard_stream
        for why the reduction must not ride inside the skewed loops).
        StreamOut.n_loop is per-device sharded in the raw output; the
        metrics dict carries the global sum."""
        run_fn, metrics_fn = self._get_stream(n_ticks)
        # Copy: `states` is donated to run_fn; the pre-call dead flags are
        # needed afterwards for the live-mask metric.
        dead_in = jnp.array(states.dead)
        new_states, out = run_fn(states, paths, weights, x_phi_d, pref)
        metrics = metrics_fn(dead_in, new_states, out)
        out = out._replace(n_loop=metrics["n_loop"])
        return new_states, out, metrics


def make_train_step_like(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                         mesh: Mesh, dtype=jnp.float32):
    """The full sharded step as a raw jittable callable (used by
    __graft_entry__.dryrun_multichip)."""
    eng = ShardedEngine(cfg, scfg, mesh, dtype=dtype)
    return eng
