"""Stream executor: asynchronous multi-tick fleet serving.

The throughput problem it solves: `batch.make_scanned_ticks` runs every
control tick as a `vmap`'d solver `while_loop`, which XLA executes in
LOCKSTEP — the whole batch iterates until the SLOWEST lane of that tick
converges.  Measured on-chip (experiments/prof_stragglers.py): the mean lane
needs ~7 GN iterations per tick but the p50 tick burns the full 40-iteration
budget because a handful of 256 lanes are slow, so ~80% of the chip's work
is masked-out waste.

Here the ticks of all lanes advance through ONE fused `lax.while_loop`:
every loop iteration applies one GN step to every lane still solving; a lane
whose solve just converged immediately COMMITS its tick (success gate,
fallback, plant advance — engine.postsolve) and SETS UP its next one
(window slide, parameter assembly, warm-start policy — engine.presolve)
inside the same iteration, `where`-masked per lane.  Lanes never wait for
each other: total work drops from sum over ticks of (B x max-lane-iters) to
sum over lanes of their OWN per-tick needs, a ~3x reduction at B=256.

The per-lane numerics are IDENTICAL to the sequential `engine.tick` path —
presolve/postsolve and the GN stepper are shared code, and
`tests/test_stream.py` asserts trajectory equality against
`make_scanned_ticks`.  The one intentional deviation: a DEAD lane
(engine dead-freeze semantics) skips its solve entirely (`done` forced at
setup) instead of burning max_iters on a frozen state — its outputs
(success=False, frozen state) are unchanged.

This is the TPU-native analog of the reference's real-time economics: one
Ipopt process per robot converges in however many iterations IT needs
(BoundMPC.py:446-453); nothing in the reference couples one robot's solve
time to another's, and the lockstep batch artificially did.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import engine, jerkint, kinematics, ocp, solver as solver_mod
from .path import PathData


class StreamOut(NamedTuple):
    """Per-tick records, time-major (K, B) like make_scanned_ticks, plus the
    executed loop-iteration count (the work unit for MFU accounting: every
    loop iteration executes one batched GN step for ALL B lanes)."""

    success: jnp.ndarray  # (K, B) bool
    viol: jnp.ndarray  # (K, B)
    iters: jnp.ndarray  # (K, B) int32
    phi: jnp.ndarray  # (K, B) path progress after each tick
    dphi: jnp.ndarray  # (K, B) path speed after each tick
    error_count: jnp.ndarray  # (K, B) int32 consecutive-failure counter
    dead: jnp.ndarray  # (K, B) bool — lane stopped at/before this tick
    n_loop: jnp.ndarray  # () int32 — global loop iterations executed


class StreamCarry(NamedTuple):
    states: engine.EngineState  # (B, ...) engine state per lane
    ls: solver_mod.LoopState  # (B, ...) current solve iteration state
    ctx: solver_mod.StepCtx  # (B, ...) current tick's solve context
    t: jnp.ndarray  # (B,) int32 — ticks committed per lane
    i: jnp.ndarray  # () int32 — global loop iterations (for MFU accounting)
    succ: jnp.ndarray  # (B, K) bool
    viol: jnp.ndarray  # (B, K)
    iters: jnp.ndarray  # (B, K) int32
    phi: jnp.ndarray  # (B, K)
    dphi: jnp.ndarray  # (B, K)
    errc: jnp.ndarray  # (B, K) int32
    dead: jnp.ndarray  # (B, K)


def _bwhere(mask, new, old):
    """Per-lane select with broadcasting over trailing axes."""
    m = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(m, new, old)


def make_stream_fn(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                   n_ticks: int, dtype=jnp.float32,
                   cohort: int | None = None):
    """UNJITTED stream executor body for ``n_ticks`` control periods.

    fn(states, paths, weights (B, 15), x_phi_d (B, 3), pref) ->
    (states', StreamOut) — the same signature and output layout as
    `batch.make_scanned_ticks`, so the fleet runner and bench can swap
    executors.  ``pref`` (batched QrPrefactor) is required: the per-lane
    solve context is re-built every tick inside the loop and must not
    re-factor the linear block there.

    ``cohort``: minimum number of finished lanes required to trigger the
    (whole-batch-cost) commit phase; None -> max(1, B // 16).  Per-lane
    numerics are cohort-invariant (see the commit_phase comment); 1
    reproduces the round-4 commit-on-any-done behavior.

    Exposed unjitted so `distributed.ShardedEngine.stream` can wrap it in
    `shard_map` — each device then runs its OWN fused while_loop over its
    local lanes, so straggler coupling never crosses ICI; use
    `make_stream_ticks` for the single-mesh jitted form.
    """
    K = n_ticks
    cohort_arg = cohort
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = kinematics.robot_limits()
    limits = jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray)
        else a, limits
    )

    def presolve_lane(state, path, w, x, pref1):
        state, params, mu0, reg0 = engine.presolve(cfg, scfg, state, path,
                                                   w, x, coeffs=coeffs,
                                                   limits=limits)
        ctx = solver_mod.make_ctx(cfg, coeffs, params,
                                  solver_mod.QrPrefactor(*pref1), dtype)
        ls = solver_mod.init_loop(scfg, state.u_warm, mu0=mu0, reg0=reg0)
        # Dead lanes skip their solve: postsolve freezes their state and
        # reports success=False either way (engine dead semantics), so
        # burning max_iters on the frozen warm start is pure waste.
        ls = ls._replace(done=ls.done | state.dead)
        return state, ctx, ls

    def commit_lane(state, path, w, x, pref1, ls, ctx):
        u_opt, stats = solver_mod.finish(cfg, coeffs, ctx.params, limits, ls)
        new_state, out = engine.postsolve(cfg, scfg, coeffs, state, path,
                                          ctx.params, u_opt, stats,
                                          limits=limits)
        state2, ctx2, ls2 = presolve_lane(new_state, path, w, x, pref1)
        return (state2, ctx2, ls2, out.success, stats.viol, stats.iters,
                new_state.phi, new_state.dphi, out.error_count,
                new_state.dead)

    def stream(states: engine.EngineState, paths: PathData,
               weights: jnp.ndarray, x_phi_d: jnp.ndarray,
               pref: solver_mod.QrPrefactor):
        B = states.phi.shape[0]
        cohort = cohort_arg if cohort_arg is not None else max(1, B // 16)
        step = solver_mod.make_stepper(cfg, scfg, coeffs, limits, dtype)
        pref_t = (pref.R0, pref.Q0T)

        states0, ctx0, ls0 = jax.vmap(presolve_lane)(
            states, paths, weights, x_phi_d, pref_t)
        carry0 = StreamCarry(
            states=states0, ls=ls0, ctx=ctx0,
            t=jnp.zeros(B, jnp.int32),
            i=jnp.zeros((), jnp.int32),
            succ=jnp.zeros((B, K), bool),
            viol=jnp.zeros((B, K), dtype),
            iters=jnp.zeros((B, K), jnp.int32),
            phi=jnp.zeros((B, K), dtype),
            dphi=jnp.zeros((B, K), dtype),
            errc=jnp.zeros((B, K), jnp.int32),
            dead=jnp.zeros((B, K), bool),
        )

        def cond(c: StreamCarry):
            return jnp.any(c.t < K)

        def body(c: StreamCarry) -> StreamCarry:
            active = c.t < K
            live = active & ~c.ls.done & (c.ls.k < scfg.max_iters)
            ls1 = jax.vmap(step)(c.ls, c.ctx)
            ls = jax.tree.map(lambda a, b: _bwhere(live, a, b), ls1, c.ls)
            solve_done = active & (ls.done | (ls.k >= scfg.max_iters))

            def commit_phase(c, ls):
                (st2, ctx2, ls2, succ1, viol1, iters1, phi1, dphi1, errc1,
                 dead1) = jax.vmap(commit_lane)(
                    c.states, paths, weights, x_phi_d, pref_t, ls, c.ctx)
                sel = lambda new, old: jax.tree.map(
                    lambda a, b: _bwhere(solve_done, a, b), new, old)
                lanes = jnp.arange(B)
                rec = lambda arr, v: arr.at[lanes, c.t].set(
                    jnp.where(solve_done, v, arr[lanes, c.t]),
                    mode="drop")
                return StreamCarry(
                    states=sel(st2, c.states),
                    ls=sel(ls2, ls),
                    ctx=sel(ctx2, c.ctx),
                    t=jnp.where(solve_done, c.t + 1, c.t),
                    i=c.i,
                    succ=rec(c.succ, succ1),
                    viol=rec(c.viol, viol1),
                    iters=rec(c.iters, iters1),
                    phi=rec(c.phi, phi1),
                    dphi=rec(c.dphi, dphi1),
                    errc=rec(c.errc, errc1),
                    dead=rec(c.dead, dead1),
                )

            def skip_phase(c, ls):
                return c._replace(ls=ls)

            # Cohort commit (the B>=1024 scaling fix): the commit phase runs
            # the full vmapped commit_lane — presolve + postsolve + FK
            # rollouts — over ALL B lanes, so invoking it on every loop
            # iteration where *any* lane finishes makes commits the dominant
            # cost at large B (at B>=1024 some lane finishes essentially
            # every iteration; measured r4: 512 -> 1902, 1024 -> 1115
            # solves/s).  Batching commits until >= ``cohort`` lanes are
            # pending amortizes that cost ~cohort-fold.  A pending lane just
            # waits (its GN stepping is masked off), so per-lane NUMERICS are
            # unchanged — only the interleaving of commits shifts, which is
            # invisible outside the loop (lanes are independent).  Commits
            # are forced when no lane is still solving (otherwise: deadlock).
            n_pending = jnp.sum(solve_done.astype(jnp.int32))
            still_solving = jnp.any(active & ~solve_done
                                    & (ls.k < scfg.max_iters))
            commit_now = (n_pending >= cohort) | (
                (n_pending > 0) & ~still_solving)
            c2 = jax.lax.cond(commit_now, commit_phase, skip_phase, c, ls)
            return c2._replace(i=c.i + 1)

        out = jax.lax.while_loop(cond, body, carry0)
        return out.states, StreamOut(success=out.succ.T, viol=out.viol.T,
                                     iters=out.iters.T, phi=out.phi.T,
                                     dphi=out.dphi.T, error_count=out.errc.T,
                                     dead=out.dead.T, n_loop=out.i)

    def stream_prec(states, paths, weights, x_phi_d, pref):
        # Same trace-time matmul-precision contract as engine.tick.
        with jax.default_matmul_precision("float32"):
            return stream(states, paths, weights, x_phi_d, pref)

    return stream_prec


def make_stream_ticks(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                      n_ticks: int, dtype=jnp.float32, donate: bool = True,
                      cohort: int | None = None):
    """Jitted single-mesh stream executor (see `make_stream_fn`)."""
    fn = make_stream_fn(cfg, scfg, n_ticks, dtype=dtype, cohort=cohort)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
