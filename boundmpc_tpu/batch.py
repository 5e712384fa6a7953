"""Scenario batching: thousands of independent MPC loops per chip.

The reference runs ONE controller per process (SURVEY.md §2.4); here the
scenario axis is the throughput axis demanded by BASELINE.json.  Everything
in `engine.tick` is a pure function of per-scenario pytrees, so batching is
a single `vmap` — the dense 80x80 KKT factorizations become batched MXU
work, and per-scenario success/fallback masks vectorize the reference's
infeasible-solve handling (BoundMPC.py:460-506) with `where` selects.
"""
from __future__ import annotations

from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from . import engine, jerkint, kinematics, ocp, solver as solver_mod
from .path import PathData


def stack_paths(paths: List[PathData]) -> PathData:
    """Stack same-capacity PathData pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *paths)


def batched_init_state(cfg: ocp.OcpConfig, q0s: jnp.ndarray,
                       dtype=jnp.float32) -> engine.EngineState:
    """(B, 7) initial joint configurations -> batched EngineState.

    jit is load-bearing: an eager vmap dispatches init_state's unrolled FK
    op-by-op through the TPU tunnel (~25 ms per op)."""
    f = jax.jit(jax.vmap(lambda q: engine.init_state(cfg, q, dtype=dtype)))
    return f(jnp.asarray(q0s, dtype))


def make_prefactor_batch(cfg: ocp.OcpConfig, paths: PathData,
                         weights: jnp.ndarray, x_phi_d: jnp.ndarray,
                         dtype=jnp.float32) -> solver_mod.QrPrefactor:
    """Per-scenario setup-time QR prefactor of the tick-constant linear
    residual block (solver.QrPrefactor) — one batched 320 x n QR, ONCE per
    fleet, instead of once per tick."""
    f = jax.jit(jax.vmap(
        lambda pm, w, x: solver_mod.make_prefactor(cfg, pm, w, x, dtype=dtype)
    ))
    return f(paths.phi_max, weights, x_phi_d)


def make_batched_tick(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                      dtype=jnp.float32, donate: bool = True):
    """jit(vmap(tick)) over (state, path, weights, x_phi_d[, pref]).

    Returns tick_b(states, paths, weights (B, 15), x_phi_d (B, 3),
    pref=None) -> (states', TickOut batched).  Pass the batched
    `make_prefactor_batch` result as ``pref`` to skip the per-tick linear
    QR.  State buffers are donated so the carried solve state stays in HBM
    without copies.
    """
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = kinematics.robot_limits()
    limits = jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray)
        else a, limits
    )

    tick1 = partial(engine.tick, cfg, scfg, coeffs, limits)

    def vtick(states, paths, weights, x_phi_d, pref=None):
        axes = (0, 0, 0, 0, None, 0 if pref is not None else None)
        return jax.vmap(tick1, in_axes=axes)(states, paths, weights,
                                             x_phi_d, None, pref)

    return jax.jit(vtick, donate_argnums=(0,) if donate else (),
                   static_argnames=())


def make_scanned_ticks(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                       n_ticks: int, dtype=jnp.float32):
    """``n_ticks`` batched control periods fused into ONE jitted program via
    `lax.scan` — host dispatch (measured ~25-30 ms per call through the TPU
    tunnel) amortizes to zero, which is how a production serving loop would
    run.  Returns fn(states, paths, weights, x_phi_d, pref=None) ->
    (states', (success (K, B), viol (K, B), iters (K, B)))."""
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = kinematics.robot_limits()
    limits = jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray)
        else a, limits
    )
    tick1 = partial(engine.tick, cfg, scfg, coeffs, limits)

    def many(states, paths, weights, x_phi_d, pref=None):
        axes = (0, 0, 0, 0, None, 0 if pref is not None else None)
        vtick = jax.vmap(tick1, in_axes=axes)

        def body(s, _):
            s, out = vtick(s, paths, weights, x_phi_d, None, pref)
            return s, (out.success, out.stats.viol, out.stats.iters)

        return jax.lax.scan(body, states, None, length=n_ticks)

    return jax.jit(many, donate_argnums=(0,))
