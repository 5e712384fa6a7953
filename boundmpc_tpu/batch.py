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
    """(B, 7) initial joint configurations -> batched EngineState."""
    return jax.vmap(lambda q: engine.init_state(cfg, q, dtype=dtype))(
        jnp.asarray(q0s, dtype)
    )


def make_batched_tick(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                      dtype=jnp.float32, donate: bool = True):
    """jit(vmap(tick)) over (state, path, weights, x_phi_d).

    Returns tick_b(states, paths, weights (B, 15), x_phi_d (B, 3))
    -> (states', TickOut batched).  State buffers are donated so the carried
    solve state stays in HBM without copies.
    """
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = kinematics.robot_limits()
    limits = jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray)
        else a, limits
    )

    tick1 = partial(engine.tick, cfg, scfg, coeffs, limits)
    vtick = jax.vmap(tick1, in_axes=(0, 0, 0, 0))
    return jax.jit(vtick, donate_argnums=(0,) if donate else ())


def make_scanned_ticks(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
                       n_ticks: int, dtype=jnp.float32):
    """``n_ticks`` batched control periods fused into ONE jitted program via
    `lax.scan` — host dispatch (measured ~25-30 ms per call through the TPU
    tunnel) amortizes to zero, which is how a production serving loop would
    run.  Returns fn(states, paths, weights, x_phi_d) ->
    (states', (success (K, B), viol (K, B), iters (K, B)))."""
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = kinematics.robot_limits()
    limits = jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray)
        else a, limits
    )
    tick1 = partial(engine.tick, cfg, scfg, coeffs, limits)
    vtick = jax.vmap(tick1, in_axes=(0, 0, 0, 0))

    def many(states, paths, weights, x_phi_d):
        def body(s, _):
            s, out = vtick(s, paths, weights, x_phi_d)
            return s, (out.success, out.stats.viol, out.stats.iters)

        return jax.lax.scan(body, states, None, length=n_ticks)

    return jax.jit(many, donate_argnums=(0,))
