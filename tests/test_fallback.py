"""Failure-injection: the infeasible-solve fallback state machine
(BoundMPC.py:460-506 semantics, vectorized as masks)."""
import numpy as np
import jax
import jax.numpy as jnp

from boundmpc_tpu import engine, jerkint, kinematics, ocp, solver as solver_mod
from boundmpc_tpu.runtime import experiment1


def _setup(scfg):
    sc = experiment1()
    cfg = ocp.OcpConfig()
    path = sc.build(dtype=np.float64)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float64)
    limits = kinematics.robot_limits()
    weights = jnp.asarray(sc.weights)
    x_phi_d = jnp.asarray([float(path.phi_max) - 1e-4, 0.0, 0.0])
    state = engine.init_state(cfg, sc.q0, dtype=jnp.float64)
    tick = jax.jit(lambda st: engine.tick(cfg, scfg, coeffs, limits, st, path,
                                          weights, x_phi_d))
    return cfg, state, tick


def _failing_solver(cfg):
    """A solve_fn that always returns an (infeasible, non-converged) result."""
    def solve_fn(params, u_warm):
        u = jnp.full_like(u_warm, 100.0)  # violates jerk box massively
        stats = solver_mod.SolveStats(
            iters=jnp.asarray(1, jnp.int32),
            converged=jnp.asarray(False),
            obj=jnp.asarray(jnp.inf, u_warm.dtype),
            viol=jnp.asarray(1e6, u_warm.dtype),
        )
        return u, stats
    return solve_fn


def test_fallback_replays_previous_plan():
    sc = experiment1()
    cfg = ocp.OcpConfig()
    path = sc.build(dtype=np.float64)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float64)
    limits = kinematics.robot_limits()
    weights = jnp.asarray(sc.weights)
    x_phi_d = jnp.asarray([float(path.phi_max) - 1e-4, 0.0, 0.0])
    state = engine.init_state(cfg, sc.q0, dtype=jnp.float64)
    scfg = solver_mod.SolverConfig()

    # A few healthy ticks to establish a previous plan
    for _ in range(3):
        state, out = engine.tick(cfg, scfg, coeffs, limits, state, path,
                                 weights, x_phi_d)
    assert bool(out.success)
    u_warm_before = np.asarray(state.u_warm)

    # Now inject failures: the engine must replay the shifted previous plan
    fail = _failing_solver(cfg)
    state_f, out_f = engine.tick(cfg, scfg, coeffs, limits, state, path,
                                 weights, x_phi_d, solve_fn=fail)
    assert not bool(out_f.success)
    assert int(out_f.error_count) == 1
    np.testing.assert_allclose(np.asarray(out_f.u), u_warm_before)
    assert not bool(state_f.dead)

    # N consecutive failures -> dead (BoundMPC.py:498-506)
    st = state
    for k in range(cfg.N):
        st, o = engine.tick(cfg, scfg, coeffs, limits, st, path, weights,
                            x_phi_d, solve_fn=fail)
    assert int(o.error_count) == cfg.N
    assert bool(st.dead)


def test_first_failure_without_prev_uses_infeasible():
    """Reference :479-489: with no previous solution the infeasible solution
    is used anyway and error_count resets."""
    sc = experiment1()
    cfg = ocp.OcpConfig()
    path = sc.build(dtype=np.float64)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float64)
    limits = kinematics.robot_limits()
    weights = jnp.asarray(sc.weights)
    x_phi_d = jnp.asarray([float(path.phi_max) - 1e-4, 0.0, 0.0])
    state = engine.init_state(cfg, sc.q0, dtype=jnp.float64)
    scfg = solver_mod.SolverConfig()

    fail = _failing_solver(cfg)
    state_f, out_f = engine.tick(cfg, scfg, coeffs, limits, state, path,
                                 weights, x_phi_d, solve_fn=fail)
    assert not bool(out_f.success)
    assert int(out_f.error_count) == 0  # reset per reference :483
    # infeasible solution executed
    np.testing.assert_allclose(np.asarray(out_f.u), 100.0)
