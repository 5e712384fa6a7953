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


def test_acceptable_failure_executes_fresh_plan():
    """A failing solve with NEAR-FEASIBLE violation (< SolverConfig.
    viol_exec) must execute its FRESH plan — not the stale shifted fallback
    — while still counting as a failure and leaving the safe-plan buffer
    untouched.  Replaying stale plans on marginal misses was the measured
    death-spiral mechanism (each shift drives the plant off the solution
    manifold until the NLP is infeasible in any precision)."""
    sc = experiment1()
    cfg = ocp.OcpConfig()
    path = sc.build(dtype=np.float64)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float64)
    limits = kinematics.robot_limits()
    weights = jnp.asarray(sc.weights)
    x_phi_d = jnp.asarray([float(path.phi_max) - 1e-4, 0.0, 0.0])
    state = engine.init_state(cfg, sc.q0, dtype=jnp.float64)
    scfg = solver_mod.SolverConfig()

    for _ in range(3):
        state, out = engine.tick(cfg, scfg, coeffs, limits, state, path,
                                 weights, x_phi_d)
    assert bool(out.success)
    u_safe_before = np.asarray(state.u_safe)

    marker = jnp.full((cfg.N, cfg.nr_joints + 1), 0.123, jnp.float64)

    def near_feasible_fail(params, u_warm):
        stats = solver_mod.SolveStats(
            iters=jnp.asarray(1, jnp.int32),
            converged=jnp.asarray(False),
            obj=jnp.asarray(1.0, u_warm.dtype),
            viol=jnp.asarray(1e-3, u_warm.dtype),  # < viol_exec, > gate
        )
        return marker, stats

    state_f, out_f = engine.tick(cfg, scfg, coeffs, limits, state, path,
                                 weights, x_phi_d, solve_fn=near_feasible_fail)
    assert not bool(out_f.success)
    assert int(out_f.error_count) == 1
    # fresh near-feasible plan EXECUTED...
    np.testing.assert_allclose(np.asarray(out_f.u), 0.123)
    # ...but the safe buffer holds only gated plans (shift of the previous)
    expected_safe = np.concatenate([u_safe_before[1:], u_safe_before[-1:]])
    np.testing.assert_allclose(np.asarray(state_f.u_safe), expected_safe)

    # A HARD failure right after must fall back to that safe plan
    hard = _failing_solver(cfg)
    state_h, out_h = engine.tick(cfg, scfg, coeffs, limits, state_f, path,
                                 weights, x_phi_d, solve_fn=hard)
    assert not bool(out_h.success)
    assert int(out_h.error_count) == 2
    np.testing.assert_allclose(np.asarray(out_h.u),
                               np.asarray(state_f.u_safe))


def test_deep_failure_cold_restart_recovers():
    """Two consecutive failures trigger the cold-restart tier: the poisoned
    warm chain is discarded and the solver re-seeds from u_safe (the last
    GATED plan) under the mu_shift shock continuation — the lane recovers
    instead of death-spiraling (the bench-r4 postmortem mechanism;
    engine.presolve `deep` tier)."""
    sc = experiment1()
    cfg = ocp.OcpConfig()
    path = sc.build(dtype=np.float64)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float64)
    limits = kinematics.robot_limits()
    weights = jnp.asarray(sc.weights)
    x_phi_d = jnp.asarray([float(path.phi_max) - 1e-4, 0.0, 0.0])
    state = engine.init_state(cfg, sc.q0, dtype=jnp.float64)
    scfg = solver_mod.SolverConfig()

    for _ in range(6):
        state, out = engine.tick(cfg, scfg, coeffs, limits, state, path,
                                 weights, x_phi_d)
    assert bool(out.success)

    # Poison the warm chain the way a death spiral does: the warm start
    # holds garbage (diverged fresh solves chained into it) while u_safe
    # still holds the last gated plan, with two failures on the counter.
    rng = np.random.default_rng(7)
    garbage = jnp.asarray(
        rng.uniform(-40.0, 40.0, size=state.u_warm.shape), jnp.float64)
    poisoned = state._replace(u_warm=garbage,
                              error_count=jnp.asarray(2, jnp.int32))

    # The cold-restart tier must re-seed the solver from u_safe: the tick
    # succeeds and the lane's failure counter clears.
    st2, out2 = engine.tick(cfg, scfg, coeffs, limits, poisoned, path,
                            weights, x_phi_d)
    assert bool(out2.success), \
        f"cold restart failed: viol {float(out2.stats.viol):.3e}"
    assert int(st2.error_count) == 0
    assert not bool(st2.dead)

    # The pinned contract: the tier itself re-seeds u_warm from the safe
    # plan under the ordinary shock continuation.
    st_pre, _, mu0, _ = engine.presolve(cfg, scfg, poisoned, path, weights,
                                        x_phi_d)
    np.testing.assert_allclose(np.asarray(st_pre.u_warm),
                               np.asarray(poisoned.u_safe))
    assert float(mu0) == scfg.mu_shift
    # ...and fires only at EXACTLY the second failure (a third failure
    # resumes the ordinary warm-chain policy instead of re-diverging a
    # mid-recovery lane).
    st_pre3, _, mu3, _ = engine.presolve(
        cfg, scfg, poisoned._replace(error_count=jnp.asarray(3, jnp.int32)),
        path, weights, x_phi_d)
    np.testing.assert_allclose(np.asarray(st_pre3.u_warm),
                               np.asarray(garbage))
    assert float(mu3) == scfg.mu_shift


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
