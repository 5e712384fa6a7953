"""The reduced QR stack (method="qr") must match the full stack exactly.

The row reduction (affine residual rows pre-factored, box pairs merged;
solver.py) claims IDENTICAL normal equations.  These tests verify the claim
end-to-end in float64: identical solve results at machine precision, and
identical closed-loop trajectories.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from boundmpc_tpu import engine, solver as solver_mod
from boundmpc_tpu.runtime import ClosedLoopRunner, experiment1, experiment2


def _solve_both(scenario, ticks):
    r = ClosedLoopRunner(scenario)
    if ticks:
        r.run(max_ticks=ticks)
    params = engine.assemble_params(r.cfg, r.state, r.path, r.weights,
                                    r.x_phi_d)
    u_red, s_red = solver_mod.solve(
        r.cfg, r.scfg._replace(method="qr"), r.coeffs, params,
        r.state.u_warm, r.limits)
    u_full, s_full = solver_mod.solve(
        r.cfg, r.scfg._replace(method="qr_full"), r.coeffs, params,
        r.state.u_warm, r.limits)
    return u_red, s_red, u_full, s_full


@pytest.mark.slow
def test_reduced_stack_matches_full_cold():
    u_red, s_red, u_full, s_full = _solve_both(experiment1(), ticks=0)
    # identical algebra -> identical iterates up to f64 rounding noise
    np.testing.assert_allclose(np.asarray(u_red), np.asarray(u_full),
                               rtol=1e-6, atol=1e-7)
    assert int(s_red.iters) == int(s_full.iters)
    assert abs(float(s_red.obj) - float(s_full.obj)) < 1e-6


@pytest.mark.slow
def test_reduced_stack_matches_full_corridor_midrun():
    u_red, s_red, u_full, s_full = _solve_both(experiment2(), ticks=12)
    np.testing.assert_allclose(np.asarray(u_red), np.asarray(u_full),
                               rtol=1e-5, atol=1e-6)
    assert abs(float(s_red.obj) - float(s_full.obj)) < 1e-5
