"""scipy-SLSQP golden solver over the condensed OCP (float64, host)."""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from .. import jerkint, kinematics, ocp, solver as solver_mod


class OracleSolver:
    """Solves the same condensed NLP as boundmpc_tpu.solver but with scipy
    SLSQP — an implementation-independent optimum for parity checks."""

    def __init__(self, cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs,
                 limits: kinematics.RobotLimits, maxiter: int = 200):
        self.cfg = cfg
        self.coeffs = coeffs
        self.limits = limits
        self.maxiter = maxiter
        N, nu = cfg.N, cfg.nr_joints + 1
        self.n = N * nu

        def f(params, u_flat):
            ev = ocp.evaluate_stages(cfg, coeffs, params, u_flat.reshape(N, nu))
            return ocp.objective(cfg, params, ev, u_flat.reshape(N, nu))

        def c(params, u_flat):
            ev = ocp.evaluate_stages(cfg, coeffs, params, u_flat.reshape(N, nu))
            return -ocp.full_constraints(cfg, params, ev, u_flat.reshape(N, nu), limits)

        self._f = jax.jit(f)
        self._g = jax.jit(jax.grad(f, argnums=1))
        self._c = jax.jit(c)
        self._Jc = jax.jit(jax.jacfwd(c, argnums=1))

    def __call__(self, params: ocp.OcpParams, u0: jnp.ndarray):
        u0_flat = np.asarray(u0, dtype=np.float64).reshape(-1)
        fun = lambda u: float(self._f(params, jnp.asarray(u)))
        jac = lambda u: np.asarray(self._g(params, jnp.asarray(u)))
        cons = {
            "type": "ineq",
            "fun": lambda u: np.asarray(self._c(params, jnp.asarray(u))),
            "jac": lambda u: np.asarray(self._Jc(params, jnp.asarray(u))),
        }
        res = minimize(
            fun, u0_flat, jac=jac, constraints=[cons], method="SLSQP",
            options={"maxiter": self.maxiter, "ftol": 1e-10},
        )
        u_opt = jnp.asarray(res.x.reshape(self.cfg.N, -1))
        ev = ocp.evaluate_stages(self.cfg, self.coeffs, params, u_opt)
        cfin = ocp.full_constraints(self.cfg, params, ev, u_opt, self.limits)
        viol = jnp.sum(jnp.where(cfin > 1e-6, cfin, 0.0))
        stats = solver_mod.SolveStats(
            iters=jnp.asarray(res.nit, jnp.int32),
            converged=jnp.asarray(bool(res.success)),
            obj=jnp.asarray(float(res.fun)),
            viol=viol,
        )
        return u_opt, stats


def oracle_runner(scenario, capacity=None, maxiter: int = 200):
    """ClosedLoopRunner whose per-tick solve is the SLSQP oracle."""
    from ..runtime.runner import ClosedLoopRunner
    from .. import engine

    r = ClosedLoopRunner(scenario, dtype=jnp.float64, capacity=capacity)
    oracle = OracleSolver(r.cfg, r.coeffs, r.limits, maxiter=maxiter)
    r._tick = partial(
        engine.tick, r.cfg, r.scfg, r.coeffs, r.limits, solve_fn=oracle
    )
    # engine.tick's keyword-only pieces: path/weights/x_phi_d stay positional
    # (pref is accepted and ignored — the oracle solve has no QR prefactor)
    def tick(state, path, weights, x_phi_d, pref=None):
        return engine.tick(r.cfg, r.scfg, r.coeffs, r.limits, state, path,
                           weights, x_phi_d, solve_fn=oracle)

    r._tick = tick
    return r
