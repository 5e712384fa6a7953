"""The reference's full stage-variable NLP as a float64 host oracle.

The condensed engine (ocp.py) eliminates all stage states analytically; a
formulation bug there (wrong weight index, wrong constraint sign, wrong
integration constant) would be invisible to oracles that reuse the condensed
formulation.  This module rebuilds the NLP **the way the reference writes
it** — `casadi_ocp_formulation.py:88-357`: 44 decision variables and 43
constraints per stage (N=10, nr_segs=4 => 440 vars / 430 constraints),
dynamics imposed as 36 equality constraints per stage via the exact
triangle-basis integration step + FK coupling
(`bound_mpc_functions.py:249-295`) — and solves it with scipy SLSQP in
float64 with analytic Jacobians.

Per-stage variable layout (reference read-back order, BoundMPC.py:514-524):
    [0:7]   u      joint jerk knots
    [7]     u_phi  path-parameter jerk knot
    [8:15]  q      [15:22] dq   [22:29] ddq
    [29:35] p      EE pose [position ; integrated omega]
    [35:41] v      EE twist
    [41]    phi    [42] dphi    [43] ddphi

Bound boxes (casadi_ocp_formulation.py:93-153): u in [u_min, u_max], q/dq in
joint limits, phi >= 0, everything else free.

Per-stage constraints in order (casadi_ocp_formulation.py:267-349):
    36 dynamics equalities (q, dq, ddq 7 each; p, v 6 each; phi chain 3)
    phi_k - phi_max <= 0,  dphi_k - dphi_max <= 0
    tangential orientation:  (dp_normed . e_r_par)^2 - r_par_bound^2 <= 0
    orthogonal position (2): (e_p . bp_i - off_i)^2 - bound_i^2 <= 0
    orthogonal orientation (2): (br_i . e_r_orth_i - off_i)^2 - bound_i^2 <= 0
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from .. import jerkint, kinematics, ocp, solver as solver_mod


class RefNlpSolver:
    """Solve the reference's 440-var stage NLP; plugs into engine.tick via
    ``solve_fn(params, u_warm) -> (u_opt, SolveStats)``."""

    NX = 44  # stage variable count (BoundMPC.py:108)

    def __init__(self, cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs,
                 limits: kinematics.RobotLimits, maxiter: int = 150):
        assert cfg.nr_joints == 7
        self.cfg = cfg
        self.coeffs = coeffs
        self.limits = limits
        self.maxiter = maxiter
        N = cfg.N
        self.n = N * self.NX

        def unpack(x):
            s = x.reshape(N, self.NX)
            u = jnp.concatenate([s[:, 0:7], s[:, 7:8]], axis=1)  # (N, 8)
            traj = ocp.Trajectory(
                q=s[:, 8:15], dq=s[:, 15:22], ddq=s[:, 22:29],
                phi=s[:, 41], dphi=s[:, 42], ddphi=s[:, 43],
                p=s[:, 29:35], v=s[:, 35:41],
                a=jnp.zeros((N, 6), x.dtype),  # filled by _stage_eval
            )
            return u, traj

        def stage_eval(params: ocp.OcpParams, x):
            """StageEval built from the stage VARIABLES (not a rollout)."""
            u, traj = unpack(x)
            # ak = (vk - v_{k-1}) / dt with v_{-1} = v0
            # (casadi_ocp_formulation.py:232 "ak = (vk - vprev) / dt")
            v_full = jnp.concatenate([params.v0[None], traj.v], axis=0)
            a = (v_full[1:] - v_full[:-1]) / cfg.dt
            traj = traj._replace(a=a)
            ref = jax.vmap(lambda phi: ocp.stage_reference(cfg, params, phi))(
                traj.phi)
            err = jax.vmap(
                lambda r, p, v, dphi, phi: ocp.stage_error(
                    cfg, params, r, p, v, dphi, phi)
            )(ref, traj.p, traj.v, traj.dphi, traj.phi)
            return u, ocp.StageEval(traj, ref, err)

        def objective(params, x):
            u, ev = stage_eval(params, x)
            return ocp.objective(cfg, params, ev, u)

        def eq_constraints(params, x):
            """The 36 dynamics equalities per stage: the integration step of
            the previous stage's variables must equal this stage's variables
            (casadi_ocp_formulation.py:272-303)."""
            u, traj = unpack(x)
            dt = cfg.dt
            # previous-stage values (stage -1 = initial state parameters)
            q_prev = jnp.concatenate([params.q0[None], traj.q[:-1]], axis=0)
            dq_prev = jnp.concatenate([params.dq0[None], traj.dq[:-1]], axis=0)
            ddq_prev = jnp.concatenate([params.ddq0[None], traj.ddq[:-1]], axis=0)
            phi_prev = jnp.concatenate([params.phi0[None], traj.phi[:-1]])
            dphi_prev = jnp.concatenate([params.dphi0[None], traj.dphi[:-1]])
            ddphi_prev = jnp.concatenate([params.ddphi0[None], traj.ddphi[:-1]])
            prot_prev = jnp.concatenate([params.p0[None, 3:], traj.p[:-1, 3:]],
                                        axis=0)
            u_lo = jnp.concatenate(
                [jnp.concatenate([params.u_prev,
                                  params.uphi_prev[None]])[None], u[:-1]],
                axis=0)  # (N, 8) knot at interval start

            # Exact triangle-basis integration (jerk_trajectory closed forms)
            q_new, dq_new, ddq_new = jerkint.step(
                u_lo[:, :7], u[:, :7], q_prev, dq_prev, ddq_prev, dt)
            phi_new, dphi_new, ddphi_new = jerkint.step(
                u_lo[:, 7:], u[:, 7:], phi_prev[:, None], dphi_prev[:, None],
                ddphi_prev[:, None], dt)

            # FK coupling (bound_mpc_functions.py:262-284): position from FK
            # of the integrated joints, twist from the Jacobian, trapezoidal
            # integrated omega.
            pos_new = jax.vmap(kinematics.fk_pos)(q_new)
            J_new = jax.vmap(kinematics.jacobian)(q_new)
            v_new = jnp.einsum("kij,kj->ki", J_new, dq_new)
            J_prev = jax.vmap(kinematics.jacobian)(q_prev)
            omega_prev = jnp.einsum("kij,kj->ki", J_prev[:, 3:], dq_prev)
            prot_new = prot_prev + 0.5 * dt * (omega_prev + v_new[:, 3:])

            return jnp.concatenate([
                (q_new - traj.q).ravel(),
                (dq_new - traj.dq).ravel(),
                (ddq_new - traj.ddq).ravel(),
                (pos_new - traj.p[:, :3]).ravel(),
                (prot_new - traj.p[:, 3:]).ravel(),
                (v_new - traj.v).ravel(),
                (phi_new[:, 0] - traj.phi),
                (dphi_new[:, 0] - traj.dphi),
                (ddphi_new[:, 0] - traj.ddphi),
            ])

        def ineq_constraints(params, x):
            """c <= 0: phi/dphi caps + the 5 nonlinear bound constraints per
            stage (casadi_ocp_formulation.py:305-349), evaluated on the stage
            variables."""
            u, ev = stage_eval(params, x)
            traj = ev.traj
            nl = ocp.nonlin_constraints(cfg, params, ev)  # (N, 5)
            return jnp.concatenate([
                traj.phi - params.phi_max,
                traj.dphi - params.dphi_max,
                nl.ravel(),
            ])

        self._f = jax.jit(objective)
        self._fg = jax.jit(jax.grad(objective, argnums=1))
        self._ceq = jax.jit(eq_constraints)
        self._Jeq = jax.jit(jax.jacfwd(eq_constraints, argnums=1))
        self._cin = jax.jit(ineq_constraints)
        self._Jin = jax.jit(jax.jacfwd(ineq_constraints, argnums=1))
        self._pack_warm = jax.jit(self._pack_warm_impl)

        # Variable bounds (casadi_ocp_formulation.py:93-153)
        lim = limits
        lb = np.full(self.NX, -np.inf)
        ub = np.full(self.NX, np.inf)
        lb[0:7] = np.asarray(lim.u_min)[:7] if np.ndim(lim.u_min) else lim.u_min
        ub[0:7] = np.asarray(lim.u_max)[:7] if np.ndim(lim.u_max) else lim.u_max
        lb[7] = np.min(np.asarray(lim.u_min))
        ub[7] = np.max(np.asarray(lim.u_max))
        lb[8:15] = np.asarray(lim.q_lower)
        ub[8:15] = np.asarray(lim.q_upper)
        lb[15:22] = np.asarray(lim.dq_lower)
        ub[15:22] = np.asarray(lim.dq_upper)
        lb[41] = 0.0  # phi >= 0 (casadi_ocp_formulation.py:150)
        self.lbx = np.tile(lb, N)
        self.ubx = np.tile(ub, N)

    def _pack_warm_impl(self, params: ocp.OcpParams, u_warm: jnp.ndarray):
        """Stage-variable warm start: integrate the jerk-knot plan — the
        integrated states ARE the feasible stage values (the reference's
        warm start carries full stage vectors, BoundMPC.py:316-375)."""
        traj = ocp.rollout(self.cfg, self.coeffs, params, u_warm)
        N = self.cfg.N
        cols = [u_warm[:, :7], u_warm[:, 7:8], traj.q, traj.dq, traj.ddq,
                traj.p, traj.v, traj.phi[:, None], traj.dphi[:, None],
                traj.ddphi[:, None]]
        return jnp.concatenate(cols, axis=1).reshape(N * self.NX)

    def __call__(self, params: ocp.OcpParams, u_warm: jnp.ndarray):
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
        x0 = np.asarray(self._pack_warm(params, jnp.asarray(u_warm, jnp.float64)))
        x0 = np.clip(x0, self.lbx, self.ubx)

        res = minimize(
            lambda x: float(self._f(params, jnp.asarray(x))),
            x0,
            jac=lambda x: np.asarray(self._fg(params, jnp.asarray(x))),
            constraints=[
                {"type": "eq",
                 "fun": lambda x: np.asarray(self._ceq(params, jnp.asarray(x))),
                 "jac": lambda x: np.asarray(self._Jeq(params, jnp.asarray(x)))},
                {"type": "ineq",
                 "fun": lambda x: -np.asarray(self._cin(params, jnp.asarray(x))),
                 "jac": lambda x: -np.asarray(self._Jin(params, jnp.asarray(x)))},
            ],
            bounds=list(zip(self.lbx, self.ubx)),
            method="SLSQP",
            options={"maxiter": self.maxiter, "ftol": 1e-9},
        )
        xs = res.x.reshape(self.cfg.N, self.NX)
        u_opt = jnp.asarray(np.concatenate([xs[:, 0:7], xs[:, 7:8]], axis=1))

        # Reference-style violation audit over ALL constraints incl. the
        # dynamics equalities (BoundMPC.py:460-465: 1e-6 slack, both sides)
        ceq = np.asarray(self._ceq(params, jnp.asarray(res.x)))
        cin = np.asarray(self._cin(params, jnp.asarray(res.x)))
        viol = (np.abs(ceq)[np.abs(ceq) > 1e-6].sum()
                + cin[cin > 1e-6].sum())
        box_lo = (self.lbx - res.x)
        box_hi = (res.x - self.ubx)
        viol += box_lo[box_lo > 1e-6].sum() + box_hi[box_hi > 1e-6].sum()

        stats = solver_mod.SolveStats(
            iters=jnp.asarray(res.nit, jnp.int32),
            converged=jnp.asarray(bool(res.success)),
            obj=jnp.asarray(float(res.fun)),
            viol=jnp.asarray(float(viol)),
        )
        return u_opt, stats


def ref_nlp_runner(scenario, capacity=None, maxiter: int = 150):
    """ClosedLoopRunner whose per-tick solve is the reference-formulation
    stage NLP (f64 SLSQP) — the strongest available stand-in for the
    reference's Ipopt loop in an environment without casadi."""
    from ..runtime.runner import ClosedLoopRunner
    from .. import engine

    r = ClosedLoopRunner(scenario, dtype=jnp.float64, capacity=capacity)
    oracle = RefNlpSolver(r.cfg, r.coeffs, r.limits, maxiter=maxiter)

    def tick(state, path, weights, x_phi_d):
        return engine.tick(r.cfg, r.scfg, r.coeffs, r.limits, state, path,
                           weights, x_phi_d, solve_fn=oracle)

    r._tick = tick
    return r
