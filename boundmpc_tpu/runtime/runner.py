"""Closed-loop MPC runner: the in-process analog of the reference's 10 Hz
node loop (`nodes/bound_mpc_node.py:375-401`) plus the experiment runner's
wait-until-done logic (`experiment1_runner.py:100-112`).

The plant is the model itself (kinematic integrator + FK), exactly like the
reference's simulated robot (util_functions.py:152-161) — the engine's
stage-1 states ARE the next plant state, so the runner only sequences jitted
ticks and accumulates telemetry.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from .. import engine, jerkint, kinematics, ocp, solver as solver_mod
from .scenarios import Scenario


@dataclass
class RunLog:
    """Per-tick telemetry series (the Logger analog, Logger/Logger.py)."""

    t: List[float] = field(default_factory=list)
    phi: List[float] = field(default_factory=list)
    dphi: List[float] = field(default_factory=list)
    ddphi: List[float] = field(default_factory=list)
    dddphi: List[float] = field(default_factory=list)
    iw_ref: List[np.ndarray] = field(default_factory=list)  # (3,)
    q: List[np.ndarray] = field(default_factory=list)
    dq: List[np.ndarray] = field(default_factory=list)
    ddq: List[np.ndarray] = field(default_factory=list)
    jerk: List[np.ndarray] = field(default_factory=list)
    p: List[np.ndarray] = field(default_factory=list)  # measured EE pose
    success: List[bool] = field(default_factory=list)
    fails: List[int] = field(default_factory=list)
    iters: List[int] = field(default_factory=list)
    viol: List[float] = field(default_factory=list)
    obj: List[float] = field(default_factory=list)
    t_comp: List[float] = field(default_factory=list)
    pr_ref: List[np.ndarray] = field(default_factory=list)  # (3,) rotation ref
    sector: List[int] = field(default_factory=list)
    horizon_q: List[np.ndarray] = field(default_factory=list)  # (N, 7)
    horizon_phi: List[np.ndarray] = field(default_factory=list)  # (N,)
    horizon_p: List[np.ndarray] = field(default_factory=list)  # (N, 6)
    # Full-horizon histories (Logger.py:54-80 analog)
    horizon_dq: List[np.ndarray] = field(default_factory=list)  # (N, 7)
    horizon_ddq: List[np.ndarray] = field(default_factory=list)  # (N, 7)
    horizon_dddq: List[np.ndarray] = field(default_factory=list)  # (N, 7)
    horizon_dphi: List[np.ndarray] = field(default_factory=list)  # (N,)
    horizon_ddphi: List[np.ndarray] = field(default_factory=list)  # (N,)
    horizon_v: List[np.ndarray] = field(default_factory=list)  # (N, 6)
    # Lie-linearization regression series (Plotter.py:96-135, 240-247):
    # plane coords are (orth1, orth2, par)
    horizon_e_r_lin: List[np.ndarray] = field(default_factory=list)  # (N, 3)
    horizon_e_r_true: List[np.ndarray] = field(default_factory=list)  # (N, 3)
    v: List[np.ndarray] = field(default_factory=list)  # (6,) measured twist
    # Stage-0 (t_1) error/reference series as the MPC computed them
    # (Logger.py e_p/de_p/e_r/... analogs; the node publishes err_data[0])
    e_p: List[np.ndarray] = field(default_factory=list)  # (3,)
    de_p: List[np.ndarray] = field(default_factory=list)  # (3,)
    e_p_par: List[np.ndarray] = field(default_factory=list)  # (3,)
    e_p_orth: List[np.ndarray] = field(default_factory=list)  # (3,)
    e_r: List[np.ndarray] = field(default_factory=list)  # (3,) linearized
    de_r: List[np.ndarray] = field(default_factory=list)  # (3,)
    e_r_par: List[np.ndarray] = field(default_factory=list)  # (3,)
    e_r_orth1: List[np.ndarray] = field(default_factory=list)  # (3,)
    e_r_orth2: List[np.ndarray] = field(default_factory=list)  # (3,)
    p_ref: List[np.ndarray] = field(default_factory=list)  # (6,) stage-0 ref
    dp_ref: List[np.ndarray] = field(default_factory=list)  # (6,)
    # Timing split (bound_mpc_node.py:363-365): t_comp = solve, t_loop =
    # whole control period, t_overhead = t_loop - t_comp
    t_loop: List[float] = field(default_factory=list)
    t_overhead: List[float] = field(default_factory=list)

    def arrays(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.__dict__.items()}


class ClosedLoopRunner:
    """Single-scenario closed loop (float64-capable for parity testing)."""

    def __init__(self, scenario: Scenario,
                 solver_cfg: solver_mod.SolverConfig | None = None,
                 dtype=jnp.float64, capacity: int | None = None):
        self.scenario = scenario
        self.cfg = ocp.OcpConfig(N=scenario.N, nr_segs=scenario.nr_segs,
                                 dt=scenario.dt)
        self.scfg = solver_cfg or solver_mod.SolverConfig()
        self.dtype = dtype
        np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        self.path = scenario.build(capacity=capacity, dtype=np_dtype)
        self.coeffs = jerkint.coeff_matrices(self.cfg.N, self.cfg.dt, dtype=dtype)
        self.limits = kinematics.robot_limits()
        if dtype != jnp.float64:
            cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, dtype)
                                          if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, t)
            self.path = cast(self.path)
            self.limits = cast(self.limits)
        self.weights = jnp.asarray(scenario.weights, dtype)
        self.state = engine.init_state(self.cfg, jnp.asarray(scenario.q0, dtype),
                                       dtype=dtype)
        self.phi_max = float(self.path.phi_max) - 1e-4
        self.x_phi_d = jnp.asarray([self.phi_max, 0.0, 0.0], dtype)

        self._tick = jax.jit(
            partial(engine.tick, self.cfg, self.scfg, self.coeffs, self.limits)
        )
        self._pref = jax.jit(partial(solver_mod.make_prefactor, self.cfg,
                                     dtype=dtype))(
            self.path.phi_max, self.weights, self.x_phi_d)
        from ..observability.horizon import make_horizon_eval
        self._horizon_eval = make_horizon_eval(self.cfg, self.coeffs)

        def _err_eval(params, u):
            ev = ocp.evaluate_stages(self.cfg, self.coeffs, params, u)
            return ev.err, ev.ref.p_d, ev.ref.dp_d
        self._err_eval = jax.jit(_err_eval)

    def replan(self, scenario: Scenario, velocity_lookahead: bool = True):
        """Mid-run path replacement (the node's Trajectory update=true
        handler, bound_mpc_node.py:121-165): the new path starts at the
        current EE pose (+ optional half-tick velocity look-ahead) and the
        engine state is re-anchored onto it."""
        from scipy.spatial.transform import Rotation as R

        q = jnp.asarray(np.asarray(self.state.q), self.dtype)
        pose = np.array(kinematics.fk_pose(q))
        v = np.asarray(kinematics.jacobian(q)) @ np.asarray(self.state.dq)
        p_start = pose[:3] + (0.5 * self.cfg.dt * v[:3] if velocity_lookahead else 0.0)

        scenario.p_via = [p_start] + [np.asarray(p) for p in scenario.p_via[1:]]
        scenario.r_via = [R.from_rotvec(pose[3:]).as_matrix()] + list(scenario.r_via[1:])

        np_dtype = np.float64 if self.dtype == jnp.float64 else np.float32
        new_path = scenario.build(capacity=None, dtype=np_dtype)
        if self.dtype != jnp.float64:
            new_path = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                new_path,
            )
        self.path = new_path
        self.scenario = scenario
        self.weights = jnp.asarray(scenario.weights, self.dtype)
        self.phi_max = float(new_path.phi_max) - 1e-4
        self.x_phi_d = jnp.asarray([self.phi_max, 0.0, 0.0], self.dtype)
        self.state = jax.jit(partial(engine.replan_state, self.cfg))(
            self.state, new_path
        )
        self._pref = jax.jit(partial(solver_mod.make_prefactor, self.cfg,
                                     dtype=self.dtype))(
            new_path.phi_max, self.weights, self.x_phi_d)

    def run(self, max_ticks: int = 400, stop_tol: float = 0.01,
            verbose: bool = False) -> RunLog:
        """Run until phi reaches phi_max (runner wait-loop semantics,
        experiment1_runner.py:104-112) or the engine dies."""
        log = RunLog()
        state = self.state
        n_via = np.asarray(self.path.via_rotvec).shape[0]
        for k in range(max_ticks):
            t0 = time.perf_counter()
            prev_pr_ref, prev_phi = state.pr_ref, state.phi
            state, out = self._tick(state, self.path, self.weights,
                                    self.x_phi_d, pref=self._pref)
            jax.block_until_ready(state.phi)
            t_comp = time.perf_counter() - t0

            # Horizon-wise linearized vs true rotation errors (the
            # approximation-error regression data, Plotter.py:96-135)
            sec = int(state.sector)  # window base used by this tick
            idx = jnp.clip(jnp.arange(3) + sec, 0, n_via - 1)
            via_win = self.path.via_rotvec[idx]
            er_lin, er_true = self._horizon_eval(
                out.params, jnp.asarray(out.u), prev_pr_ref, prev_phi, via_win)

            log.t.append(k * self.cfg.dt)
            log.phi.append(float(state.phi))
            log.dphi.append(float(state.dphi))
            log.ddphi.append(float(state.ddphi))
            log.dddphi.append(float(state.dddphi))
            log.iw_ref.append(np.asarray(state.iw_ref))
            log.q.append(np.asarray(state.q))
            log.dq.append(np.asarray(state.dq))
            log.ddq.append(np.asarray(state.ddq))
            log.jerk.append(np.asarray(state.jerk))
            log.p.append(np.asarray(out.p0))
            log.success.append(bool(out.success))
            log.fails.append(int(out.error_count))
            log.iters.append(int(out.stats.iters))
            log.viol.append(float(out.stats.viol))
            log.obj.append(float(out.stats.obj))
            log.t_comp.append(t_comp)
            log.pr_ref.append(np.asarray(state.pr_ref))
            log.sector.append(int(state.sector))
            log.horizon_q.append(np.asarray(out.traj.q))
            log.horizon_phi.append(np.asarray(out.traj.phi))
            log.horizon_p.append(np.asarray(out.traj.p))
            log.horizon_dq.append(np.asarray(out.traj.dq))
            log.horizon_ddq.append(np.asarray(out.traj.ddq))
            log.horizon_dddq.append(np.asarray(out.u)[:, :7])
            log.horizon_dphi.append(np.asarray(out.traj.dphi))
            log.horizon_ddphi.append(np.asarray(out.traj.ddphi))
            log.horizon_v.append(np.asarray(out.traj.v))
            log.horizon_e_r_lin.append(np.asarray(er_lin))
            log.horizon_e_r_true.append(np.asarray(er_true))
            log.v.append(np.asarray(out.params.v0))

            # Stage-0 MPC-computed errors/references (node publishes the
            # first horizon entry of err_data/ref_data; the post-tick plant
            # state IS stage 1, so these pair exactly with q/phi above).
            err, p_d, dp_d = self._err_eval(out.params, jnp.asarray(out.u))
            log.e_p.append(np.asarray(err.e_p[0]))
            log.de_p.append(np.asarray(err.de_p[0]))
            log.e_p_par.append(np.asarray(err.e_p_par[0]))
            log.e_p_orth.append(np.asarray(err.e_p_orth[0]))
            log.e_r.append(np.asarray(err.e_r[0]))
            log.de_r.append(np.asarray(err.de_r[0]))
            log.e_r_par.append(np.asarray(err.e_r_par[0]))
            log.e_r_orth1.append(np.asarray(err.e_r_orth1[0]))
            log.e_r_orth2.append(np.asarray(err.e_r_orth2[0]))
            log.p_ref.append(np.asarray(p_d[0]))
            log.dp_ref.append(np.asarray(dp_d[0]))
            t_loop = time.perf_counter() - t0
            log.t_loop.append(t_loop)
            log.t_overhead.append(t_loop - t_comp)

            if verbose:
                print(f"tick {k:3d} phi {log.phi[-1]:.3f}/{self.phi_max:.3f} "
                      f"iters {log.iters[-1]:2d} viol {log.viol[-1]:.2e} "
                      f"t {t_comp*1e3:.1f}ms success {log.success[-1]}")
            if bool(state.dead):
                break
            if self.phi_max - log.phi[-1] < stop_tol:
                break
        self.state = state
        return log
