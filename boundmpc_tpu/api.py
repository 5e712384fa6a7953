"""Drop-in reference-compatible facade.

`BoundMPC` mirrors the public surface of the reference controller
(`bound_mpc/bound_mpc/BoundMPC/BoundMPC.py`): same constructor arguments
(:20-33), same `.update(...)` replanning signature (:163-180), same
`.step(q0, dq0, ddq0, p0, v0, x_phi_d, jerk_current)` returning
``(traj_data, ref_data, err_data, t_comp, iters)`` with the reference's
dict key layout (:508-770).  A user of the reference can switch imports and
keep their control loop.

`MPCParams` replaces the ROS MPCParams service record (srv/MPCParams.srv);
only the fields the reference actually reads are meaningful
(SURVEY.md §2.3).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from . import engine, jerkint, kinematics, ocp, solver as solver_mod
from .path import build_path
from .runtime.scenarios import default_weights


@dataclass
class MPCParams:
    """The MPCParams service record (srv/MPCParams.srv); `build`,
    `use_acados`, `learning_based`, `experiment` are accepted but vestigial,
    exactly as in the reference (SURVEY.md §2.3)."""

    n: int = 10
    dt: float = 0.1
    nr_segs: int = 4
    weights: List[float] = field(default_factory=lambda: default_weights().tolist())
    build: bool = False
    simulate: bool = False
    experiment: bool = False
    learning_based: bool = False
    real_time: bool = False
    use_acados: bool = False


class BoundMPC:
    """Reference-compatible stateful controller (external plant state)."""

    def __init__(self, pos_points, rot_points, pos_lim, rot_lim, bp1, br1,
                 s, e_p_min, e_r_min, e_p_max, e_r_max,
                 p0=np.zeros(6), params: Optional[MPCParams] = None,
                 dtype=jnp.float64,
                 solver_cfg: Optional[solver_mod.SolverConfig] = None):
        params = params or MPCParams()
        self.params = params
        self.dtype = dtype
        self.N = params.n
        self.dt = params.dt
        self.nr_segs = params.nr_segs
        self.cfg = ocp.OcpConfig(N=params.n, nr_segs=params.nr_segs, dt=params.dt)
        self.scfg = solver_cfg or (
            solver_mod.SolverConfig() if dtype == jnp.float64
            else solver_mod.RUNTIME_F32
        )
        self.coeffs = jerkint.coeff_matrices(self.cfg.N, self.cfg.dt, dtype=dtype)
        self.limits = jax.tree.map(
            lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray) else a,
            kinematics.robot_limits(),
        )
        self.error_count = 0

        self._set_path(pos_points, rot_points, pos_lim, rot_lim, bp1, br1,
                       s, e_p_min, e_r_min, e_p_max, e_r_max)
        self.weights = jnp.asarray(np.asarray(params.weights), dtype)
        self.phi_max = np.array([float(self.path.phi_max) - 1e-4])

        # Engine state: q placeholder (overwritten per step), pr_ref from p0.
        st = engine.init_state(self.cfg, jnp.zeros(7, dtype), dtype=dtype)
        self._state = st._replace(
            pr_ref=jnp.asarray(np.asarray(p0)[3:], dtype))
        self.phi_current = np.array([0.0])

        self._tick = jax.jit(partial(engine.tick, self.cfg, self.scfg,
                                     self.coeffs, self.limits))

    # -- internals ---------------------------------------------------------
    @staticmethod
    def _scalar_list(x, n_via):
        if np.isscalar(x):
            return float(x)
        return float(np.asarray(x).flatten()[0])

    def _set_path(self, pos_points, rot_points, pos_lim, rot_lim, bp1, br1,
                  s, e_p_min, e_r_min, e_p_max, e_r_max):
        n_via = len(pos_points)
        np_dtype = np.float64 if self.dtype == jnp.float64 else np.float32
        self.path = build_path(
            list(pos_points), list(rot_points),
            list(pos_lim[1]), list(pos_lim[0]),  # reference order: [upper, lower]
            list(rot_lim[1]), list(rot_lim[0]),
            list(bp1), list(br1),
            self._scalar_list(s, n_via), self._scalar_list(e_p_min, n_via),
            self._scalar_list(e_r_min, n_via), self._scalar_list(e_p_max, n_via),
            self._scalar_list(e_r_max, n_via), self.nr_segs, dtype=np_dtype,
        )
        if self.dtype != jnp.float64:
            self.path = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                self.path,
            )

    # -- reference API -----------------------------------------------------
    def update(self, pos_points, rot_points, pos_lim, rot_lim, bp1, br1,
               s, e_p_min, e_r_min, e_p_max, e_r_max, p, v, a, jerk,
               p0=np.zeros(6), params: Optional[MPCParams] = None):
        """Mid-run replanning — reference BoundMPC.update (:163-217).

        A params record that changes the problem DIMENSIONS (n, nr_segs, dt)
        rebuilds the OCP config, jerk-integration coefficients, and the
        jitted tick, and resizes the carried warm-start plan — the analog of
        the reference node re-running `BoundMPC.__init__` whenever MPCParams
        arrive (nodes/bound_mpc_node.py:48 -> BoundMPC.py:35-62)."""
        if params is not None:
            rebuild = (params.n != self.N or params.nr_segs != self.nr_segs
                       or params.dt != self.dt)
            self.params = params
            self.weights = jnp.asarray(np.asarray(params.weights), self.dtype)
            if rebuild:
                old_state = self._state
                old_N = self.N
                self.N = params.n
                self.dt = params.dt
                self.nr_segs = params.nr_segs
                self.cfg = ocp.OcpConfig(N=params.n, nr_segs=params.nr_segs,
                                         dt=params.dt)
                self.coeffs = jerkint.coeff_matrices(self.cfg.N, self.cfg.dt,
                                                     dtype=self.dtype)
                self._tick = jax.jit(partial(engine.tick, self.cfg, self.scfg,
                                             self.coeffs, self.limits))
                # Resize the carried jerk-knot plans to the new horizon
                # (truncate or terminal-repeat), keep all scalar state.
                def resize(u):
                    if params.n <= old_N:
                        return u[: params.n]
                    tail = jnp.broadcast_to(u[-1:], (params.n - old_N,
                                                     u.shape[1]))
                    return jnp.concatenate([u, tail], axis=0)
                self._state = old_state._replace(
                    u_warm=resize(old_state.u_warm),
                    u_safe=resize(old_state.u_safe),
                )
        self._set_path(pos_points, rot_points, pos_lim, rot_lim, bp1, br1,
                       s, e_p_min, e_r_min, e_p_max, e_r_max)
        self.phi_max = np.array([float(self.path.phi_max) - 1e-4])
        self._state = engine.replan_state(self.cfg, self._state, self.path)
        self.phi_current = np.array([float(self._state.phi)])

    def step(self, q0, dq0, ddq0, p0, v0, x_phi_d, jerk_current, x_des=None):
        """One optimization step — reference BoundMPC.step (:306-506).

        The plant state is supplied externally (as in the reference); the
        internally carried warm start / rotation bookkeeping is preserved.
        """
        dtype = self.dtype
        st = self._state._replace(
            q=jnp.asarray(np.asarray(q0), dtype),
            dq=jnp.asarray(np.asarray(dq0), dtype),
            ddq=jnp.asarray(np.asarray(ddq0), dtype),
            jerk=jnp.asarray(np.asarray(jerk_current), dtype),
        )
        t0 = time.perf_counter()
        new_state, out = self._tick(
            st, self.path, self.weights, jnp.asarray(np.asarray(x_phi_d), dtype)
        )
        jax.block_until_ready(new_state.phi)
        t_comp = time.perf_counter() - t0

        self._state = new_state
        self.error_count = int(out.error_count)
        self.phi_current = np.array([float(new_state.phi)])

        if self.error_count >= self.N:
            return None, None, None, None, None

        traj = out.traj
        q = np.asarray(traj.q).T  # (7, N) — reference layout
        dq = np.asarray(traj.dq).T
        ddq = np.asarray(traj.ddq).T
        u = np.asarray(out.u)
        # Cartesian pose trajectory (reference re-FKs the joint solution,
        # compute_return_data :568-587)
        pose = np.asarray(jax.vmap(kinematics.fk_pose)(traj.q)).T  # (6, N)
        J = np.asarray(jax.vmap(kinematics.jacobian)(traj.q))
        vel = np.einsum("kij,kj->ki", J, np.asarray(traj.dq)).T
        dJ = np.asarray(jax.vmap(kinematics.djacobian)(traj.q, traj.dq))
        acc = (np.einsum("kij,kj->ki", J, np.asarray(traj.ddq))
               + np.einsum("kij,kj->ki", dJ, np.asarray(traj.dq))).T

        traj_data = {
            "p": pose, "v": vel, "a": acc,
            "q": q, "dq": dq, "ddq": ddq, "dddq": u[:, :7].T,
            "phi": np.asarray(traj.phi), "dphi": np.asarray(traj.dphi),
            "ddphi": np.asarray(traj.ddphi), "dddphi": u[:, 7],
        }

        # real_time gating: the reference computes the log-only reference /
        # error series only when not running real-time (BoundMPC.py:47
        # `self.log = not params.real_time`, :613 `if self.log:`).
        if self.params.real_time:
            return traj_data, None, None, t_comp, int(out.stats.iters)

        # Per-horizon reference / error series (the reference's log branch,
        # compute_return_data :614-752)
        ev = ocp.evaluate_stages(self.cfg, self.coeffs, out.params,
                                 jnp.asarray(out.u))
        ref_data = {
            "p": list(np.asarray(ev.ref.p_d)),
            "dp": list(np.asarray(ev.ref.dp_d)),
            # piecewise-linear reference: ddp_d == 0 identically
            # (bound_mpc_functions.py reference_function ddp_lin)
            "ddp": [np.zeros(6) for _ in range(self.N)],
            "dp_normed": list(np.asarray(ev.ref.dp_normed_d)),
            "bound_lower": list(np.asarray(ev.ref.bound_lower)),
            "bound_upper": list(np.asarray(ev.ref.bound_upper)),
            "r_par_bound": list(np.asarray(ev.ref.r_par_bound)),
            "e_p_off": list(np.asarray(ev.ref.e_p_off)),
            "e_r_off": list(np.asarray(ev.ref.e_r_off)),
            "bp1": list(np.asarray(ev.ref.bp1)),
            "bp2": list(np.asarray(ev.ref.bp2)),
            "br1": list(np.asarray(ev.ref.br1)),
            "br2": list(np.asarray(ev.ref.br2)),
            "v1": list(np.asarray(ev.ref.v1)),
            "v2": list(np.asarray(ev.ref.v2)),
            "v3": list(np.asarray(ev.ref.v3)),
        }
        err_data = {
            "e_p": list(np.asarray(ev.err.e_p)),
            "de_p": list(np.asarray(ev.err.de_p)),
            "e_p_par": list(np.asarray(ev.err.e_p_par)),
            "e_p_orth": list(np.asarray(ev.err.e_p_orth)),
            "de_p_par": list(np.asarray(ev.err.de_p_par)),
            "de_p_orth": list(np.asarray(ev.err.de_p_orth)),
            "e_r": list(np.asarray(ev.err.e_r)),
            "de_r": list(np.asarray(ev.err.de_r)),
            "e_r_par": list(np.asarray(ev.err.e_r_par)),
            "e_r_orth1": list(np.asarray(ev.err.e_r_orth1)),
            "e_r_orth2": list(np.asarray(ev.err.e_r_orth2)),
        }
        self._correct_logged_rotation_reference(
            ref_data, err_data, out, np.asarray(traj.phi), pose)
        return traj_data, ref_data, err_data, t_comp, int(out.stats.iters)

    def _correct_logged_rotation_reference(self, ref_data, err_data, out,
                                           phis, pose):
        """Replace the linearized logged e_r with the exact Lie-space error
        against the per-stage integrated rotation reference, advancing the
        reference across horizon segment switches — the reference's
        'Update ref data to correct rotation reference' block
        (BoundMPC.py:646-752).  The logged ref pose's rotation part becomes
        the integrated rotation reference rather than the path's integrated
        omega coordinates."""
        from scipy.spatial.transform import Rotation as R

        # np.array copies: scipy Rotation rejects the read-only views that
        # np.asarray returns for jax buffers.
        phi_sw = np.array(out.params.phi_switch)
        dp_ref_w = np.array(out.params.dp_ref)  # (nr_segs, 6)
        sector = int(self._state.sector)
        via_rotvec = np.array(self.path.via_rotvec)
        pose = np.array(pose)

        def integ(pr, dr, lo, hi):
            rot = R.from_rotvec(dr * (hi - lo)).as_matrix()
            return R.from_matrix(rot @ R.from_rotvec(pr).as_matrix()).as_rotvec()

        # self._state is the post-tick state: pr_ref is already advanced to
        # the stage-0 phi (engine rotation-reference advance).
        pr_ref = np.array(self._state.pr_ref)
        for i in range(self.N):
            ref_data["p"][i] = np.concatenate(
                [np.asarray(ref_data["p"][i][:3]), pr_ref])
            tauc = R.from_rotvec(pose[3:, i]).as_matrix()
            taud = R.from_rotvec(pr_ref).as_matrix()
            err_data["e_r"][i] = R.from_matrix(tauc @ taud.T).as_rotvec()
            if i == self.N - 1:
                break
            phi, phi_next = phis[i], phis[i + 1]
            # Advance across at most the two upcoming switches the reference
            # window tracks (BoundMPC.py:711-733).
            if phi_next > phi_sw[1] and phi < phi_sw[1]:
                nxt = via_rotvec[min(sector + 1, via_rotvec.shape[0] - 1)]
                pr_ref = integ(nxt, dp_ref_w[1, 3:], phi_sw[1], phi_next)
            elif phi_next > phi_sw[2] and phi < phi_sw[2]:
                nxt = via_rotvec[min(sector + 2, via_rotvec.shape[0] - 1)]
                pr_ref = integ(nxt, dp_ref_w[2, 3:], phi_sw[2], phi_next)
            elif phi_next > phi_sw[2]:
                pr_ref = integ(pr_ref, dp_ref_w[2, 3:], phi, phi_next)
            elif phi_next > phi_sw[1]:
                pr_ref = integ(pr_ref, dp_ref_w[1, 3:], phi, phi_next)
            else:
                pr_ref = integ(pr_ref, dp_ref_w[0, 3:], phi, phi_next)
