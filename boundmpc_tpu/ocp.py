"""Condensed OCP formulation for Cartesian path-following MPC, TPU-first.

Reference semantics: ``bound_mpc/bound_mpc/BoundMPC/casadi_ocp_formulation.py``
(stage loop :88-357), ``bound_mpc_functions.py`` (reference/error/objective
stage functions) and ``mpc_utils_casadi.py`` (error projections).

TPU-first re-design — *condensation*: the reference keeps all 44 stage
variables as decision variables and ties them with 36 equality constraints
per stage; its NLP is 440 vars x 430 constraints.  Here the only decision
variables are the N x 8 jerk knots ``u`` (7 joint jerks + 1 path jerk per
stage).  Because the triple-integrator dynamics are *linear* in the jerk
knots (exact closed forms, see jerkint.py) and the Cartesian states are
defined by forward kinematics of the joint states
(casadi_ocp_formulation.py:272-303 makes them equal via constraints), every
stage state is an explicit function of ``u``:

    (q, dq, ddq)[k]    = linear map of u           (3 matmuls)
    (phi,dphi,ddphi)[k] = linear map of u[:, 7]
    pos[k] = fk_pos(q[k]),  v[k] = J(q[k]) dq[k]   (vmapped FK)
    iw[k]  = iw0 + dt/2 * cumsum(omega[k-1]+omega[k])   (trapezoid, exact
             match of bound_mpc_functions.py:277-280)

The NLP becomes: min_u f(states(u)) s.t. c(states(u)) <= 0 with only ~520
inequalities — an unconstrained-dimension-80 dense problem per scenario.
Batched over thousands of scenarios this is pure MXU/VPU food; the equality
feasibility drift the reference has to re-integrate away after every solve
(BoundMPC.py:526-555) cannot occur by construction.

All segment dispatch is branchless ``where``/gather (static ``nr_segs``),
replacing the reference's chained ``ca.if_else``
(bound_mpc_functions.get_current_segment :13-40).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import jerkint, kinematics, lie
from .bounds import quartic_eval
from .path import segment_index


class OcpConfig(NamedTuple):
    """Static (trace-time) problem dimensions."""

    N: int = 10
    nr_segs: int = 4
    dt: float = 0.1
    nr_joints: int = 7


class OcpParams(NamedTuple):
    """Per-tick, per-scenario dynamic parameters (the analog of the
    reference's packed parameter vector, BoundMPC.py:416-443)."""

    # Initial state
    q0: jnp.ndarray  # (7,)
    dq0: jnp.ndarray  # (7,)
    ddq0: jnp.ndarray  # (7,)
    phi0: jnp.ndarray  # ()
    dphi0: jnp.ndarray  # ()
    ddphi0: jnp.ndarray  # ()
    p0: jnp.ndarray  # (6,) [pos; integrated omega]
    v0: jnp.ndarray  # (6,)
    u_prev: jnp.ndarray  # (7,) previous joint jerk knot
    uphi_prev: jnp.ndarray  # () previous path jerk knot
    # Rotation-reference anchors
    iw_ref0: jnp.ndarray  # (3,) integrated omega of the reference at phi0
    dtau_init: jnp.ndarray  # (3,) initial orientation error (segment 0)
    dtau_init_par: jnp.ndarray  # (nr_segs, 3)
    dtau_init_orth1: jnp.ndarray  # (nr_segs, 3)
    dtau_init_orth2: jnp.ndarray  # (nr_segs, 3)
    jac_dtau_l: jnp.ndarray  # (3, 3)
    jac_dtau_r: jnp.ndarray  # (3, 3)
    # Active path window (gathered per tick, reference get_parameters)
    p_ref: jnp.ndarray  # (nr_segs, 6)
    dp_ref: jnp.ndarray  # (nr_segs, 6)
    dp_normed: jnp.ndarray  # (nr_segs, 3)
    bp1: jnp.ndarray  # (nr_segs, 3)
    bp2: jnp.ndarray  # (nr_segs, 3)
    br1: jnp.ndarray  # (nr_segs, 3)
    br2: jnp.ndarray  # (nr_segs, 3)
    v1: jnp.ndarray  # (nr_segs, 3) orientation projection vectors
    v2: jnp.ndarray  # (nr_segs, 3)
    v3: jnp.ndarray  # (nr_segs, 3)
    phi_switch: jnp.ndarray  # (nr_segs + 1,)
    acoef: jnp.ndarray  # (nr_segs + 1, 9, 5) quartic bound coeffs [a4..a0]
    # Objective / misc
    weights: jnp.ndarray  # (15,)
    phi_max: jnp.ndarray  # ()
    dphi_max: jnp.ndarray  # ()
    x_phi_d: jnp.ndarray  # (3,) desired (phi, dphi, ddphi)
    qd: jnp.ndarray  # (7,) desired joint configuration


class Trajectory(NamedTuple):
    """States at grid points t_1..t_N (row k = state at t_{k+1})."""

    q: jnp.ndarray  # (N, 7)
    dq: jnp.ndarray  # (N, 7)
    ddq: jnp.ndarray  # (N, 7)
    phi: jnp.ndarray  # (N,)
    dphi: jnp.ndarray  # (N,)
    ddphi: jnp.ndarray  # (N,)
    p: jnp.ndarray  # (N, 6) [fk position; integrated omega]
    v: jnp.ndarray  # (N, 6) EE twist
    a: jnp.ndarray  # (N, 6) finite-difference twist derivative


class RefData(NamedTuple):
    """Per-stage reference outputs (reference_function,
    bound_mpc_functions.py:43-155)."""

    p_d: jnp.ndarray  # (6,)
    dp_d: jnp.ndarray  # (6,)
    dp_normed_d: jnp.ndarray  # (3,)
    bp1: jnp.ndarray  # (3,)
    bp2: jnp.ndarray  # (3,)
    br1: jnp.ndarray  # (3,)
    br2: jnp.ndarray  # (3,)
    v1: jnp.ndarray  # (3,)
    v2: jnp.ndarray  # (3,)
    v3: jnp.ndarray  # (3,)
    bound_lower: jnp.ndarray  # (4,) [pos x2, rot x2]
    bound_upper: jnp.ndarray  # (4,)
    r_par_bound: jnp.ndarray  # ()
    e_p_off: jnp.ndarray  # (2,)
    e_r_off: jnp.ndarray  # (2,)


class ErrData(NamedTuple):
    """Per-stage error outputs (error_function,
    bound_mpc_functions.py:158-202)."""

    e_p_par: jnp.ndarray  # (3,)
    e_p_orth: jnp.ndarray  # (3,)
    de_p_par: jnp.ndarray  # (3,)
    de_p_orth: jnp.ndarray  # (3,)
    e_p: jnp.ndarray  # (3,)
    de_p: jnp.ndarray  # (3,)
    e_r_par: jnp.ndarray  # (3,)
    e_r: jnp.ndarray  # (3,)
    de_r: jnp.ndarray  # (3,)
    e_r_orth1: jnp.ndarray  # (3,)
    e_r_orth2: jnp.ndarray  # (3,)


# ---------------------------------------------------------------------------
# Engine-side prep math (jit/vmap-safe; reference hosts this in numpy between
# solves, here it fuses into the tick)
# ---------------------------------------------------------------------------

def compute_initial_rot_errors(pr, pr_ref, dp_ref, br1, br2):
    """Decompose the initial orientation error into par/orth1/orth2
    components via extrinsic zyx Euler angles in the path frame —
    reference util_functions.compute_initial_rot_errors (:11-31)."""
    tauc = lie.rotvec_to_matrix(pr)
    taud = lie.rotvec_to_matrix(pr_ref)
    dtau_init = lie.matrix_to_rotvec(tauc @ taud.T)

    norm_ref = jnp.linalg.norm(dp_ref)
    dp_normed = jnp.where(
        norm_ref > 1e-4, dp_ref / jnp.where(norm_ref > 1e-4, norm_ref, 1.0),
        jnp.array([0.0, 1.0, 0.0], dtype=dp_ref.dtype),
    )
    r01 = jnp.stack([br2, dp_normed, br1], axis=-1)  # columns
    dtau_01 = r01.T @ lie.rotvec_to_matrix(dtau_init) @ r01
    eul = lie.euler_zyx(dtau_01)
    dtau_init_orth2 = eul[2] * br2
    dtau_init_orth1 = eul[0] * br1
    dtau_init_par = eul[1] * dp_normed
    return dtau_init, dtau_init_par, dtau_init_orth1, dtau_init_orth2


def projection_vectors(dtau_init, dtau_init_par, dtau_init_orth1, br1, br2, dp_normed):
    """Oblique dual basis (v1, v2, v3) for extracting orientation-error
    coordinates — reference BoundMPC.compute_orientation_projection_vectors
    (:267-304).  The reference's cofactor formulas are exactly the dual basis
    V G^{-1} of the Gram matrix G = V^T V; we solve the 3x3 system instead.

    Args are per-segment (leading nr_segs axis) except dtau_init (3,).
    Returns (v1, v2, v3) each (nr_segs, 3) plus jac_dtau_l, jac_dtau_r (3,3).
    """
    jac_r = lie.jac_so3_inv_right(dtau_init)
    jac_l = lie.jac_so3_inv_left(dtau_init)
    rot_init = lie.rotvec_to_matrix(dtau_init)

    def per_seg(d_par, d_orth1, b1, b2, dpn):
        rest1 = rot_init @ lie.rotvec_to_matrix(d_orth1).T
        rest2 = rest1 @ lie.rotvec_to_matrix(d_par).T
        jac_r1 = lie.jac_so3_inv_right(lie.matrix_to_rotvec(rest1))
        jac_r2 = lie.jac_so3_inv_right(lie.matrix_to_rotvec(rest2))
        w1 = jac_r @ b1  # br1_proj
        w2 = jac_r1 @ dpn  # dp_ref_proj
        w3 = jac_r2 @ b2  # br2_proj
        V = jnp.stack([w1, w2, w3], axis=-1)  # (3, 3) columns
        G = V.T @ V
        dual = jnp.linalg.solve(G, V.T)  # rows are the dual vectors
        return dual[0], dual[1], dual[2]

    v1, v2, v3 = jax.vmap(per_seg)(dtau_init_par, dtau_init_orth1, br1, br2, dp_normed)
    return v1, v2, v3, jac_l, jac_r


# ---------------------------------------------------------------------------
# Condensed rollout
# ---------------------------------------------------------------------------

def rollout(cfg: OcpConfig, coeffs: jerkint.JerkCoeffs, params: OcpParams,
            u: jnp.ndarray) -> Trajectory:
    """Exact states at the N grid points as a function of jerk knots
    ``u`` (N, 8).  Replaces the reference's per-stage dynamics equality
    constraints (casadi_ocp_formulation.py:272-303)."""
    u_all = jnp.concatenate(
        [jnp.concatenate([params.u_prev, params.uphi_prev[None]])[None, :], u], axis=0
    )  # (N+1, 8)
    qj, dqj, ddqj = jerkint.rollout_linear(
        coeffs, u_all[:, : cfg.nr_joints], params.q0, params.dq0, params.ddq0
    )
    phis, dphis, ddphis = jerkint.rollout_linear(
        coeffs, u_all[:, cfg.nr_joints:], params.phi0[None], params.dphi0[None],
        params.ddphi0[None],
    )
    phis, dphis, ddphis = phis[:, 0], dphis[:, 0], ddphis[:, 0]

    pos = jax.vmap(kinematics.fk_pos)(qj)  # (N, 3)
    J = jax.vmap(kinematics.jacobian)(qj)  # (N, 6, 7)
    v = jnp.einsum("kij,kj->ki", J, dqj)  # (N, 6)

    # Trapezoidal integrated omega (bound_mpc_functions.py:277-280):
    # iw[k] = iw[k-1] + dt/2 (omega[k-1] + omega[k]), omega[-1] from x0.
    omega0 = kinematics.jacobian(params.q0)[3:] @ params.dq0  # (3,)
    omegas = jnp.concatenate([omega0[None], v[:, 3:]], axis=0)  # (N+1, 3)
    iw = params.p0[3:] + 0.5 * cfg.dt * jnp.cumsum(
        omegas[:-1] + omegas[1:], axis=0
    )  # (N, 3)
    p = jnp.concatenate([pos, iw], axis=-1)

    v_full = jnp.concatenate([params.v0[None], v], axis=0)
    a = (v_full[1:] - v_full[:-1]) / cfg.dt  # (N, 6), ref: ak = (vk - vprev)/dt
    return Trajectory(qj, dqj, ddqj, phis, dphis, ddphis, p, v, a)


# ---------------------------------------------------------------------------
# Stage reference / error evaluation (branchless gathers over the window)
# ---------------------------------------------------------------------------

def _gather(arrs, idx):
    return jax.tree.map(lambda a: a[idx], arrs)


def stage_reference(cfg: OcpConfig, params: OcpParams, phi: jnp.ndarray) -> RefData:
    """reference_function semantics (bound_mpc_functions.py:43-155) for one
    stage at path parameter ``phi``."""
    seg = segment_index(phi, params.phi_switch, cfg.nr_segs)
    phi_start = params.phi_switch[seg]
    dp_d = params.dp_ref[seg]
    p_ref_c = params.p_ref[seg]
    p_d = dp_d * (phi - phi_start) + p_ref_c

    # Quartic bound evaluation; acoef rows align with window segments.
    local = phi - phi_start
    coef = params.acoef[seg]  # (9, 5)
    vals = quartic_eval(local, coef)  # (9,)
    p_e_bound = vals[0:4]  # [upper x2, lower x2]
    r_e_bound = vals[4:8]
    r_par_bound = vals[8]

    bound_lower = jnp.concatenate([p_e_bound[2:], r_e_bound[2:]])
    bound_upper = jnp.concatenate([p_e_bound[:2], r_e_bound[:2]])
    e_p_off = 0.5 * (p_e_bound[:2] + p_e_bound[2:])
    e_r_off = 0.5 * (r_e_bound[:2] + r_e_bound[2:])

    # Quirk preserved for parity: the reference fetches bp1/bp2 through
    # get_current_and_next_segment (bound_mpc_functions.py:34-40,113-117),
    # whose "current" row saturates at nr_segs-2 — in the last window
    # segment the second-to-last bases are used.
    bp_seg = jnp.minimum(seg, cfg.nr_segs - 2)
    return RefData(
        p_d=p_d,
        dp_d=dp_d,
        dp_normed_d=params.dp_normed[seg],
        bp1=params.bp1[bp_seg],
        bp2=params.bp2[bp_seg],
        br1=params.br1[seg],
        br2=params.br2[seg],
        v1=params.v1[seg],
        v2=params.v2[seg],
        v3=params.v3[seg],
        bound_lower=bound_lower,
        bound_upper=bound_upper,
        r_par_bound=r_par_bound,
        e_p_off=e_p_off,
        e_r_off=e_r_off,
    )


def stage_error(cfg: OcpConfig, params: OcpParams, ref: RefData, p: jnp.ndarray,
                v: jnp.ndarray, dphi: jnp.ndarray, phi: jnp.ndarray) -> ErrData:
    """error_function semantics (bound_mpc_functions.py:158-202)."""
    # Position error split (mpc_utils_casadi.compute_position_error :19-67)
    e = p[:3] - ref.p_d[:3]
    dp_des = ref.dp_d[:3]
    e_par = jnp.dot(dp_des, e) * dp_des
    e_orth = e - e_par
    de = v[:3] - dp_des * dphi
    de_par = jnp.dot(dp_des, de) * dp_des
    de_orth = de - de_par

    # Orientation error linearization (integrate_rot_error_diff :6-10)
    e_r = (
        params.dtau_init
        + params.jac_dtau_l @ (p[3:] - params.p0[3:])
        - params.jac_dtau_r @ (ref.p_d[3:] - params.iw_ref0)
    )
    de_r = params.jac_dtau_l @ v[3:] - params.jac_dtau_r @ (ref.dp_d[3:] * dphi)

    seg = segment_index(phi, params.phi_switch, cfg.nr_segs)
    e_par_init = params.dtau_init_par[seg]
    e_orth1_init = params.dtau_init_orth1[seg]
    e_orth2_init = params.dtau_init_orth2[seg]

    diff = e_r - params.dtau_init
    scal_orth1 = jnp.dot(diff, ref.v1)
    scal_par = jnp.dot(diff, ref.v2)
    scal_orth2 = jnp.dot(diff, ref.v3)

    e_r_orth1 = e_orth1_init + scal_orth1 * ref.br1
    e_r_par = e_par_init + scal_par * ref.dp_normed_d
    e_r_orth2 = e_orth2_init + scal_orth2 * ref.br2

    return ErrData(
        e_p_par=e_par,
        e_p_orth=e_orth,
        de_p_par=de_par,
        de_p_orth=de_orth,
        e_p=e,
        de_p=de,
        e_r_par=e_r_par,
        e_r=e_r,
        de_r=de_r,
        e_r_orth1=e_r_orth1,
        e_r_orth2=e_r_orth2,
    )


# ---------------------------------------------------------------------------
# Objective and constraints
# ---------------------------------------------------------------------------

class StageEval(NamedTuple):
    traj: Trajectory
    ref: RefData  # leading (N,) axis
    err: ErrData  # leading (N,) axis


def evaluate_stages(cfg: OcpConfig, coeffs: jerkint.JerkCoeffs,
                    params: OcpParams, u: jnp.ndarray) -> StageEval:
    traj = rollout(cfg, coeffs, params, u)
    ref = jax.vmap(lambda phi: stage_reference(cfg, params, phi))(traj.phi)
    err = jax.vmap(
        lambda r, p, v, dphi, phi: stage_error(cfg, params, r, p, v, dphi, phi)
    )(ref, traj.p, traj.v, traj.dphi, traj.phi)
    return StageEval(traj, ref, err)


def objective(cfg: OcpConfig, params: OcpParams, ev: StageEval,
              u: jnp.ndarray) -> jnp.ndarray:
    """15-weight stage objective with sigmoid end-of-path blending —
    casadi_ocp_formulation.py:237-264 + objective_function
    (bound_mpc_functions.py:205-246)."""
    w = params.weights
    traj, ref, err = ev.traj, ev.ref, ev.err

    # jax.nn.sigmoid == the reference sigmoid (casadi_ocp_formulation.py:242)
    # but overflow-safe in float32 (exp(690) = inf would NaN the JVP).
    sigm = jax.nn.sigmoid(100.0 * (traj.phi - (params.phi_max - 0.02)))
    e_p_obj = sigm[:, None] * err.e_p + (1.0 - sigm)[:, None] * err.e_p_par
    e_r_obj = sigm[:, None] * err.e_r + (1.0 - sigm)[:, None] * err.e_r_par

    v_ref = traj.dphi[:, None] * ref.dp_d
    a_ref = traj.ddphi[:, None] * ref.dp_d

    def ssq(x):
        return jnp.sum(x * x)

    obj = w[0] * ssq(e_p_obj) + w[1] * ssq(e_r_obj)
    obj += w[2] * ssq(traj.v - v_ref)
    obj += w[5] * ssq(traj.a - a_ref)
    obj += w[10] * ssq(traj.q - params.qd[None, :])
    obj += w[11] * ssq(traj.dq) + w[12] * ssq(traj.ddq)
    obj += w[13] * ssq(u[:, : cfg.nr_joints])
    obj += w[6] * ssq(params.x_phi_d[0] - traj.phi)
    obj += w[7] * ssq(params.x_phi_d[1] - traj.dphi)
    obj += w[8] * ssq(params.x_phi_d[2] - traj.ddphi)
    obj += w[9] * ssq(u[:, cfg.nr_joints])
    return obj


def nonlin_constraints(cfg: OcpConfig, params: OcpParams, ev: StageEval,
                       scaled: bool = False,
                       margin: float = 0.0) -> jnp.ndarray:
    """The 5 per-stage nonlinear bound constraints c <= 0, shape (N, 5):
    [tangential rot, pos-orth1, pos-orth2, rot-orth1, rot-orth2]
    (casadi_ocp_formulation.py:316-349).

    ``scaled=True`` normalizes each squared constraint by its bound^2 so the
    barrier sees homogeneous O(1) rows (the reference's raw constraints span
    1e-4 .. 0.25 across the asymmetric-corridor scenarios, which destroys
    float32 barrier conditioning).  Scaling by a positive factor leaves the
    constraint set — and hence the NLP's KKT points — unchanged; reported
    violations always use the unscaled reference units.

    ``margin`` (solver-view constraint TIGHTENING, SolverConfig.margin)
    shrinks the three ORIENTATION bounds (tangential, rot-orth1, rot-orth2)
    to (1-margin)*b inside the solve only: executed plans then keep
    clearance that absorbs the per-tick RE-LINEARIZATION jump of the
    orientation error (new projection vectors / rotation re-anchoring read
    the same physical state up to ~10 mrad differently), which otherwise
    parks lanes exactly ON the bound and makes the next tick's NLP
    hard-infeasible at stage 0 — the measured deep-region death mechanism
    (bound-riding at the quartic dip, r5 soak forensics).  The POSITION
    bounds are NOT margined: e_p is exact (pure FK, no linearization), so
    there is no jump to absorb, and tightening the 1 cm corridor dips was
    measured to CREATE early-region failures (test_runtime_f32 lane 3).
    Success is always judged against the TRUE margin-free bounds
    (`finish`, full_constraints with margin=0), mirroring the reference's
    criterion (BoundMPC.py:465).  The scale denominator stays the true
    bound^2.
    """
    ref, err = ev.ref, ev.err
    msq = (1.0 - margin) ** 2

    def norm(csq, bound_sq):
        if not scaled:
            return csq
        return csq / jnp.maximum(bound_sq, 1e-2)

    e_r_proj = jnp.einsum("ki,ki->k", ref.dp_normed_d, err.e_r_par)
    c_tang = norm(e_r_proj**2 - msq * ref.r_par_bound**2,
                  ref.r_par_bound**2)

    # Position: squared-slack form (decomp_function, bound_mpc_functions.py:298-310)
    e1 = jnp.einsum("ki,ki->k", err.e_p, ref.bp1) - ref.e_p_off[:, 0]
    e2 = jnp.einsum("ki,ki->k", err.e_p, ref.bp2) - ref.e_p_off[:, 1]
    pb = 0.5 * (ref.bound_upper[:, :2] - ref.bound_lower[:, :2])
    c_p1 = norm(e1**2 - pb[:, 0] ** 2, pb[:, 0] ** 2)
    c_p2 = norm(e2**2 - pb[:, 1] ** 2, pb[:, 1] ** 2)

    r1 = jnp.einsum("ki,ki->k", ref.br1, err.e_r_orth1) - ref.e_r_off[:, 0]
    r2 = jnp.einsum("ki,ki->k", ref.br2, err.e_r_orth2) - ref.e_r_off[:, 1]
    rb = 0.5 * (ref.bound_upper[:, 2:] - ref.bound_lower[:, 2:])
    c_r1 = norm(r1**2 - msq * rb[:, 0] ** 2, rb[:, 0] ** 2)
    c_r2 = norm(r2**2 - msq * rb[:, 1] ** 2, rb[:, 1] ** 2)

    return jnp.stack([c_tang, c_p1, c_p2, c_r1, c_r2], axis=-1)


def linear_constraints(cfg: OcpConfig, params: OcpParams, ev: StageEval,
                       u: jnp.ndarray, limits: kinematics.RobotLimits) -> jnp.ndarray:
    """All box/linear inequalities as a flat c <= 0 vector:
    state bounds q/dq (casadi_ocp_formulation.py:131-139), phi >= 0 (:150),
    phi <= phi_max / dphi <= dphi_max (:305-314), jerk box on u (:93-99)."""
    traj = ev.traj
    cs = [
        (traj.q - limits.q_upper[None, :]).ravel(),
        (limits.q_lower[None, :] - traj.q).ravel(),
        (traj.dq - limits.dq_upper[None, :]).ravel(),
        (limits.dq_lower[None, :] - traj.dq).ravel(),
        -traj.phi,
        traj.phi - params.phi_max,
        traj.dphi - params.dphi_max,
        (u - limits.u_max).ravel(),
        (limits.u_min - u).ravel(),
    ]
    return jnp.concatenate(cs)


def full_constraints(cfg: OcpConfig, params: OcpParams, ev: StageEval,
                     u: jnp.ndarray, limits: kinematics.RobotLimits,
                     scaled: bool = False, margin: float = 0.0) -> jnp.ndarray:
    return jnp.concatenate(
        [nonlin_constraints(cfg, params, ev, scaled=scaled,
                            margin=margin).ravel(),
         linear_constraints(cfg, params, ev, u, limits)]
    )


def objective_and_constraints(cfg: OcpConfig, coeffs: jerkint.JerkCoeffs,
                              params: OcpParams, u: jnp.ndarray,
                              limits: kinematics.RobotLimits):
    """One-rollout evaluation of (f, c) — the solver's model function."""
    ev = evaluate_stages(cfg, coeffs, params, u)
    return objective(cfg, params, ev, u), full_constraints(cfg, params, ev, u, limits)


def residuals(cfg: OcpConfig, params: OcpParams, ev: StageEval,
              u: jnp.ndarray) -> jnp.ndarray:
    """Weighted least-squares residual vector r with objective == sum(r^2)
    exactly (weights folded under sqrt) — the Gauss-Newton view of
    ``objective``.  Shape (N * 50,)."""
    sw = jnp.sqrt(params.weights)
    traj, ref, err = ev.traj, ev.ref, ev.err

    # jax.nn.sigmoid == the reference sigmoid (casadi_ocp_formulation.py:242)
    # but overflow-safe in float32 (exp(690) = inf would NaN the JVP).
    sigm = jax.nn.sigmoid(100.0 * (traj.phi - (params.phi_max - 0.02)))
    e_p_obj = sigm[:, None] * err.e_p + (1.0 - sigm)[:, None] * err.e_p_par
    e_r_obj = sigm[:, None] * err.e_r + (1.0 - sigm)[:, None] * err.e_r_par
    v_ref = traj.dphi[:, None] * ref.dp_d
    a_ref = traj.ddphi[:, None] * ref.dp_d

    blocks = [
        sw[0] * e_p_obj,  # (N, 3)
        sw[1] * e_r_obj,  # (N, 3)
        sw[2] * (traj.v - v_ref),  # (N, 6)
        sw[5] * (traj.a - a_ref),  # (N, 6)
        sw[10] * (traj.q - params.qd[None, :]),  # (N, 7)
        sw[11] * traj.dq,  # (N, 7)
        sw[12] * traj.ddq,  # (N, 7)
        sw[13] * u[:, : cfg.nr_joints],  # (N, 7)
        sw[6] * (params.x_phi_d[0] - traj.phi)[:, None],
        sw[7] * (params.x_phi_d[1] - traj.dphi)[:, None],
        sw[8] * (params.x_phi_d[2] - traj.ddphi)[:, None],
        sw[9] * u[:, cfg.nr_joints:],
    ]
    return jnp.concatenate(blocks, axis=-1).ravel()


def residuals_and_constraints(cfg: OcpConfig, coeffs: jerkint.JerkCoeffs,
                              params: OcpParams, u: jnp.ndarray,
                              limits: kinematics.RobotLimits,
                              scaled: bool = False, margin: float = 0.0):
    """(r, c) in one rollout — what the GN solver differentiates."""
    ev = evaluate_stages(cfg, coeffs, params, u)
    return residuals(cfg, params, ev, u), full_constraints(
        cfg, params, ev, u, limits, scaled=scaled, margin=margin)
