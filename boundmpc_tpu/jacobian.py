"""Structured Jacobian assembly for the condensed OCP.

The naive way to get the solver's (residual, constraint) Jacobians is an
80-tangent `jacfwd` through the whole rollout — every tangent re-propagates
through every stage's FK chain.  This module exploits the structure AD can't
see:

  * stage states are LINEAR in the jerk knots with constant coefficient
    matrices (jerkint):  dq_k/dU[l, j] = cp[k, l] e_j  etc.
  * every nonlinear output is STAGE-LOCAL given (q, dq, phi, dphi, ddphi,
    iw, v_prev) — 26 inputs — except the integrated-omega chain, which is a
    cumulative sum of per-stage omega sensitivities.

So: one vmapped per-stage `jacfwd` with 26 tangents (vs 80 through N
stages), then pure einsum chaining with the constant maps (MXU work).  The
linear residual/constraint blocks get constant precomputed Jacobians — no AD
at all.

Output layout MUST match ocp.residuals / ocp.full_constraints exactly; the
equality is asserted against the AD Jacobian in tests/test_jacobian.py.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import jerkint, kinematics, ocp


# Residual block layout per stage (ocp.residuals): concat along features
#   e_p_obj 3 | e_r_obj 3 | v-vref 6 | a-aref 6 | q-qd 7 | dq 7 | ddq 7 |
#   u[:7] 7 | phi 1 | dphi 1 | ddphi 1 | uphi 1    == 50
_R_PER_STAGE = 50
# Nonlinear stage outputs differentiated with AD: the first 18 residual
# features (e_p_obj, e_r_obj, v-vref, a-aref) + 5 constraints + v (6).
_NL_OUT = 18 + 5 + 6


class StageJacPieces(NamedTuple):
    """Per-stage jacobians of the nonlinear outputs w.r.t. local inputs."""

    S_q: jnp.ndarray  # (N, out, 7)
    S_dq: jnp.ndarray  # (N, out, 7)
    S_phi: jnp.ndarray  # (N, out)
    S_dphi: jnp.ndarray  # (N, out)
    S_ddphi: jnp.ndarray  # (N, out)
    S_iw: jnp.ndarray  # (N, out, 3)
    S_vprev: jnp.ndarray  # (N, out, 6)


def _stage_nonlinear(cfg: ocp.OcpConfig, params: ocp.OcpParams, q, dq, phi,
                     dphi, ddphi, iw, v_prev, scaled=False, margin=0.0):
    """All FK-dependent per-stage outputs: (r_nl (18), c_nl (5), v (6)).

    Mirrors ocp.residuals / ocp.nonlin_constraints for a single stage."""
    pos = kinematics.fk_pos(q)
    J = kinematics.jacobian(q)
    v = J @ dq
    p = jnp.concatenate([pos, iw])

    ref = ocp.stage_reference(cfg, params, phi)
    err = ocp.stage_error(cfg, params, ref, p, v, dphi, phi)

    sw = jnp.sqrt(params.weights)
    sigm = jax.nn.sigmoid(100.0 * (phi - (params.phi_max - 0.02)))
    e_p_obj = sigm * err.e_p + (1.0 - sigm) * err.e_p_par
    e_r_obj = sigm * err.e_r + (1.0 - sigm) * err.e_r_par
    v_ref = dphi * ref.dp_d
    a_ref = ddphi * ref.dp_d
    a = (v - v_prev) / cfg.dt

    r_nl = jnp.concatenate([
        sw[0] * e_p_obj, sw[1] * e_r_obj, sw[2] * (v - v_ref),
        sw[5] * (a - a_ref),
    ])  # (18,)

    # Nonlinear constraints (ocp.nonlin_constraints, single stage; margin =
    # solver-view tightening of the ORIENTATION bounds only — see that
    # docstring for why position rows stay unmargined)
    msq = (1.0 - margin) ** 2
    e_r_proj = jnp.dot(ref.dp_normed_d, err.e_r_par)
    c_tang = e_r_proj**2 - msq * ref.r_par_bound**2  # scaled below
    e1 = jnp.dot(err.e_p, ref.bp1) - ref.e_p_off[0]
    e2 = jnp.dot(err.e_p, ref.bp2) - ref.e_p_off[1]
    pb = 0.5 * (ref.bound_upper[:2] - ref.bound_lower[:2])
    r1 = jnp.dot(ref.br1, err.e_r_orth1) - ref.e_r_off[0]
    r2 = jnp.dot(ref.br2, err.e_r_orth2) - ref.e_r_off[1]
    rb = 0.5 * (ref.bound_upper[2:] - ref.bound_lower[2:])
    def norm(csq, bsq):
        return csq / jnp.maximum(bsq, 1e-2) if scaled else csq

    c_nl = jnp.stack([
        norm(c_tang, ref.r_par_bound**2),
        norm(e1**2 - pb[0] ** 2, pb[0] ** 2),
        norm(e2**2 - pb[1] ** 2, pb[1] ** 2),
        norm(r1**2 - msq * rb[0] ** 2, rb[0] ** 2),
        norm(r2**2 - msq * rb[1] ** 2, rb[1] ** 2),
    ])  # (5,)

    return jnp.concatenate([r_nl, c_nl, v])  # (29,)


def stage_jacobians(cfg: ocp.OcpConfig, params: ocp.OcpParams,
                    traj: ocp.Trajectory, v_prev_all: jnp.ndarray,
                    scaled: bool = False,
                    margin: float = 0.0) -> StageJacPieces:
    """vmapped per-stage jacfwd: 26 tangents through ONE FK chain each."""

    def jac_one(q, dq, phi, dphi, ddphi, iw, v_prev):
        f = lambda *a: _stage_nonlinear(cfg, params, *a, scaled=scaled,
                                        margin=margin)
        jacs = jax.jacfwd(f, argnums=(0, 1, 2, 3, 4, 5, 6))(
            q, dq, phi, dphi, ddphi, iw, v_prev
        )
        return jacs

    Sq, Sdq, Sphi, Sdphi, Sddphi, Siw, Svp = jax.vmap(jac_one)(
        traj.q, traj.dq, traj.phi, traj.dphi, traj.ddphi, traj.p[:, 3:],
        v_prev_all,
    )
    return StageJacPieces(Sq, Sdq, Sphi, Sdphi, Sddphi, Siw, Svp)


@lru_cache(maxsize=None)
def _linear_maps_np(N: int, dt: float):
    """Decision-variable coefficient maps: states at t_1..t_N w.r.t. the
    decision knots U (N, 8) (u_all row 0 is the fixed previous knot)."""
    _, c_pos, c_vel, c_acc = jerkint._coeff_matrices_np(N, dt)
    cp = c_pos[:, 1:]  # (N, N)
    cv = c_vel[:, 1:]
    ca = c_acc[:, 1:]
    return cp, cv, ca


class LinearJacs(NamedTuple):
    """Constant Jacobian blocks of all LINEAR residuals/constraints w.r.t.
    the flat decision vector (N*8,).  Built once per (N, dt, weights-free
    shape); weight scaling applied at call time."""

    cp: jnp.ndarray  # (N, N)
    cv: jnp.ndarray
    ca: jnp.ndarray


def linear_maps(cfg: ocp.OcpConfig, dtype) -> LinearJacs:
    cp, cv, ca = _linear_maps_np(cfg.N, cfg.dt)
    return LinearJacs(jnp.asarray(cp, dtype), jnp.asarray(cv, dtype),
                      jnp.asarray(ca, dtype))


def _scatter_joint(maps: jnp.ndarray, N: int, dtype):
    """(N, N) per-joint scalar map -> (N, 7, N, 8) block-diagonal in joints."""
    eye7 = jnp.eye(7, dtype=dtype)
    out = jnp.einsum("kl,jm->kjlm", maps, eye7)  # (N, 7, N, 7)
    pad = jnp.zeros((N, 7, N, 1), dtype)
    return jnp.concatenate([out, pad], axis=-1)  # (N, 7, N, 8)


def chain_nonlinear(cfg: ocp.OcpConfig, lmaps: LinearJacs,
                    pieces: StageJacPieces, dtype) -> jnp.ndarray:
    """Chain the per-stage local jacobians through the constant linear maps
    into the full nonlinear-output jacobian Dout (N, 29, N, 8)."""
    N = cfg.N
    cp, cv, ca = lmaps.cp, lmaps.cv, lmaps.ca
    nl = pieces  # aliases
    out = _NL_OUT  # 29

    # --- sensitivities of v (rows 23:29 of the stage outputs) ---
    Sv_q = nl.S_q[:, 23:29, :]  # (N, 6, 7)
    Sv_dq = nl.S_dq[:, 23:29, :]
    # Dv[k, p, l, j]: j<7 joints only
    Dv = (
        jnp.einsum("kpj,kl->kplj", Sv_q, cp)
        + jnp.einsum("kpj,kl->kplj", Sv_dq, cv)
    )  # (N, 6, N, 7)
    Dv = jnp.concatenate([Dv, jnp.zeros((N, 6, N, 1), dtype)], axis=-1)  # (N,6,N,8)

    # --- integrated omega chain: iw_k = iw0 + dt/2 sum_{m=1..k}(w_{m-1}+w_m),
    # omega_0 is u-independent.  Domega[m] = Dv[m, 3:, ...]
    Domega = Dv[:, 3:, :, :]  # (N, 3, N, 8)
    csum = jnp.cumsum(Domega, axis=0)
    prev = jnp.concatenate([jnp.zeros((1, 3, N, 8), dtype), csum[:-1]], axis=0)
    Diw = 0.5 * cfg.dt * (csum + prev)  # (N, 3, N, 8)

    # Dv_prev[k] = Dv[k-1] (Dv_prev[0] = 0: v0 fixed)
    Dv_prev = jnp.concatenate([jnp.zeros((1, 6, N, 8), dtype), Dv[:-1]], axis=0)

    # --- chain everything into the nonlinear output jacobian (N, 29, N, 8)
    phi_col = jnp.zeros((8,), dtype).at[7].set(1.0)
    Dout = (
        jnp.einsum("koj,kl->kolj", nl.S_q, cp)
        + jnp.einsum("koj,kl->kolj", nl.S_dq, cv)
    )
    Dout = jnp.concatenate([Dout, jnp.zeros((N, out, N, 1), dtype)], axis=-1)
    Dout = Dout + jnp.einsum("ko,kl,m->kolm", nl.S_phi, cp, phi_col)
    Dout = Dout + jnp.einsum("ko,kl,m->kolm", nl.S_dphi, cv, phi_col)
    Dout = Dout + jnp.einsum("ko,kl,m->kolm", nl.S_ddphi, ca, phi_col)
    Dout = Dout + jnp.einsum("kop,kplm->kolm", nl.S_iw, Diw)
    Dout = Dout + jnp.einsum("kop,kplm->kolm", nl.S_vprev, Dv_prev)
    return Dout


def assemble_jacobians(cfg: ocp.OcpConfig, lmaps: LinearJacs,
                       params: ocp.OcpParams, traj: ocp.Trajectory,
                       pieces: StageJacPieces, u: jnp.ndarray):
    """Full (Jr, Jc) matching ocp.residuals_and_constraints' AD Jacobians.

    Returns Jr (N*50, N*8), Jc (M, N*8)."""
    N, dtype = cfg.N, u.dtype
    n = N * 8
    cp, cv, ca = lmaps.cp, lmaps.cv, lmaps.ca
    sw = jnp.sqrt(params.weights)

    Dout = chain_nonlinear(cfg, lmaps, pieces, dtype)
    D_rnl = Dout[:, :18]  # (N, 18, N, 8)
    D_cnl = Dout[:, 18:23]  # (N, 5, N, 8)
    phi_col = jnp.zeros((8,), dtype).at[7].set(1.0)

    # --- linear residual blocks (constant jacobians, weight-scaled) ---
    zero = jnp.zeros((N, 7, N, 8), dtype)
    Jq = _scatter_joint(cp, N, dtype)  # d q_k / dU
    Jdq = _scatter_joint(cv, N, dtype)
    Jddq = _scatter_joint(ca, N, dtype)
    eyeN = jnp.eye(N, dtype=dtype)
    # u residual block: d u[k, :7] / dU[l, j] = delta_kl delta_j(<7)
    Ju = jnp.einsum("kl,jm->kjlm", eyeN, jnp.eye(7, 8, dtype=dtype))
    # phi-chain rows (scalars): d phi_k/dU[l, 7]
    row = lambda mat: jnp.einsum("kl,m->klm", mat, phi_col)[:, None]  # (N,1,N,8)

    r_blocks = [
        D_rnl[:, 0:3], D_rnl[:, 3:6], D_rnl[:, 6:12], D_rnl[:, 12:18],
        sw[10] * Jq, sw[11] * Jdq, sw[12] * Jddq, sw[13] * Ju,
        -sw[6] * row(cp), -sw[7] * row(cv), -sw[8] * row(ca),
        sw[9] * jnp.einsum("kl,m->klm", eyeN, phi_col)[:, None],
    ]
    Jr = jnp.concatenate(r_blocks, axis=1).reshape(N * _R_PER_STAGE, n)

    # --- constraints: nonlinear first, then the linear blocks in
    # ocp.linear_constraints order ---
    Jc_nl = D_cnl.reshape(N * 5, n)
    Jc_lin = jnp.concatenate([
        Jq.reshape(N * 7, n), -Jq.reshape(N * 7, n),
        Jdq.reshape(N * 7, n), -Jdq.reshape(N * 7, n),
        -row(cp).reshape(N, n), row(cp).reshape(N, n), row(cv).reshape(N, n),
        jnp.eye(n, dtype=dtype), -jnp.eye(n, dtype=dtype),
    ], axis=0)
    Jc = jnp.concatenate([Jc_nl, Jc_lin], axis=0)
    return Jr, Jc


# ---------------------------------------------------------------------------
# Trace-time CONSTANT jacobian blocks (pure numpy).  Everything linear in u
# has an iteration- AND tick-constant jacobian built from the jerk
# integration maps; recomputing these with AD every solve (round-2 design)
# wasted a full jacfwd sweep plus a batched 320x80 XLA QR per tick.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _box_jacobians_np(N: int, dt: float):
    """Constant jacobians of the box-constraint rows (ocp.linear_constraints
    order): d(q)/dU (7N, n), d(dq)/dU (7N, n), d(phi)/dU (N, n),
    d(dphi)/dU (N, n)."""
    cp, cv, _ = _linear_maps_np(N, dt)
    n = N * 8
    eye7 = np.eye(7)

    def scatter(m):
        out = np.einsum("kl,jm->kjlm", m, eye7)  # (N, 7, N, 7)
        out = np.concatenate([out, np.zeros((N, 7, N, 1))], axis=-1)
        return out.reshape(N * 7, n)

    phi_col = np.zeros(8)
    phi_col[7] = 1.0
    row = lambda m: np.einsum("kl,m->klm", m, phi_col).reshape(N, n)
    return scatter(cp), scatter(cv), row(cp), row(cv)


def box_jacobians(cfg: ocp.OcpConfig, dtype):
    jq, jdq, jphi, jdphi = _box_jacobians_np(cfg.N, cfg.dt)
    return (jnp.asarray(jq, dtype), jnp.asarray(jdq, dtype),
            jnp.asarray(jphi, dtype), jnp.asarray(jdphi, dtype))


@lru_cache(maxsize=None)
def _linear_stack_np(N: int, dt: float):
    """UNWEIGHTED constant jacobian stack M (32N, n) of the linear residual
    rows in BLOCK order [q(7N); dq(7N); ddq(7N); u(7N); phi(N); dphi(N);
    ddphi(N); uphi(N)], plus the index map into the 8 per-block sqrt-weight
    slots [10, 11, 12, 13, 6, 7, 8, 9] (ocp.residuals layout, signs folded:
    the phi-chain residuals are sw*(target - x) so their jacobians are
    NEGATED maps)."""
    cp, cv, ca = _linear_maps_np(N, dt)
    n = N * 8
    eye7 = np.eye(7)

    def scatter(m):
        out = np.einsum("kl,jm->kjlm", m, eye7)
        out = np.concatenate([out, np.zeros((N, 7, N, 1))], axis=-1)
        return out.reshape(N * 7, n)

    Ju = np.einsum("kl,jm->kjlm", np.eye(N), np.eye(7, 8)).reshape(N * 7, n)
    phi_col = np.zeros(8)
    phi_col[7] = 1.0
    row = lambda m: np.einsum("kl,m->klm", m, phi_col).reshape(N, n)
    Juphi = np.einsum("kl,m->klm", np.eye(N), phi_col).reshape(N, n)

    M = np.concatenate([
        scatter(cp), scatter(cv), scatter(ca), Ju,
        -row(cp), -row(cv), -row(ca), Juphi,
    ], axis=0)  # (32N, n)
    widx = np.concatenate([
        np.full(7 * N, 0), np.full(7 * N, 1), np.full(7 * N, 2),
        np.full(7 * N, 3), np.full(N, 4), np.full(N, 5), np.full(N, 6),
        np.full(N, 7),
    ]).astype(np.int32)
    return M, widx


# sqrt-weight slots per linear block, aligned with _linear_stack_np's widx
_LIN_W_SLOTS = np.array([10, 11, 12, 13, 6, 7, 8, 9])


def linear_stack(cfg: ocp.OcpConfig, weights: jnp.ndarray, dtype):
    """Weighted linear residual jacobian J_lin (32N, n) for the given
    (already w6-adjusted) weight vector."""
    M, widx = _linear_stack_np(cfg.N, cfg.dt)
    sw = jnp.sqrt(weights)[jnp.asarray(_LIN_W_SLOTS)]
    bw = sw[jnp.asarray(widx)]
    return bw[:, None] * jnp.asarray(M, dtype)


def linear_offsets(cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs,
                   params: ocp.OcpParams, dtype) -> jnp.ndarray:
    """c_lin (32N,): the linear residual VALUES at u = 0 in the same block
    order, so that r_lin(u) = J_lin @ u_flat + c_lin exactly.  One zero-input
    triple-integrator rollout — no FK, no AD."""
    N = cfg.N
    sw = jnp.sqrt(params.weights)
    u_prev = jnp.concatenate([params.u_prev, params.uphi_prev[None]])
    u_all = jnp.concatenate([u_prev[None], jnp.zeros((N, 8), dtype)], axis=0)
    qz, dqz, ddqz = jerkint.rollout_linear(
        coeffs, u_all[:, :7], params.q0, params.dq0, params.ddq0)
    phz, dphz, ddphz = jerkint.rollout_linear(
        coeffs, u_all[:, 7:], params.phi0[None], params.dphi0[None],
        params.ddphi0[None])
    return jnp.concatenate([
        (sw[10] * (qz - params.qd[None, :])).ravel(),
        (sw[11] * dqz).ravel(),
        (sw[12] * ddqz).ravel(),
        jnp.zeros(7 * N, dtype),
        sw[6] * (params.x_phi_d[0] - phz[:, 0]),
        sw[7] * (params.x_phi_d[1] - dphz[:, 0]),
        sw[8] * (params.x_phi_d[2] - ddphz[:, 0]),
        jnp.zeros(N, dtype),
    ])


def reduced_jacobians(cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs,
                      lmaps: LinearJacs, params: ocp.OcpParams,
                      u: jnp.ndarray, limits, scaled: bool = False,
                      margin: float = 0.0):
    """(r, c, Jr_dyn (18N, n), Jc_nl (5N, n)) — values for everything, but
    jacobians ONLY for the state-dependent (FK-coupled) rows.  The linear
    residual rows are covered by the QR prefactor (solver method "qr") and
    the box-constraint rows by the trace-time constants above."""
    ev = ocp.evaluate_stages(cfg, coeffs, params, u)
    r = ocp.residuals(cfg, params, ev, u)
    c = ocp.full_constraints(cfg, params, ev, u, limits, scaled=scaled,
                             margin=margin)
    v_prev_all = jnp.concatenate([params.v0[None], ev.traj.v[:-1]], axis=0)
    pieces = stage_jacobians(cfg, params, ev.traj, v_prev_all, scaled=scaled,
                             margin=margin)
    Dout = chain_nonlinear(cfg, lmaps, pieces, u.dtype)
    n = cfg.N * 8
    Jr_dyn = Dout[:, :18].reshape(cfg.N * 18, n)
    Jc_nl = Dout[:, 18:23].reshape(cfg.N * 5, n)
    return r, c, Jr_dyn, Jc_nl


def residuals_constraints_and_jacobians(cfg: ocp.OcpConfig,
                                        coeffs: jerkint.JerkCoeffs,
                                        lmaps: LinearJacs,
                                        params: ocp.OcpParams,
                                        u: jnp.ndarray, limits,
                                        scaled: bool = False,
                                        margin: float = 0.0):
    """(r, c, Jr, Jc) with structured assembly — the solver's fast path."""
    ev = ocp.evaluate_stages(cfg, coeffs, params, u)
    r = ocp.residuals(cfg, params, ev, u)
    c = ocp.full_constraints(cfg, params, ev, u, limits, scaled=scaled,
                             margin=margin)
    v_prev_all = jnp.concatenate([params.v0[None], ev.traj.v[:-1]], axis=0)
    pieces = stage_jacobians(cfg, params, ev.traj, v_prev_all, scaled=scaled,
                             margin=margin)
    Jr, Jc = assemble_jacobians(cfg, lmaps, params, ev.traj, pieces, u)
    return r, c, Jr, Jc
