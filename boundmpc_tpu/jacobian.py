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
                     dphi, ddphi, iw, v_prev, scaled=False):
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

    # Nonlinear constraints (ocp.nonlin_constraints, single stage)
    e_r_proj = jnp.dot(ref.dp_normed_d, err.e_r_par)
    c_tang = e_r_proj**2 - ref.r_par_bound**2  # scaled below
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
        norm(r1**2 - rb[0] ** 2, rb[0] ** 2),
        norm(r2**2 - rb[1] ** 2, rb[1] ** 2),
    ])  # (5,)

    return jnp.concatenate([r_nl, c_nl, v])  # (29,)


def stage_jacobians(cfg: ocp.OcpConfig, params: ocp.OcpParams,
                    traj: ocp.Trajectory, v_prev_all: jnp.ndarray,
                    scaled: bool = False) -> StageJacPieces:
    """vmapped per-stage jacfwd: 26 tangents through ONE FK chain each."""

    def jac_one(q, dq, phi, dphi, ddphi, iw, v_prev):
        f = lambda *a: _stage_nonlinear(cfg, params, *a, scaled=scaled)
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


def assemble_jacobians(cfg: ocp.OcpConfig, lmaps: LinearJacs,
                       params: ocp.OcpParams, traj: ocp.Trajectory,
                       pieces: StageJacPieces, u: jnp.ndarray):
    """Full (Jr, Jc) matching ocp.residuals_and_constraints' AD Jacobians.

    Returns Jr (N*50, N*8), Jc (M, N*8)."""
    N, dtype = cfg.N, u.dtype
    n = N * 8
    cp, cv, ca = lmaps.cp, lmaps.cv, lmaps.ca
    sw = jnp.sqrt(params.weights)

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

    D_rnl = Dout[:, :18]  # (N, 18, N, 8)
    D_cnl = Dout[:, 18:23]  # (N, 5, N, 8)

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


def residuals_constraints_and_jacobians(cfg: ocp.OcpConfig,
                                        coeffs: jerkint.JerkCoeffs,
                                        lmaps: LinearJacs,
                                        params: ocp.OcpParams,
                                        u: jnp.ndarray, limits,
                                        scaled: bool = False):
    """(r, c, Jr, Jc) with structured assembly — the solver's fast path."""
    ev = ocp.evaluate_stages(cfg, coeffs, params, u)
    r = ocp.residuals(cfg, params, ev, u)
    c = ocp.full_constraints(cfg, params, ev, u, limits, scaled=scaled)
    v_prev_all = jnp.concatenate([params.v0[None], ev.traj.v[:-1]], axis=0)
    pieces = stage_jacobians(cfg, params, ev.traj, v_prev_all, scaled=scaled)
    Jr, Jc = assemble_jacobians(cfg, lmaps, params, ev.traj, pieces, u)
    return r, c, Jr, Jc
