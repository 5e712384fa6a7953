"""Horizon-wise rotation-error diagnostics (the Plotter's regression oracle).

The reference's Plotter recomputes "true" orientation errors from the logged
poses via Euler decomposition in the path frame and compares them with the
MPC's linearized ones — the "approximation error" figure is its regression
check on the Lie-linearization (Plotter.py:96-135, 240-247).  This module
computes both, jit-compiled, per tick:

  * linearized plane errors: the solver's own projected coordinates
    (scal_orth1/scal_orth2/scal_par of ocp.stage_error);
  * true plane errors: the exact log-map error e_r = log(R_fk(q_k) R_ref^T)
    against the rotation reference advanced across horizon segment switches
    (BoundMPC.py:646-752), decomposed with the same zyx-Euler path-frame
    construction (util_functions.compute_initial_rot_errors :11-31).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import jerkint, kinematics, lie, ocp


def _plane_coords(e_r_mat_ref, br1, br2, dp_normed):
    """zyx-Euler decomposition of a rotation error in the path frame —
    returns (orth1, orth2, par) scalars (Plotter.py:106-119)."""
    r01 = jnp.stack([br2, dp_normed, br1], axis=-1)
    dtau_01 = r01.T @ e_r_mat_ref @ r01
    eul = lie.euler_zyx(dtau_01)
    return jnp.stack([eul[0], eul[2], eul[1]])  # (orth1, orth2, par)


def horizon_plane_errors(cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs,
                         params: ocp.OcpParams, u: jnp.ndarray,
                         pr_ref0: jnp.ndarray, phi0: jnp.ndarray,
                         via_rotvec_win: jnp.ndarray):
    """(lin (N, 3), true (N, 3)) plane rotation errors over the horizon.

    ``pr_ref0``/``phi0`` anchor the rotation reference at the tick start;
    ``via_rotvec_win`` holds the window's via rotation vectors
    (path.via_rotvec[sector : sector + 3]).  The reference is advanced
    stage-to-stage, re-anchoring at the via rotation when a switch is
    crossed, exactly like the reference's logged-data correction
    (BoundMPC.py:711-733).
    """
    ev = ocp.evaluate_stages(cfg, coeffs, params, u)
    traj, ref, err = ev.traj, ev.ref, ev.err

    # Linearized coordinates: the solver's own projections.
    lin = jnp.stack([
        jnp.einsum("ki,ki->k", ref.br1, err.e_r_orth1),
        jnp.einsum("ki,ki->k", ref.br2, err.e_r_orth2),
        jnp.einsum("ki,ki->k", ref.dp_normed_d, err.e_r_par),
    ], axis=-1)  # (N, 3)

    # Exact errors vs the advanced rotation reference.
    rot_actual = jax.vmap(kinematics.fk_pose)(traj.q)[:, 3:]  # (N, 3) rotvec
    phi_sw = params.phi_switch
    dp = params.dp_ref  # (nr_segs, 6)

    def advance(carry, phi_pair):
        pr = carry
        phi_prev, phi_next = phi_pair
        pr1 = lie.integrate_rotation_reference(pr, dp[0, 3:], phi_prev, phi_next)
        pr2 = lie.integrate_rotation_reference(pr, dp[1, 3:], phi_prev, phi_next)
        pr3 = lie.integrate_rotation_reference(pr, dp[2, 3:], phi_prev, phi_next)
        # crossing a switch re-anchors at the via rotation (BoundMPC.py:711-721)
        prc1 = lie.integrate_rotation_reference(
            via_rotvec_win[1], dp[1, 3:], phi_sw[1], phi_next)
        prc2 = lie.integrate_rotation_reference(
            via_rotvec_win[2], dp[2, 3:], phi_sw[2], phi_next)
        crossed1 = (phi_next > phi_sw[1]) & (phi_prev <= phi_sw[1])
        crossed2 = (phi_next > phi_sw[2]) & (phi_prev <= phi_sw[2])
        stay = jnp.where(phi_next > phi_sw[2], pr3,
                         jnp.where(phi_next > phi_sw[1], pr2, pr1))
        pr_new = jnp.where(crossed2, prc2, jnp.where(crossed1, prc1, stay))
        return pr_new, pr_new

    phis = jnp.concatenate([phi0[None], traj.phi])
    _, pr_refs = jax.lax.scan(
        advance, pr_ref0, (phis[:-1], phis[1:]))  # (N, 3)

    def true_one(rv_actual, pr_ref, b1, b2, dpn):
        e_mat = (lie.rotvec_to_matrix(rv_actual)
                 @ lie.rotvec_to_matrix(pr_ref).T)
        return _plane_coords(e_mat, b1, b2, dpn)

    true = jax.vmap(true_one)(rot_actual, pr_refs, ref.br1, ref.br2,
                              ref.dp_normed_d)
    return lin, true


def make_horizon_eval(cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs):
    return jax.jit(partial(horizon_plane_errors, cfg, coeffs))
