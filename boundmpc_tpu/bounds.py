"""Quartic orthogonal-error bound polynomials.

The reference constrains path-orthogonal errors inside quartic envelopes
e(phi) fitted per segment (``mpc_utils_casadi.compute_bound_params``,
BoundMPC.compute_error_bounds).  Clean-room derivation used here: the unique
quartic on [0, L] with

    e(0) = e0,  e'(0) = s,  e(L) = e1,  e'(L) = -s,  e(L/2) = e_max

has coefficients (verified to match the reference formulas at phi0 = 0,
which is the only way the reference ever calls them — BoundMPC.py:240-263):

    a0 = e0
    a1 = s
    a2 = -( 5 s L + 11 e0 +  5 e1 - 16 e_max) / L^2
    a3 =  ( 8 s L + 18 e0 + 14 e1 - 32 e_max) / L^3
    a4 = -2 (2 s L +  4 e0 +  4 e1 -  8 e_max) / L^4

All fitting is vectorized over the 9 bound channels
[pos-upper x2, pos-lower x2, rot-upper x2, rot-lower x2, rot-tangential]
and over segments; evaluation is a Horner polynomial — pure VPU work.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def quartic_coeffs(
    L: jnp.ndarray, e0: jnp.ndarray, e1: jnp.ndarray, s: jnp.ndarray, e_max: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Coefficients (a4, a3, a2, a1, a0), broadcasting over all inputs."""
    L2 = L * L
    a0 = e0 + 0.0 * L
    a1 = s + 0.0 * L
    a2 = -(5.0 * s * L + 11.0 * e0 + 5.0 * e1 - 16.0 * e_max) / L2
    a3 = (8.0 * s * L + 18.0 * e0 + 14.0 * e1 - 32.0 * e_max) / (L2 * L)
    a4 = -2.0 * (2.0 * s * L + 4.0 * e0 + 4.0 * e1 - 8.0 * e_max) / (L2 * L2)
    return a4, a3, a2, a1, a0


def quartic_eval(phi: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate with stacked coeffs (..., 5) ordered [a4, a3, a2, a1, a0]."""
    a4, a3, a2, a1, a0 = (coeffs[..., i] for i in range(5))
    return (((a4 * phi + a3) * phi + a2) * phi + a1) * phi + a0


def segment_bound_coeffs(
    seg_len: jnp.ndarray,  # (S,) segment lengths phi_switch[i+1]-phi_switch[i]
    asymm_lower: jnp.ndarray,  # (S, 4) lower scale [pos x2, rot x2] (negative)
    asymm_upper: jnp.ndarray,  # (S, 4) upper scale
    s: jnp.ndarray,  # scalar slope parameter
    e_p_min: jnp.ndarray,  # scalar
    e_r_min: jnp.ndarray,  # scalar
    e_p_max: jnp.ndarray,  # scalar
    e_r_max: jnp.ndarray,  # scalar
) -> jnp.ndarray:
    """Per-segment bound polynomials, stacked (S, 9, 5) [a4..a0].

    Channel layout (reference BoundMPC.compute_error_bounds, BoundMPC.py:219-265):
      0-1 pos upper (bp1/bp2), 2-3 pos lower, 4-5 rot upper, 6-7 rot lower,
      8 rot tangential.  Channels 2-3 and 6-7 carry negative envelopes.
    Endpoint values are the e_*_min symmetric "waist"; e_max / slope are
    scaled per channel by the asymmetric rectangle
    [asymm_upper[:2], -asymm_lower[:2], asymm_upper[2:], -asymm_lower[2:]],
    and the tangential channel reuses the last rot scale (ref :257-259).
    """
    S = seg_len.shape[0]
    ones = jnp.ones((S,), dtype=seg_len.dtype)

    def ch(e_min_val, e_max_val, s_val, scale):
        e0 = e_min_val * ones
        e1 = e_min_val * ones
        emax = e_max_val * scale
        sv = s_val * scale
        a4, a3, a2, a1, a0 = quartic_coeffs(seg_len, e0, e1, sv, emax)
        return jnp.stack([a4, a3, a2, a1, a0], axis=-1)  # (S, 5)

    asymm = jnp.concatenate(
        [asymm_upper[:, :2], -asymm_lower[:, :2], asymm_upper[:, 2:], -asymm_lower[:, 2:]],
        axis=1,
    )  # (S, 8)

    chans = []
    for i in range(2):  # pos upper
        chans.append(ch(e_p_min, e_p_max, s, asymm[:, i]))
    for i in range(2):  # pos lower (negative envelope)
        chans.append(ch(-e_p_min, -e_p_max, -s, asymm[:, 2 + i]))
    for i in range(2):  # rot upper
        chans.append(ch(e_r_min, e_r_max, s, asymm[:, 4 + i]))
    for i in range(2):  # rot lower
        chans.append(ch(-e_r_min, -e_r_max, -s, asymm[:, 6 + i]))
    # tangential rot channel: e0 = e1 = +e_r_min, scaled by the last rot scale
    chans.append(ch(e_r_min, e_r_max, s, asymm[:, 7]))
    return jnp.stack(chans, axis=1)  # (S, 9, 5)
