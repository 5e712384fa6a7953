"""Exact integration of piecewise-linear ("triangle basis") jerk signals.

The reference integrates the joint-space triple integrator with closed-form
integrals of hat-basis jerk knots (``bound_mpc/bound_mpc/BoundMPC/
jerk_trajectory_casadi.py``).  Derivation used here (clean-room): on the
interval [t_k, t_k + h] with local time tau and knot values (u_k, u_{k+1}),

    jerk(tau) = u_k + (u_{k+1} - u_k) tau / h
    acc(tau)  = a_k + u_k tau + (u_{k+1} - u_k) tau^2 / (2h)
    vel(tau)  = v_k + a_k tau + u_k tau^2/2 + (u_{k+1} - u_k) tau^3 / (6h)
    pos(tau)  = p_k + v_k tau + a_k tau^2/2 + u_k tau^3/6
                + (u_{k+1} - u_k) tau^4 / (24h)

At tau = h this yields the per-stage recurrence

    a_{k+1} = a_k + (u_k + u_{k+1}) h/2
    v_{k+1} = v_k + a_k h + u_k h^2/3 + u_{k+1} h^2/6
    p_{k+1} = p_k + v_k h + a_k h^2/2 + u_k h^3/8 + u_{k+1} h^3/24

which matches the reference's calcAngle/calcVelocity/calcAcceleration at the
grid points (verified in tests/test_jerkint.py).

TPU-first restructuring: because the dynamics are *linear* in the jerk knots,
the entire N-stage state trajectory is a constant linear map of
``u_all = [u_prev, u_0, ..., u_{N-1}]``.  ``coeff_matrices`` precomputes those
(N, N+1) maps once per (N, dt); the rollout then becomes three small matmuls
instead of a sequential scan — this is what removes the reference's
per-stage dynamics equality constraints (casadi_ocp_formulation.py:272-303)
from the optimization problem entirely.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


class JerkCoeffs(NamedTuple):
    """State at t_k = (k+1) h as a function of initial conditions and knots.

    pos_k = p0 + v0 t_k + a0 t_k^2/2 + (C_pos @ u_all)_k    (k = 0..N-1)
    vel_k = v0 + a0 t_k + (C_vel @ u_all)_k
    acc_k = a0 + (C_acc @ u_all)_k

    with u_all = [u_prev, u_0, ..., u_{N-1}]  (length N+1).
    """

    t: jnp.ndarray  # (N,) times (k+1) h
    c_pos: jnp.ndarray  # (N, N+1)
    c_vel: jnp.ndarray  # (N, N+1)
    c_acc: jnp.ndarray  # (N, N+1)


@lru_cache(maxsize=None)
def _coeff_matrices_np(N: int, h: float) -> Tuple[np.ndarray, ...]:
    c_acc = np.zeros((N, N + 1))
    c_vel = np.zeros((N, N + 1))
    c_pos = np.zeros((N, N + 1))
    acc = np.zeros(N + 1)
    vel = np.zeros(N + 1)
    pos = np.zeros(N + 1)
    for k in range(N):
        # step with knot pair (u_k_prev = index k, u_k = index k+1)
        e_lo = np.zeros(N + 1)
        e_lo[k] = 1.0
        e_hi = np.zeros(N + 1)
        e_hi[k + 1] = 1.0
        pos = pos + vel * h + acc * h * h / 2 + e_lo * h**3 / 8 + e_hi * h**3 / 24
        vel = vel + acc * h + e_lo * h * h / 3 + e_hi * h * h / 6
        acc = acc + (e_lo + e_hi) * h / 2
        c_pos[k] = pos
        c_vel[k] = vel
        c_acc[k] = acc
    t = h * np.arange(1, N + 1)
    return t, c_pos, c_vel, c_acc


def coeff_matrices(N: int, h: float, dtype=jnp.float32) -> JerkCoeffs:
    t, c_pos, c_vel, c_acc = _coeff_matrices_np(N, float(h))
    return JerkCoeffs(
        jnp.asarray(t, dtype), jnp.asarray(c_pos, dtype), jnp.asarray(c_vel, dtype), jnp.asarray(c_acc, dtype)
    )


def rollout_linear(
    coeffs: JerkCoeffs,
    u_all: jnp.ndarray,  # (N+1, d) knots incl. u_prev row 0
    p0: jnp.ndarray,  # (d,)
    v0: jnp.ndarray,
    a0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """States at the N grid points: (pos, vel, acc) each (N, d)."""
    t = coeffs.t[:, None]
    pos = p0[None, :] + v0[None, :] * t + 0.5 * a0[None, :] * t * t + coeffs.c_pos @ u_all
    vel = v0[None, :] + a0[None, :] * t + coeffs.c_vel @ u_all
    acc = a0[None, :] + coeffs.c_acc @ u_all
    return pos, vel, acc


def step(
    u_lo: jnp.ndarray, u_hi: jnp.ndarray, p: jnp.ndarray, v: jnp.ndarray, a: jnp.ndarray, h: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single exact integration step over [0, h] with knots (u_lo, u_hi).

    Equals the reference integration_function's use of calc* at t = dt with a
    two-column jerk matrix (bound_mpc_functions.py:254-260).
    """
    p_n = p + v * h + a * h * h / 2 + u_lo * h**3 / 8 + u_hi * h**3 / 24
    v_n = v + a * h + u_lo * h * h / 3 + u_hi * h * h / 6
    a_n = a + (u_lo + u_hi) * h / 2
    return p_n, v_n, a_n


def eval_at(
    knots: jnp.ndarray,  # (M, d) hat-knot values at times 0, h, ..., (M-1) h
    t: float,
    p0: jnp.ndarray,
    v0: jnp.ndarray,
    a0: jnp.ndarray,
    h: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate (pos, vel, acc, jerk) at arbitrary time t >= 0 (python float).

    General-time equivalent of the reference calcAngle/calcVelocity/
    calcAcceleration/calcJerk; used for sub-step evaluation and tests.
    """
    M = knots.shape[0]
    pos, vel, acc = p0, v0, a0
    k_full = min(int(np.floor(t / h + 1e-12)), M - 1)
    for k in range(k_full):
        pos, vel, acc = step(knots[k], knots[k + 1], pos, vel, acc, h)
    tau = t - k_full * h
    if tau <= 1e-12:
        return pos, vel, acc, knots[k_full]
    u_lo = knots[k_full]
    u_hi = knots[min(k_full + 1, M - 1)] if k_full + 1 < M else jnp.zeros_like(u_lo)
    du = (u_hi - u_lo) / h
    jerk = u_lo + du * tau
    pos_t = pos + vel * tau + acc * tau**2 / 2 + u_lo * tau**3 / 6 + du * tau**4 / 24
    vel_t = vel + acc * tau + u_lo * tau**2 / 2 + du * tau**3 / 6
    acc_t = acc + u_lo * tau + du * tau**2 / 2
    return pos_t, vel_t, acc_t, jerk
