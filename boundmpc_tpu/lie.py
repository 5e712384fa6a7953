"""SO(3) / Lie-algebra utilities, batch-first and jit-safe.

TPU-native re-design of the reference math in
``bound_mpc/bound_mpc/utils/lie_functions.py`` (skew / Rodrigues / inverse
SO(3) Jacobians) plus the ``scipy.spatial.transform.Rotation`` conversions the
reference leans on (rotvec <-> matrix, euler 'zyx') and the rotation-reference
integration from ``bound_mpc/bound_mpc/utils/util_functions.py:88-99``.

Everything here is pure jnp, differentiable, and shape-polymorphic in leading
batch dimensions (`...`).  Branches are `jnp.where`-based so the functions
trace once under `jax.jit` and vectorize under `vmap`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Regularization used by the reference for the inverse SO(3) Jacobians
# (reference lie_functions.py:43 ``angle = norm(axis) + 1e-6``).  Kept
# identical for parity.
_JAC_EPS = 1e-6
# Generic small-angle guard for the Taylor branches below.
_TAYLOR_EPS = 1e-8


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from *unit* axis (..., 3) and angle (...,)."""
    K = skew(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def rotvec_to_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Exponential map (..., 3) -> (..., 3, 3) with small-angle Taylor."""
    theta2 = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(theta2 + _TAYLOR_EPS**2)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    small = theta2 < _TAYLOR_EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = skew(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) as (w, x, y, z).

    Branchless Shepperd method: build all four candidate quaternions and pick
    the one whose pivot is largest (numerically robust incl. angle ~ pi).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate 0: pivot w
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # Candidate 1: pivot x
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    # Candidate 2: pivot y
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    # Candidate 3: pivot z
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize to w >= 0 so the rotvec angle lies in [0, pi].
    q = jnp.where(q[..., :1] < 0.0, -q, q)
    return q


def quat_to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) with w >= 0 -> rotation vector."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(n, w)
    # angle / sin(angle/2); Taylor for small angles: 2/w * (1 + n^2/(6 w^2))
    small = n < _TAYLOR_EPS
    scale = jnp.where(
        small,
        2.0 / jnp.where(jnp.abs(w) < 1e-30, 1.0, w),
        angle / jnp.where(small, 1.0, n),
    )
    return xyz * scale[..., None]


def matrix_to_rotvec(R: jnp.ndarray) -> jnp.ndarray:
    """Log map (..., 3, 3) -> (..., 3), robust near 0 and pi."""
    return quat_to_rotvec(matrix_to_quat(R))


def jac_so3_inv_right(axis: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian of SO(3) at rotation vector ``axis``.

    Matches reference ``lie_functions.jac_SO3_inv_right`` incl. its 1e-6
    angle regularization (lie_functions.py:41-51).
    """
    angle = jnp.linalg.norm(axis, axis=-1) + _JAC_EPS
    K = skew(axis)
    coeff = 1.0 / angle**2 - (1.0 + jnp.cos(angle)) / (2.0 * angle * jnp.sin(angle))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + 0.5 * K + coeff[..., None, None] * (K @ K)


def jac_so3_inv_left(axis: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3); reference lie_functions.py:54-64."""
    angle = jnp.linalg.norm(axis, axis=-1) + _JAC_EPS
    K = skew(axis)
    coeff = 1.0 / angle**2 - (1.0 + jnp.cos(angle)) / (2.0 * angle * jnp.sin(angle))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye - 0.5 * K + coeff[..., None, None] * (K @ K)


def euler_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic z-y-x Euler angles (a1, a2, a3) with R = Rx(a3) Ry(a2) Rz(a1).

    Matches ``scipy Rotation.as_euler('zyx')`` for non-degenerate beta
    (|R[0,2]| < 1); the reference uses it to decompose initial orientation
    errors (util_functions.py:26).
    """
    a2 = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    a1 = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    a3 = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    return jnp.stack([a1, a2, a3], axis=-1)


def integrate_rotation_reference(
    pr_ref: jnp.ndarray, omega: jnp.ndarray, phi0: jnp.ndarray, phi1: jnp.ndarray
) -> jnp.ndarray:
    """Rotate ``pr_ref`` (rotvec) by constant angular velocity ``omega`` over
    the path interval ``phi1 - phi0``; reference util_functions.py:88-99.
    """
    r0 = rotvec_to_matrix(pr_ref)
    n = jnp.linalg.norm(omega, axis=-1)
    safe_n = jnp.where(n > 1e-4, n, 1.0)
    dr = rodrigues(omega / safe_n[..., None], (phi1 - phi0) * n)
    r1 = jnp.where((n > 1e-4)[..., None, None], dr @ r0, r0)
    return matrix_to_rotvec(r1)


def gram_schmidt_step(v: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Remove the component of ``b`` along unit vector ``v``
    (reference ReferencePath.py:250-257 with identity jacobian)."""
    return b - jnp.sum(v * b, axis=-1, keepdims=True) * v
