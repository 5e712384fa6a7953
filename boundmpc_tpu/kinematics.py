"""KUKA iiwa14 kinematics, TPU-first.

The reference ships ~1300 lines of machine-generated closed-form expressions
(``bound_mpc/bound_mpc/RobotModel/RobotModel.py``).  Here the same kinematics
are built from the robot's product-of-exponentials chain

    T(q) = Tz(d1) Rz(q1) Tz(d2) Ry(q2) Tz(d3) Rz(q3) Tz(d4) Ry(-q4)
           Tz(d5) Rz(q5) Tz(d6) Ry(q6) Tz(d7) Rz(q7) Tz(d8)

(link lengths per RobotModel.py:8-17; the axis/sign convention was validated
numerically against the reference FK to machine precision).  Jacobian and its
time derivatives come from the geometric chain + forward-mode AD instead of
transcribed expressions — exact, batched, and XLA-fusible.

All functions take a trailing joint axis of size 7 and broadcast over leading
batch dims via `vmap` composition at call sites; the base functions here are
single-configuration and meant to be wrapped (`jax.vmap`) by callers.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lie import matrix_to_rotvec

# Link lengths (meters) — RobotModel.py:8-17 (d8 includes the 0.145 tool).
D1, D2, D3, D4, D5, D6, D7, D8 = (
    0.1575,
    0.2025,
    0.2375,
    0.1825,
    0.2175,
    0.1825,
    0.081,
    0.071 + 0.145,
)

# Per-joint: offset along parent z before the joint, rotation axis in the
# parent frame, and sign.  Axis pattern z, y, z, -y, z, y, z.
# numpy (not jnp) on purpose: importing this module must not initialise the
# XLA backend (jax.distributed.initialize must be callable after import —
# tests/test_multihost.py); numpy constants trace identically under jit.
_OFFSETS = np.array([D1, D2, D3, D4, D5, D6, D7])
_AXES = np.array(
    [
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ]
)

_DEG = math.pi / 180.0


class RobotLimits(NamedTuple):
    q_upper: jnp.ndarray
    q_lower: jnp.ndarray
    dq_upper: jnp.ndarray
    dq_lower: jnp.ndarray
    tau_upper: jnp.ndarray
    tau_lower: jnp.ndarray
    u_max: float
    u_min: float


def robot_limits() -> RobotLimits:
    """Joint limits of the iiwa14 — RobotModel.py:20-43."""
    q_u = jnp.array([165.0, 115.0, 165.0, 115.0, 165.0, 115.0, 170.0]) * _DEG
    dq_u = jnp.array([85.0, 85.0, 100.0, 75.0, 130.0, 135.0, 135.0]) * _DEG
    tau_u = jnp.array([320.0, 320.0, 176.0, 176.0, 110.0, 40.0, 40.0])
    return RobotLimits(q_u, -q_u, dq_u, -dq_u, tau_u, -tau_u, 35.0, -35.0)


def _post_rot_z(R, c, s):
    """R @ Rz(q) with R as a tuple of 9 scalars — pure mul/add (VPU food)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
    return (r00 * c + r01 * s, -r00 * s + r01 * c, r02,
            r10 * c + r11 * s, -r10 * s + r11 * c, r12,
            r20 * c + r21 * s, -r20 * s + r21 * c, r22)


def _post_rot_y(R, c, s):
    """R @ Ry(q)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
    return (r00 * c - r02 * s, r01, r00 * s + r02 * c,
            r10 * c - r12 * s, r11, r10 * s + r12 * c,
            r20 * c - r22 * s, r21, r20 * s + r22 * c)


# Axis pattern of the iiwa14 chain: z, y, z, -y, z, y, z (signs fold into the
# joint angle: Ry(-q) == Ry with s -> -s).
_AXIS_KIND = ("z", "y", "z", "-y", "z", "y", "z")


def joint_frames(q: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World-frame joint origins (8, 3), world joint axes (7, 3), and the
    end-effector rotation matrix (3, 3).

    Origins[i] is the position of joint i's frame (origins[7] = EE point).

    Fully unrolled scalar-formula chain (no scan, no 3x3 matmuls): 7 fused
    rotation updates of a 9-scalar register tuple — this is what lets XLA
    vectorize FK over (batch x stage x AD-tangent) axes as pure elementwise
    VPU work instead of tiny serialized MXU ops.
    """
    dtype = q.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    R = (one, zero, zero, zero, one, zero, zero, zero, one)
    px = py = pz = zero
    offs = [D1, D2, D3, D4, D5, D6, D7]
    origins = []
    axes = []
    c_all = jnp.cos(q)
    s_all = jnp.sin(q)
    for i, kind in enumerate(_AXIS_KIND):
        # translate along the current frame's z by offs[i]
        off = jnp.asarray(offs[i], dtype)
        px = px + R[2] * off
        py = py + R[5] * off
        pz = pz + R[8] * off
        origins.append((px, py, pz))
        c, s = c_all[i], s_all[i]
        if kind == "z":
            axes.append((R[2], R[5], R[8]))
            R = _post_rot_z(R, c, s)
        elif kind == "y":
            axes.append((R[1], R[4], R[7]))
            R = _post_rot_y(R, c, s)
        else:  # "-y": axis is -y, i.e. Ry(-q)
            axes.append((-R[1], -R[4], -R[7]))
            R = _post_rot_y(R, c, -s)
    d8 = jnp.asarray(D8, dtype)
    origins.append((px + R[2] * d8, py + R[5] * d8, pz + R[8] * d8))

    origins_arr = jnp.stack([jnp.stack(o) for o in origins])  # (8, 3)
    axes_arr = jnp.stack([jnp.stack(a) for a in axes])  # (7, 3)
    R_arr = jnp.stack(R).reshape(3, 3)
    return origins_arr, axes_arr, R_arr


def fk_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous EE transform (4, 4) — parity with
    RobotModel.hom_transform_endeffector (RobotModel.py:118-193)."""
    origins, _, R = joint_frames(q)
    T = jnp.eye(4, dtype=q.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(origins[-1])
    return T


def fk_pos(q: jnp.ndarray) -> jnp.ndarray:
    """EE position (3,) — parity with RobotModel.fk_pos."""
    origins, _, _ = joint_frames(q)
    return origins[-1]


def fk_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    _, _, R = joint_frames(q)
    return R


def fk_pose(q: jnp.ndarray) -> jnp.ndarray:
    """EE pose as [position (3), rotation vector (3)] — RobotModel.fk."""
    origins, _, R = joint_frames(q)
    return jnp.concatenate([origins[-1], matrix_to_rotvec(R)])


def jacobian(q: jnp.ndarray) -> jnp.ndarray:
    """Spatial geometric Jacobian (6, 7): rows 0-2 linear, 3-5 angular.

    Parity with RobotModel.jacobian_fk (validated: J[3:] @ dq equals the
    spatial angular velocity, J[:3] @ dq the EE linear velocity).
    """
    origins, axes, _ = joint_frames(q)
    p_ee = origins[-1]
    jv = jnp.cross(axes, p_ee[None, :] - origins[:-1])  # (7, 3)
    return jnp.concatenate([jv.T, axes.T], axis=0)


def djacobian(q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """dJ/dt (6, 7) via forward-mode AD — parity with RobotModel.djacobian_fk."""
    return jax.jvp(jacobian, (q,), (dq,))[1]


def ddjacobian(q: jnp.ndarray, dq: jnp.ndarray, ddq: jnp.ndarray) -> jnp.ndarray:
    """d^2J/dt^2 (6, 7) — parity with RobotModel.ddjacobian_fk:
    ddJ = d/dt (dJ) = (d(dJ)/dq) dq + (d(dJ)/d(dq)) ddq."""
    return jax.jvp(djacobian, (q, dq), (dq, ddq))[1]


def velocity_ee(q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """EE linear velocity (3,) — RobotModel.velocity_ee."""
    return jacobian(q)[:3] @ dq


def omega_ee(q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """EE spatial angular velocity (3,) — RobotModel.omega_ee."""
    return jacobian(q)[3:] @ dq


def twist_ee(q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """Full 6D EE velocity [v; omega]."""
    return jacobian(q) @ dq


def acceleration_ee(q: jnp.ndarray, dq: jnp.ndarray, ddq: jnp.ndarray) -> jnp.ndarray:
    """EE 6D acceleration J ddq + dJ dq — RobotModel.acceleration_ee."""
    return jacobian(q) @ ddq + djacobian(q, dq) @ dq


def manipulability(q: jnp.ndarray) -> jnp.ndarray:
    """det(J J^T) — parity with RobotModel.manipulability_measure (which
    returns the *squared* Yoshikawa measure)."""
    J = jacobian(q)
    return jnp.linalg.det(J @ J.T)


def forward_kinematics(q: jnp.ndarray, dq: jnp.ndarray):
    """(pose [pos, rotvec], J, dJ) — parity with RobotModel.forward_kinematics."""
    return fk_pose(q), jacobian(q), djacobian(q, dq)


# Batched conveniences (leading batch axis).
fk_pose_b = jax.vmap(fk_pose)
fk_pos_b = jax.vmap(fk_pos)
jacobian_b = jax.vmap(jacobian)
djacobian_b = jax.vmap(djacobian)
