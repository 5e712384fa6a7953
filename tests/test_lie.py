"""Lie utilities vs scipy.Rotation and the reference lie_functions."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from boundmpc_tpu import lie
from ref_oracle import ref_lie, ref_util


def random_rotvecs(rng, n, max_angle=np.pi - 1e-3):
    v = rng.normal(size=(n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    ang = rng.uniform(0, max_angle, size=(n, 1))
    return v * ang


def test_rotvec_matrix_roundtrip(rng):
    vs = random_rotvecs(rng, 200)
    Ms = np.asarray(lie.rotvec_to_matrix(jnp.asarray(vs)))
    Ms_ref = R.from_rotvec(vs).as_matrix()
    np.testing.assert_allclose(Ms, Ms_ref, atol=1e-9)
    back = np.asarray(lie.matrix_to_rotvec(jnp.asarray(Ms_ref)))
    np.testing.assert_allclose(back, vs, atol=1e-7)


def test_matrix_to_rotvec_near_pi(rng):
    vs = random_rotvecs(rng, 50)
    vs = np.ascontiguousarray(vs / np.linalg.norm(vs, axis=-1, keepdims=True) * (np.pi - 1e-7))
    Ms = R.from_rotvec(vs).as_matrix()
    back = np.array(lie.matrix_to_rotvec(jnp.asarray(Ms)))
    np.testing.assert_allclose(R.from_rotvec(back).as_matrix(), Ms, atol=1e-6)


def test_small_angle(rng):
    vs = rng.normal(size=(20, 3)) * 1e-10
    Ms = np.asarray(lie.rotvec_to_matrix(jnp.asarray(vs)))
    np.testing.assert_allclose(Ms, R.from_rotvec(vs).as_matrix(), atol=1e-12)
    back = np.asarray(lie.matrix_to_rotvec(jnp.asarray(Ms)))
    np.testing.assert_allclose(back, vs, atol=1e-12)


def test_skew_rodrigues_vs_reference(rng):
    w = rng.normal(size=3)
    np.testing.assert_allclose(np.asarray(lie.skew(jnp.asarray(w))), ref_lie.skew_matrix(w))
    axis = w / np.linalg.norm(w)
    phi = 0.7
    np.testing.assert_allclose(
        np.asarray(lie.rodrigues(jnp.asarray(axis), jnp.asarray(phi))),
        ref_lie.rodrigues_matrix(axis, phi),
        atol=1e-12,
    )


def test_so3_inverse_jacobians_vs_reference(rng):
    for _ in range(20):
        axis = rng.normal(size=3) * rng.uniform(0.01, 2.5)
        np.testing.assert_allclose(
            np.asarray(lie.jac_so3_inv_right(jnp.asarray(axis))),
            ref_lie.jac_SO3_inv_right(axis),
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(lie.jac_so3_inv_left(jnp.asarray(axis))),
            ref_lie.jac_SO3_inv_left(axis),
            atol=1e-10,
        )


def test_euler_zyx_vs_scipy(rng):
    vs = random_rotvecs(rng, 100, max_angle=2.5)
    Ms = R.from_rotvec(vs).as_matrix()
    ours = np.asarray(lie.euler_zyx(jnp.asarray(Ms)))
    ref = R.from_matrix(Ms).as_euler("zyx")
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_integrate_rotation_reference_vs_reference(rng):
    for _ in range(10):
        pr = random_rotvecs(rng, 1)[0]
        omega = rng.normal(size=3)
        phi0, phi1 = 0.3, 1.1
        ours = np.array(
            lie.integrate_rotation_reference(
                jnp.asarray(pr), jnp.asarray(omega), jnp.asarray(phi0), jnp.asarray(phi1)
            )
        )
        ref = ref_util.integrate_rotation_reference(pr, omega, phi0, phi1)
        np.testing.assert_allclose(
            R.from_rotvec(ours).as_matrix(), R.from_rotvec(ref).as_matrix(), atol=1e-8
        )
    # tiny omega branch
    ours = np.asarray(
        lie.integrate_rotation_reference(
            jnp.asarray(pr), jnp.asarray(omega * 1e-6), jnp.asarray(0.0), jnp.asarray(1.0)
        )
    )
    np.testing.assert_allclose(ours, pr, atol=1e-5)


def test_initial_rot_errors_decomposition(rng):
    """compute_initial_rot_errors parity: our jnp pipeline vs reference."""
    from boundmpc_tpu.ocp import compute_initial_rot_errors

    for _ in range(10):
        pr = random_rotvecs(rng, 1)[0]
        pr_ref = random_rotvecs(rng, 1)[0]
        dp_ref = rng.normal(size=3)
        b = rng.normal(size=3)
        dpn = dp_ref / np.linalg.norm(dp_ref)
        br1 = b - (b @ dpn) * dpn
        br1 /= np.linalg.norm(br1)
        br2 = np.cross(dpn, br1)
        ref_out = ref_util.compute_initial_rot_errors(pr, pr_ref, dp_ref, br1, br2)
        ours = compute_initial_rot_errors(
            jnp.asarray(pr), jnp.asarray(pr_ref), jnp.asarray(dp_ref), jnp.asarray(br1), jnp.asarray(br2)
        )
        for o, r in zip(ours, ref_out):
            np.testing.assert_allclose(np.asarray(o), r, atol=1e-7)
