"""iiwa14 kinematics vs the reference's machine-generated closed forms."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from boundmpc_tpu import kinematics as kin
from ref_oracle import RobotModel

rm = RobotModel()


def random_q(rng, n=1):
    lims = kin.robot_limits()
    lo, hi = np.asarray(lims.q_lower), np.asarray(lims.q_upper)
    return rng.uniform(lo * 0.9, hi * 0.9, size=(n, 7))


def test_fk_matrix_vs_reference(rng):
    for q in random_q(rng, 25):
        ours = np.asarray(kin.fk_matrix(jnp.asarray(q)))
        ref = rm.hom_transform_endeffector(q)
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_fk_pos_vs_reference(rng):
    for q in random_q(rng, 25):
        np.testing.assert_allclose(
            np.asarray(kin.fk_pos(jnp.asarray(q))), rm.fk_pos(q), atol=1e-10
        )


def test_fk_pose_rotvec(rng):
    for q in random_q(rng, 25):
        pose = np.asarray(kin.fk_pose(jnp.asarray(q)))
        ref = rm.hom_transform_endeffector(q)
        np.testing.assert_allclose(pose[:3], ref[:3, 3], atol=1e-10)
        np.testing.assert_allclose(
            R.from_rotvec(np.array(pose[3:])).as_matrix(), ref[:3, :3], atol=1e-8
        )


def test_jacobian_vs_reference(rng):
    for q in random_q(rng, 25):
        np.testing.assert_allclose(
            np.asarray(kin.jacobian(jnp.asarray(q))), rm.jacobian_fk(q), atol=1e-9
        )


def test_djacobian_vs_reference(rng):
    for q in random_q(rng, 10):
        dq = rng.normal(size=7)
        np.testing.assert_allclose(
            np.asarray(kin.djacobian(jnp.asarray(q), jnp.asarray(dq))),
            rm.djacobian_fk(q, dq),
            atol=1e-8,
        )


def test_ddjacobian_vs_reference(rng):
    for q in random_q(rng, 5):
        dq = rng.normal(size=7)
        ddq = rng.normal(size=7)
        np.testing.assert_allclose(
            np.asarray(kin.ddjacobian(jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ddq))),
            rm.ddjacobian_fk(q, dq, ddq),
            atol=1e-7,
        )


def test_velocity_accel_manip_vs_reference(rng):
    for q in random_q(rng, 5):
        dq = rng.normal(size=7)
        ddq = rng.normal(size=7)
        np.testing.assert_allclose(
            np.asarray(kin.velocity_ee(jnp.asarray(q), jnp.asarray(dq))),
            rm.velocity_ee(q, dq),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(kin.omega_ee(jnp.asarray(q), jnp.asarray(dq))),
            rm.omega_ee(q, dq),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(kin.acceleration_ee(jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ddq))),
            rm.acceleration_ee(q, dq, ddq),
            atol=1e-8,
        )
        np.testing.assert_allclose(
            float(kin.manipulability(jnp.asarray(q))),
            rm.manipulability_measure(q),
            rtol=1e-8,
        )


def test_limits_vs_reference():
    lims = kin.robot_limits()
    ref = rm.get_robot_limits()
    np.testing.assert_allclose(np.asarray(lims.q_upper), ref[0])
    np.testing.assert_allclose(np.asarray(lims.q_lower), ref[1])
    np.testing.assert_allclose(np.asarray(lims.dq_upper), ref[2])
    np.testing.assert_allclose(np.asarray(lims.dq_lower), ref[3])
    assert lims.u_max == ref[6] and lims.u_min == ref[7]


def test_batched_and_jittable(rng):
    qs = jnp.asarray(random_q(rng, 8))
    poses = jax.jit(kin.fk_pose_b)(qs)
    assert poses.shape == (8, 6)
    Js = jax.jit(kin.jacobian_b)(qs)
    assert Js.shape == (8, 6, 7)
