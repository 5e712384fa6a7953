"""Triangle-basis jerk integration vs the reference closed forms."""
import numpy as np
import jax.numpy as jnp

from boundmpc_tpu import jerkint
from ref_oracle import ref_jerk


def test_step_matches_reference_calc(rng):
    """Single step with knots (u_prev, u) at t = dt equals calcAngle/..."""
    h = 0.1
    d = 7
    q = rng.normal(size=d)
    dq = rng.normal(size=d)
    ddq = rng.normal(size=d)
    u_prev = rng.normal(size=d)
    u = rng.normal(size=d)
    traj = np.stack([u_prev, u], axis=1)  # (d, 2) knot columns
    q_ref = ref_jerk.calcAngle(traj, h, q, dq, ddq, h)
    dq_ref = ref_jerk.calcVelocity(traj, h, dq, ddq, h)
    ddq_ref = ref_jerk.calcAcceleration(traj, h, ddq, h)
    p_n, v_n, a_n = jerkint.step(jnp.asarray(u_prev), jnp.asarray(u), jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ddq), h)
    np.testing.assert_allclose(np.asarray(p_n), q_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_n), dq_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a_n), ddq_ref, atol=1e-12)


def test_rollout_matches_reference_grid(rng):
    """Linear-map rollout at every grid point equals reference evaluation
    with the full (N+1)-knot jerk matrix at t = (k+1) h."""
    h = 0.1
    N = 10
    d = 3
    knots = rng.normal(size=(d, N + 1))  # reference layout: (dim, knots)
    q0 = rng.normal(size=d)
    dq0 = rng.normal(size=d)
    ddq0 = rng.normal(size=d)
    coeffs = jerkint.coeff_matrices(N, h, dtype=jnp.float64)
    pos, vel, acc = jerkint.rollout_linear(
        coeffs, jnp.asarray(knots.T), jnp.asarray(q0), jnp.asarray(dq0), jnp.asarray(ddq0)
    )
    for k in range(N):
        t = (k + 1) * h
        q_ref = ref_jerk.calcAngle(knots, t, q0, dq0, ddq0, h)
        dq_ref = ref_jerk.calcVelocity(knots, t, dq0, ddq0, h)
        ddq_ref = ref_jerk.calcAcceleration(knots, t, ddq0, h)
        np.testing.assert_allclose(np.asarray(pos[k]), q_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(vel[k]), dq_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(acc[k]), ddq_ref, atol=1e-10)


def test_eval_at_off_grid(rng):
    """Off-grid evaluation equals the reference closed forms."""
    h = 0.1
    N = 5
    d = 2
    knots = rng.normal(size=(d, N + 1))
    q0 = rng.normal(size=d)
    dq0 = rng.normal(size=d)
    ddq0 = rng.normal(size=d)
    for t in [0.03, 0.1, 0.17, 0.25, 0.49]:
        q_ref = ref_jerk.calcAngle(knots, t, q0, dq0, ddq0, h)
        dq_ref = ref_jerk.calcVelocity(knots, t, dq0, ddq0, h)
        pos, vel, acc, _ = jerkint.eval_at(
            jnp.asarray(knots.T), t, jnp.asarray(q0), jnp.asarray(dq0), jnp.asarray(ddq0), h
        )
        np.testing.assert_allclose(np.asarray(pos), q_ref, atol=1e-10, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(vel), dq_ref, atol=1e-10, err_msg=f"t={t}")


def test_rollout_consistency_with_steps(rng):
    h = 0.05
    N = 8
    d = 4
    u_all = rng.normal(size=(N + 1, d))
    p, v, a = rng.normal(size=(3, d))
    coeffs = jerkint.coeff_matrices(N, h, dtype=jnp.float64)
    pos, vel, acc = jerkint.rollout_linear(coeffs, jnp.asarray(u_all), jnp.asarray(p), jnp.asarray(v), jnp.asarray(a))
    pk, vk, ak = jnp.asarray(p), jnp.asarray(v), jnp.asarray(a)
    for k in range(N):
        pk, vk, ak = jerkint.step(jnp.asarray(u_all[k]), jnp.asarray(u_all[k + 1]), pk, vk, ak, h)
        np.testing.assert_allclose(np.asarray(pos[k]), np.asarray(pk), atol=1e-12)
        np.testing.assert_allclose(np.asarray(vel[k]), np.asarray(vk), atol=1e-12)
        np.testing.assert_allclose(np.asarray(acc[k]), np.asarray(ak), atol=1e-12)
