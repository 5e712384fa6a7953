"""Structured Jacobian assembly vs autodiff ground truth (float64)."""
import numpy as np
import jax
import jax.numpy as jnp

from boundmpc_tpu import jacobian as jmod, jerkint, kinematics as kin, ocp
from test_ocp import make_params, CFG, N, DT


def test_structured_jacobian_matches_ad(rng):
    params = make_params(rng)
    coeffs = jerkint.coeff_matrices(N, DT, dtype=jnp.float64)
    lmaps = jmod.linear_maps(CFG, jnp.float64)
    limits = kin.robot_limits()
    u = jnp.asarray(rng.normal(size=(N, 8)) * 0.3)

    r, c, Jr, Jc = jmod.residuals_constraints_and_jacobians(
        CFG, coeffs, lmaps, params, u, limits
    )

    def rc_flat(u_flat):
        return ocp.residuals_and_constraints(
            CFG, coeffs, params, u_flat.reshape(N, 8), limits
        )

    r_ad, c_ad = rc_flat(u.reshape(-1))
    Jr_ad, Jc_ad = jax.jacfwd(rc_flat)(u.reshape(-1))

    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ad), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ad), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Jr), np.asarray(Jr_ad), atol=1e-8,
                               err_msg="residual jacobian mismatch")
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_ad), atol=1e-8,
                               err_msg="constraint jacobian mismatch")


def test_structured_jacobian_scaled_matches_ad(rng):
    params = make_params(rng)
    coeffs = jerkint.coeff_matrices(N, DT, dtype=jnp.float64)
    lmaps = jmod.linear_maps(CFG, jnp.float64)
    limits = kin.robot_limits()
    u = jnp.asarray(rng.normal(size=(N, 8)) * 0.3)

    r, c, Jr, Jc = jmod.residuals_constraints_and_jacobians(
        CFG, coeffs, lmaps, params, u, limits, scaled=True
    )

    def rc_flat(u_flat):
        return ocp.residuals_and_constraints(
            CFG, coeffs, params, u_flat.reshape(N, 8), limits, scaled=True
        )

    r_ad, c_ad = rc_flat(u.reshape(-1))
    Jr_ad, Jc_ad = jax.jacfwd(rc_flat)(u.reshape(-1))
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ad), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Jr), np.asarray(Jr_ad), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_ad), atol=1e-8)
