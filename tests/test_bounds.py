"""Quartic bound envelope: defining properties + parity with the reference."""
import numpy as np
import jax.numpy as jnp

from boundmpc_tpu import bounds
from ref_oracle import ref_mpc_utils


def test_quartic_conditions(rng):
    """e(0)=e0, e'(0)=s, e(L)=e1, e'(L)=-s, e(L/2)=e_max."""
    for _ in range(20):
        L = rng.uniform(0.3, 3.0)
        e0, e1 = rng.uniform(0.01, 0.1, 2)
        s = rng.uniform(-0.2, 0.2)
        emax = rng.uniform(0.1, 0.6)
        a4, a3, a2, a1, a0 = bounds.quartic_coeffs(
            jnp.asarray(L), jnp.asarray(e0), jnp.asarray(e1), jnp.asarray(s), jnp.asarray(emax)
        )
        c = np.array([a4, a3, a2, a1, a0], dtype=float)
        poly = np.poly1d(c)
        dpoly = poly.deriv()
        np.testing.assert_allclose(poly(0.0), e0, atol=1e-9)
        np.testing.assert_allclose(dpoly(0.0), s, atol=1e-9)
        np.testing.assert_allclose(poly(L), e1, atol=1e-9)
        np.testing.assert_allclose(dpoly(L), -s, atol=1e-9)
        np.testing.assert_allclose(poly(L / 2.0), emax, atol=1e-9)


def test_quartic_vs_reference_formula(rng):
    """Our phi0=0 specialization equals reference compute_bound_params."""
    for _ in range(20):
        L = rng.uniform(0.3, 3.0)
        e0, e1 = rng.uniform(-0.1, 0.1, 2)
        s = rng.uniform(-0.2, 0.2)
        emax = rng.uniform(-0.6, 0.6)
        ref = ref_mpc_utils.compute_bound_params(0.0, L, e0, e1, s, emax)
        ours = bounds.quartic_coeffs(
            jnp.asarray(L), jnp.asarray(e0), jnp.asarray(e1), jnp.asarray(s), jnp.asarray(emax)
        )
        np.testing.assert_allclose([float(x) for x in ours], list(ref), atol=1e-9)


def test_quartic_eval(rng):
    coeffs = jnp.asarray(rng.normal(size=(5,)))
    phi = 0.7
    val = float(bounds.quartic_eval(jnp.asarray(phi), coeffs))
    ref = float(
        ref_mpc_utils.compute_fourth_order_error_bound_general(
            phi, *[float(c) for c in coeffs]
        )
    )
    np.testing.assert_allclose(val, ref, atol=1e-12)


def test_segment_bound_coeffs_channels(rng):
    """Channel-by-channel parity with reference BoundMPC.compute_error_bounds
    (reimplemented from its published semantics)."""
    S = 4
    seg_len = rng.uniform(0.4, 1.5, S)
    asymm_lower = -np.abs(rng.uniform(0.1, 1.0, (S, 4)))
    asymm_upper = np.abs(rng.uniform(0.1, 1.0, (S, 4)))
    s, epmin, ermin, epmax, ermax = 0.05, 0.01, 0.2, 0.5, 0.7

    out = np.asarray(
        bounds.segment_bound_coeffs(
            jnp.asarray(seg_len),
            jnp.asarray(asymm_lower),
            jnp.asarray(asymm_upper),
            s,
            epmin,
            ermin,
            epmax,
            ermax,
        )
    )
    assert out.shape == (S, 9, 5)
    asymm = np.concatenate(
        [asymm_upper[:, :2], -asymm_lower[:, :2], asymm_upper[:, 2:], -asymm_lower[:, 2:]],
        axis=1,
    )
    for i in range(S):
        e0 = np.array([epmin] * 2 + [-epmin] * 2 + [ermin] * 2 + [-ermin] * 2 + [ermin])
        emax = np.array([epmax] * 2 + [-epmax] * 2 + [ermax] * 2 + [-ermax] * 2 + [ermax])
        sv = np.array([s, s, -s, -s, s, s, -s, -s, s])
        scale = np.concatenate([asymm[i], [asymm[i, -1]]])
        emax = emax * scale
        sv = sv * scale
        for c in range(9):
            ref = ref_mpc_utils.compute_bound_params(0.0, seg_len[i], e0[c], e0[c], sv[c], emax[c])
            np.testing.assert_allclose(out[i, c], list(ref), atol=1e-9)
