"""Pallas TSQR least-squares kernel vs jnp.linalg.qr (float32).

Runs the kernel in interpreter mode on CPU (conftest forces cpu); under
BOUNDMPC_TEST_TPU=1 the same checks run compiled on the chip.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl


def _ls_ref(A, b):
    Q, R = jnp.linalg.qr(A)
    return -jax.scipy.linalg.solve_triangular(
        R, jnp.einsum("bmi,bm->bi", Q, b), lower=False)


def _run_tsqr(A, b, **kw):
    import boundmpc_tpu.ops.tsqr as tsqr_mod

    if jax.default_backend() == "tpu":
        return tsqr_mod.tsqr_ls_solve(A, b, **kw)
    # interpreter mode on CPU: patch pallas_call
    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
        return tsqr_mod.tsqr_ls_solve.__wrapped__(A, b, **kw)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("B,m,n", [(4, 200, 16), (3, 130, 8)])
def test_tsqr_matches_qr_random(B, m, n):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, m)), jnp.float32)
    x = _run_tsqr(A, b, rc=32, lanes=8)
    x_ref = _ls_ref(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)


def test_tsqr_weighted_illconditioned():
    """Rows scaled like the barrier step's sqrt-weights (1 .. 1e6): the
    solution must stay accurate relative to a float64 solve."""
    rng = np.random.default_rng(1)
    B, m, n = 2, 160, 12
    A64 = rng.normal(size=(B, m, n))
    scale = 10.0 ** rng.uniform(0, 6, size=(B, m))
    A64 = A64 * scale[:, :, None]
    b64 = rng.normal(size=(B, m)) * scale
    x64 = np.stack([np.linalg.lstsq(A64[i], -b64[i], rcond=None)[0]
                    for i in range(B)])
    x = _run_tsqr(jnp.asarray(A64, jnp.float32), jnp.asarray(b64, jnp.float32),
                  rc=32, lanes=8)
    err = np.abs(np.asarray(x) - x64).max() / (np.abs(x64).max() + 1e-12)
    assert err < 5e-3, err


def test_tsqr_row_and_batch_padding():
    """m not a chunk multiple, B not a lane multiple."""
    rng = np.random.default_rng(2)
    B, m, n = 5, 173, 10
    A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, m)), jnp.float32)
    x = _run_tsqr(A, b, rc=64, lanes=8)
    x_ref = _ls_ref(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)
