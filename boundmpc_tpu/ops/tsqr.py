"""Batched tall-skinny QR least-squares solve as a Pallas TPU kernel.

Solves, for every scenario in the batch,  min_x || A x + b ||_2  for the
stacked weighted system of the Gauss-Newton barrier step
(solver.py method="qr"): A is (m, n) with m ~ 1100, n = 80.

Design (TPU-first):
  * batch-in-lanes — the scenario axis lives on the 128 vector lanes, so
    every Householder operation is a (rows, cols) VPU op vectorized over
    128 scenarios at once.  Input layout (m, n+1, B) with [A | b] stacked
    column-wise.
  * streaming update-QR — the triangular factor R (n+1, n+1, 128) stays
    RESIDENT IN VMEM scratch while row chunks of [A|b] stream in through
    the grid; each chunk is eliminated against R with Householder
    reflections whose active span is only (1 + chunk) rows.  XLA's batched
    QR instead re-streams the full 90 MB batch matrix from HBM for every
    column (~14 ms/iteration at B=256 — the measured hot spot).
  * fused back-substitution — after the last chunk, R holds
    [R_A | Q^T b], and the kernel solves R_A x = -(Q^T b) in place,
    emitting x (n, 128) directly; no further XLA linalg is involved.

Numerics match Householder QR exactly (same reflections, different order of
row elimination): condition seen is kappa(A), the square root of the normal
equations' — which is what keeps the float32 production path convergent
(see solver.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tsqr_kernel(ab_ref, x_ref, r_ref, *, n: int, n1: int, rc: int,
                 num_chunks: int, lanes: int):
    """One grid step: fold the incoming (n1, rc, lanes) chunk (columns on
    the OUTER axis so every slice is outer-dim and every reduction is a
    clean sublane reduction) into the VMEM-resident R, then back-substitute
    on the last chunk."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        r_ref[...] = jnp.zeros_like(r_ref)

    C = ab_ref[...]  # (n1, rc, lanes) — C[k] is column k of the chunk rows
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)  # (n1, 1)

    # Statically-unrolled Householder columns (Mosaic cannot lower
    # dynamic_slice on values; a static j makes every slice static).
    for j in range(n1):
        # Householder vector spans [R[j, j]; chunk column j] — R is already
        # upper triangular above row j, so only row j of R participates.
        Rj = r_ref[j, :, :]  # (n1, L)
        rjj = Rj[j:j + 1, :]  # (1, L)
        cj = C[j, :, :]  # (rc, L)
        sigma = jnp.sum(cj * cj, axis=0, keepdims=True)  # (1, L)
        norm = jnp.sqrt(rjj * rjj + sigma)
        alpha = jnp.where(rjj >= 0.0, -norm, norm)
        v0 = rjj - alpha  # (1, L)
        vtv = v0 * v0 + sigma
        beta = jnp.where(vtv > 0.0, 2.0 / vtv, 0.0)  # (1, L)

        # w[k] = v0 R[j,k] + sum_r cj[r] C[k,r]  — sublane reduction
        w = v0 * Rj + jnp.sum(C * cj[None, :, :], axis=1)  # (n1, L)
        bw = jnp.where(col_ids >= j, beta * w, 0.0)  # (n1, L)

        r_ref[j, :, :] = jnp.where(col_ids == j, alpha, Rj - v0 * bw)
        C = C - bw[:, None, :] * cj[None, :, :]

    @pl.when(c == num_chunks - 1)
    def _solve():
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)
        x = jnp.zeros((n, lanes), jnp.float32)
        for i in reversed(range(n)):
            row = r_ref[i, :, :]  # (n1, L): [R[i, :n] | (Q^T b)_i | pad]
            dot = jnp.sum(jnp.where(row_ids > i, row[:n, :] * x, 0.0),
                          axis=0, keepdims=True)  # (1, L)
            xi = (-row[n:n + 1, :] - dot) / row[i:i + 1, :]
            x = jnp.where(row_ids == i, xi, x)
        x_ref[...] = x


@functools.partial(jax.jit, static_argnames=("rc", "lanes"))
def tsqr_ls_solve(A: jnp.ndarray, b: jnp.ndarray, rc: int = 64,
                  lanes: int = 128) -> jnp.ndarray:
    """min_x ||A x + b|| for a batch: A (B, m, n), b (B, m) -> x (B, n).

    float32 only; pads rows to a chunk multiple (zero rows are QR no-ops)
    and the batch to a lane-block multiple.
    """
    B, m, n = A.shape
    n1 = n + 1
    ab = jnp.concatenate([A, b[:, :, None]], axis=2)  # (B, m, n1)

    m_pad = ((m + rc - 1) // rc) * rc
    if m_pad != m:
        ab = jnp.pad(ab, ((0, 0), (0, m_pad - m), (0, 0)))
    B_pad = ((B + lanes - 1) // lanes) * lanes
    if B_pad != B:
        # repeat scenario 0 into the padding lanes (zero-padding would make
        # R singular and NaN the padded back-substitutions)
        pad = jnp.broadcast_to(ab[:1], (B_pad - B, m_pad, n1))
        ab = jnp.concatenate([ab, pad], axis=0)

    abT = jnp.transpose(ab, (2, 1, 0))  # (n1, m, B) — lanes last, cols outer
    num_chunks = m_pad // rc
    num_lb = B_pad // lanes

    kernel = functools.partial(
        _tsqr_kernel, n=n, n1=n1, rc=rc, num_chunks=num_chunks, lanes=lanes)
    x = pl.pallas_call(
        kernel,
        grid=(num_lb, num_chunks),
        in_specs=[pl.BlockSpec((n1, rc, lanes), lambda lb, c: (0, c, lb),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, lanes), lambda lb, c: (0, lb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n1, n1, lanes), jnp.float32)],
    )(abT)
    return jnp.transpose(x, (1, 0))[:B]  # (B, n)


# ---------------------------------------------------------------------------
# vmap-transparent entry point for the solver
# ---------------------------------------------------------------------------

def _ls_solve_xla(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation: XLA Householder QR (per scenario)."""
    Q, R = jnp.linalg.qr(A)
    return -jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)


@jax.custom_batching.custom_vmap
def ls_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """min_x ||A x + b||, written per-scenario so the solver can stay a pure
    per-scenario function under vmap.  The custom batching rule routes the
    BATCHED call to the Pallas TSQR kernel on TPU (batch-in-lanes), where
    XLA's batched QR is HBM-bound; everywhere else (CPU tests, float64
    parity runs) it falls back to XLA QR."""
    return _ls_solve_xla(A, b)


@ls_solve.def_vmap
def _ls_solve_vmap(axis_size, in_batched, A, b):
    A_b, b_b = in_batched
    if not (A_b and b_b):  # unusual partial batching: keep XLA semantics
        out = jax.vmap(_ls_solve_xla,
                       in_axes=(0 if A_b else None, 0 if b_b else None))(A, b)
        return out, True
    if jax.default_backend() == "tpu" and A.dtype == jnp.float32:
        return tsqr_ls_solve(A, b), True
    return jax.vmap(_ls_solve_xla)(A, b), True
