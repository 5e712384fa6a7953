#!/usr/bin/env python
"""Per-component timing of the batched solver iteration on the current
backend — identifies the hot op before any kernel work.

Components per GN iteration:
  1. rc        — one batched rollout + residual/constraint evaluation
  2. jacobians — the 80-tangent jacfwd sweep (dominant AD cost)
  3. qr_solve  — stacked least-squares step (QR + triangular solve)
  4. linesearch — the parallel merit evaluations (n_ls rollouts)

``--trace DIR`` additionally captures a jax.profiler trace of full
production ticks (open with TensorBoard / Perfetto) — the flamegraph-level
view the reference never had (its tracing is perf_counter pairs,
BoundMPC.py:445-455).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from boundmpc_tpu import engine, jerkint, kinematics, ocp, solver as S
from __graft_entry__ import _build_batch


def timeit(f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def trace_ticks(B: int, outdir: str, n_ticks: int = 5):
    """Capture a jax.profiler trace of production batched ticks."""
    from boundmpc_tpu import batch

    cfg = ocp.OcpConfig()
    scfg = S.RUNTIME_F32
    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                     donate=False)
    states, out = tick_b(states, paths, weights, x_phi_d)  # compile
    jax.block_until_ready(states.phi)
    with jax.profiler.trace(outdir):
        for _ in range(n_ticks):
            states, out = tick_b(states, paths, weights, x_phi_d)
        jax.block_until_ready(states.phi)
    print(f"trace written to {outdir} ({n_ticks} ticks at B={B})")


def main(B=64):
    cfg = ocp.OcpConfig()
    scfg = S.RUNTIME_F32
    dtype = jnp.float32
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray) else a,
        kinematics.robot_limits(),
    )
    states, paths, weights, x_phi_d = _build_batch(B, cfg)

    assemble = jax.jit(jax.vmap(
        lambda st, p, w, x: engine.assemble_params(cfg, st, p, w, x)))
    params = assemble(states, paths, weights, x_phi_d)
    u0 = states.u_warm
    n = cfg.N * (cfg.nr_joints + 1)

    def rc1(par, u_flat):
        return ocp.residuals_and_constraints(
            cfg, coeffs, par, u_flat.reshape(cfg.N, -1), limits)

    rc_b = jax.jit(jax.vmap(rc1, in_axes=(0, 0)))

    def jacs1(par, u_flat):
        return jax.vmap(lambda t: jax.jvp(lambda uu: rc1(par, uu), (u_flat,), (t,))[1],
                        out_axes=(1, 1))(jnp.eye(n, dtype=dtype))

    jacs_b = jax.jit(jax.vmap(jacs1, in_axes=(0, 0)))

    def qr1(A, b):
        Q, R = jnp.linalg.qr(A)
        return jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)

    qr_b = jax.jit(jax.vmap(qr1))

    def ls1(par, u_flat, du):
        alphas = jnp.asarray(0.7, dtype) ** jnp.arange(14, dtype=dtype)
        def merit(a):
            r, c = rc1(par, u_flat + a * du)
            return jnp.sum(r * r) + jnp.sum(jnp.maximum(-c, 0))
        return jax.vmap(merit)(alphas)

    ls_b = jax.jit(jax.vmap(ls1, in_axes=(0, 0, 0)))

    uf = u0.reshape(B, -1)
    t_rc = timeit(rc_b, params, uf)
    r, c = rc_b(params, uf)
    t_jac = timeit(jacs_b, params, uf)
    Jr, Jc = jacs_b(params, uf)
    m = r.shape[1] + c.shape[1] + n
    A = jnp.concatenate([Jr, Jc, jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n))], axis=1)
    b = jnp.concatenate([r, c, jnp.zeros((B, n), dtype)], axis=1)
    t_qr = timeit(qr_b, A, b)
    du = qr_b(A, b)
    t_ls = timeit(ls_b, params, uf, du)

    per_iter = t_jac + t_qr + t_ls + t_rc
    print(f"B={B} platform={jax.devices()[0].platform}")
    print(f"  rc (1 rollout)      : {t_rc*1e3:8.2f} ms")
    print(f"  jacobians (80 tang) : {t_jac*1e3:8.2f} ms")
    print(f"  qr + solve          : {t_qr*1e3:8.2f} ms")
    print(f"  line search (14 ev) : {t_ls*1e3:8.2f} ms")
    print(f"  ≈ per GN iteration  : {per_iter*1e3:8.2f} ms "
          f"→ {scfg.max_iters} iters ≈ {per_iter*scfg.max_iters*1e3:.1f} ms/tick")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=64)
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace of full ticks here")
    args = ap.parse_args()
    if args.trace:
        trace_ticks(args.B, args.trace)
    else:
        main(args.B)
