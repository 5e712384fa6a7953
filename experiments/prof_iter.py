"""Per-iteration component costs, each fused in a lax.scan (dispatch-free).

Components of one GN iteration at B x (m=550, n=80):
  jac   — the 80-tangent jacfwd of (r, c)              [jac="ad"]
  tsqr  — the Pallas TSQR LS solve on a 550-row stack
  ls    — the 8-candidate parallel Armijo line search (8 rollouts)
  rollout — one residual/constraint evaluation (for scale)

Usage: python experiments/prof_iter.py [--B 256] [--K 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from functools import partial
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from boundmpc_tpu import batch, engine, jerkint, kinematics, ocp, \
        solver as solver_mod
    from boundmpc_tpu.solver import _barrier
    from boundmpc_tpu.ops import tsqr as tsqr_mod
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    B, K = args.B, args.K
    dtype = jnp.float32
    N, nu = cfg.N, cfg.nr_joints + 1
    n = N * nu

    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = jax.tree.map(lambda a: jnp.asarray(a, dtype)
                          if isinstance(a, jnp.ndarray) else a,
                          kinematics.robot_limits())
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=dtype, donate=False)
    for _ in range(4):
        states, out = tick_b(states, paths, weights, x_phi_d, pref)
    jax.block_until_ready(states.phi)
    ap_b = jax.jit(jax.vmap(partial(engine.assemble_params, cfg)))
    params = ap_b(states, paths, weights, x_phi_d)
    u0 = states.u_warm.reshape(B, -1)

    def rc_one(p, uf):
        with jax.default_matmul_precision("float32"):
            return ocp.residuals_and_constraints(
                cfg, coeffs, p, uf.reshape(N, nu), limits,
                scaled=scfg.scale_constraints)

    def scan_timer(name, body, x0):
        f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=K)[0])
        y = f(x0)
        jax.block_until_ready(y)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            y = f(x0)
            jax.block_until_ready(y)
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name:10s}: {np.median(ts)*1e3:7.3f} ms/iter", flush=True)

    # rollout (vmapped residual eval), perturbed input to defeat CSE
    def body_rollout(u, _):
        r, c = jax.vmap(rc_one)(params, u)
        return u + 1e-12 * jnp.sum(r)[None, None], None
    scan_timer("rollout", body_rollout, u0)

    # jacfwd (ad mode, full)
    def body_jac(u, _):
        def jac_one(p, uf):
            def rcf(v):
                return rc_one(p, v)
            with jax.default_matmul_precision("float32"):
                Jr, Jc = jax.vmap(lambda t: jax.jvp(rcf, (uf,), (t,))[1],
                                  out_axes=(1, 1))(jnp.eye(n, dtype=dtype))
            return Jr, Jc
        Jr, Jc = jax.vmap(jac_one)(params, u)
        return u + 1e-12 * jnp.sum(Jr)[None, None], None
    scan_timer("jacfwd", body_jac, u0)

    # tsqr at the production shape (m=550)
    m = 550
    key = jax.random.PRNGKey(0)
    A0 = jax.random.normal(key, (B, m, n), dtype)
    b0 = jax.random.normal(key, (B, m), dtype)

    def body_tsqr(Ab, _):
        A, b = Ab
        x = tsqr_mod.tsqr_ls_solve(A, b)
        return (A + 1e-12 * jnp.sum(x), b), None
    scan_timer("tsqr550", body_tsqr, (A0, b0))

    # line search: 8 merit evaluations
    ls_alphas = scfg.ls_decay ** jnp.arange(scfg.n_ls, dtype=dtype)
    du0 = jax.random.normal(key, (B, n), dtype) * 1e-3

    def body_ls(u, _):
        def ls_one(p, uf, du):
            def merit(v):
                r, c = rc_one(p, v)
                return jnp.sum(r * r) + 1e-6 * jnp.sum(
                    _barrier(-c, scfg.delta))
            with jax.default_matmul_precision("float32"):
                return jax.vmap(lambda a: merit(uf + a * du))(ls_alphas)
        cm = jax.vmap(ls_one)(params, u, du0)
        return u + 1e-12 * jnp.sum(cm)[None, None], None
    scan_timer("linesearch", body_ls, u0)


if __name__ == "__main__":
    main()
