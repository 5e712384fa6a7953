"""Batch-axis layout experiment: vmap in_axes=0 (batch-major) vs
in_axes=-1 (batch-in-lanes) for the rollout/merit evaluation.

Most engine tensors have tiny trailing dims (7 joints, 3/6 Cartesian, N=10
stages); with the batch on axis 0 every elementwise VPU op wastes >90% of
its (8, 128) tile.  Mapping the batch onto the LAST axis puts B=256 on the
128-lane dimension — full lane utilization for the scalar-heavy FK chain.

Usage: python experiments/prof_batchaxis.py [--B 256] [--K 20]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from boundmpc_tpu import batch, engine, jerkint, kinematics, ocp, \
        solver as solver_mod
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

    # batch-last copies of the inputs
    params_T = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), params)
    u0_T = jnp.moveaxis(u0, 0, -1)

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
        print(f"{name:22s}: {np.median(ts)*1e3:7.3f} ms/iter", flush=True)

    # rollout, batch axis 0
    def body0(u, _):
        r, c = jax.vmap(rc_one)(params, u)
        return u + 1e-12 * jnp.sum(r)[None, None], None
    scan_timer("rollout batch-major", body0, u0)

    # rollout, batch axis -1
    def bodyT(u, _):
        r, c = jax.vmap(rc_one, in_axes=-1, out_axes=-1)(params_T, u)
        return u + 1e-12 * jnp.sum(r)[None, None], None
    scan_timer("rollout batch-last", bodyT, u0_T)

    # jacfwd both ways
    def jac_one(p, uf):
        def rcf(v):
            return rc_one(p, v)
        return jax.vmap(lambda t: jax.jvp(rcf, (uf,), (t,))[1],
                        out_axes=(1, 1))(jnp.eye(n, dtype=dtype))

    def jbody0(u, _):
        Jr, Jc = jax.vmap(jac_one)(params, u)
        return u + 1e-12 * jnp.sum(Jr)[None, None], None
    scan_timer("jacfwd batch-major", jbody0, u0)

    def jbodyT(u, _):
        Jr, Jc = jax.vmap(jac_one, in_axes=-1, out_axes=-1)(params_T, u)
        return u + 1e-12 * jnp.sum(Jr)[None, None], None
    scan_timer("jacfwd batch-last", jbodyT, u0_T)

    # correctness spot check
    r0, c0 = jax.vmap(rc_one)(params, u0)
    rT, cT = jax.vmap(rc_one, in_axes=-1, out_axes=-1)(params_T, u0_T)
    err = float(jnp.max(jnp.abs(r0 - jnp.moveaxis(rT, -1, 0))))
    print(f"batch-last == batch-major: max|dr| = {err:.2e}")


if __name__ == "__main__":
    main()
