"""Decompose the fused tick cost: fixed overhead vs marginal iteration.

Runs scanned ticks at several max_iters and reports per-tick wall time, plus
a du_inf histogram probe (what step norms warm lanes actually reach) to size
a reachable convergence tolerance.

Usage: python experiments/prof_fixed.py [--B 256]
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
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from boundmpc_tpu import batch, ocp, solver as solver_mod
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    B = args.B
    base = solver_mod.RUNTIME_F32

    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    tick_b = batch.make_batched_tick(cfg, base, dtype=jnp.float32, donate=False)
    for _ in range(5):
        states, out = tick_b(states, paths, weights, x_phi_d)
    jax.block_until_ready(states.phi)

    # du_inf probe: rerun the warm state's solve at several iteration counts
    # and report the last accepted step size distribution.
    from boundmpc_tpu import engine, jerkint, kinematics
    from functools import partial
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float32)
    limits = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32)
                          if isinstance(a, jnp.ndarray) else a,
                          kinematics.robot_limits())
    ap_b = jax.jit(jax.vmap(partial(engine.assemble_params, cfg)))
    params = ap_b(states, paths, weights, x_phi_d)

    def solve_k(k):
        sc = base._replace(max_iters=k)
        def one(p, u):
            with jax.default_matmul_precision("float32"):
                return solver_mod.solve(cfg, sc, coeffs, p, u, limits,
                                        mu0=base.mu_warm)
        return jax.jit(jax.vmap(one))

    for k in [10]:
        u_opt, st = solve_k(k)(params, states.u_warm)
        jax.block_until_ready(u_opt)
        ls = np.asarray(st.step_inf)
        reg = np.asarray(st.reg_final)
        viol = np.asarray(st.viol)
        obj = np.asarray(st.obj)
        print(f"iters={k:3d}: step_inf p10={np.percentile(ls,10):.2e} "
              f"p50={np.percentile(ls,50):.2e} "
              f"p90={np.percentile(ls,90):.2e} max={ls.max():.2e}  "
              f"reg p50={np.percentile(reg,50):.1e} max={reg.max():.1e}  "
              f"viol max={viol.max():.2e}  obj mean={obj.mean():.4f}",
              flush=True)

    # fused tick cost vs max_iters x jac mode (prefactor passed)
    pref = batch.make_prefactor_batch(cfg, paths, weights, x_phi_d)
    for jac in ["ad", "structured"]:
        for k in [1, 2, 10, 40]:
            sc = base._replace(max_iters=k, jac=jac)
            scan_b = batch.make_scanned_ticks(cfg, sc, 5, dtype=jnp.float32)
            s = jax.tree.map(jnp.copy, states)  # donation-safe copy
            s, _ = scan_b(s, paths, weights, x_phi_d, pref)
            jax.block_until_ready(s.phi)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                s, _ = scan_b(s, paths, weights, x_phi_d, pref)
                jax.block_until_ready(s.phi)
                ts.append((time.perf_counter() - t0) / 5)
            print(f"jac={jac:10s} max_iters={k:3d}: per-tick "
                  f"{np.median(ts)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
