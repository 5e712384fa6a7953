"""Per-component timing of the solver's GN iteration at batch size B.

Times, each jitted standalone and batched over B scenarios:
  jac    — structured residual+constraint Jacobians (Jr, Jc)
  qr     — stacked weighted-LS QR factorization + triangular solve (the step)
  ls     — parallel Armijo line search (n_ls merit evaluations = rollouts)
  iter   — marginal cost of one full solver iteration (max_iters=2 vs 1)
  tick   — the full production tick

Usage: python experiments/profile_solver.py [--B 256] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from functools import partial
    from boundmpc_tpu import batch, engine, jacobian as jmod, jerkint, \
        kinematics, ocp, solver as solver_mod
    from boundmpc_tpu.solver import _barrier, _barrier_d1, _barrier_d2
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    B = args.B
    dtype = jnp.float32
    print(f"platform={jax.devices()[0].platform} B={B} scfg.method={scfg.method}",
          flush=True)

    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = kinematics.robot_limits()
    limits = jax.tree.map(lambda a: jnp.asarray(a, dtype)
                          if isinstance(a, jnp.ndarray) else a, limits)
    N, nu = cfg.N, cfg.nr_joints + 1
    n = N * nu

    # Advance a few ticks so states are in the receding-horizon regime.
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=dtype, donate=False)
    for _ in range(3):
        states, out = tick_b(states, paths, weights, x_phi_d)
    jax.block_until_ready(states.phi)

    ap_b = jax.jit(jax.vmap(partial(engine.assemble_params, cfg),
                            in_axes=(0, 0, 0, 0)))
    params = ap_b(states, paths, weights, x_phi_d)
    u0 = states.u_warm

    lmaps = jmod.linear_maps(cfg, dtype)

    def jac_one(p, u):
        with jax.default_matmul_precision("float32"):
            return jmod.residuals_constraints_and_jacobians(
                cfg, coeffs, lmaps, p, u, limits, scaled=scfg.scale_constraints)

    jac_b = jax.jit(jax.vmap(jac_one))
    r, c, Jr, Jc = jac_b(params, u0)
    print(f"shapes: Jr {Jr.shape} Jc {Jc.shape}", flush=True)

    mu = jnp.full((B,), scfg.mu_warm, dtype)

    def qr_one(r, c, Jr, Jc, mu):
        with jax.default_matmul_precision("float32"):
            z = -c
            w = mu * _barrier_d2(z, scfg.delta)
            sqw = jnp.sqrt(w)
            rho = mu * _barrier_d1(z, scfg.delta) / jnp.maximum(sqw, 1e-30)
            sq2 = jnp.sqrt(jnp.asarray(2.0, dtype))
            A = jnp.concatenate([sq2 * Jr, sqw[:, None] * Jc,
                                 jnp.sqrt(scfg.reg) * jnp.eye(n, dtype=dtype)],
                                axis=0)
            b = jnp.concatenate([sq2 * r, -rho, jnp.zeros(n, dtype)], axis=0)
            Q, R = jnp.linalg.qr(A)
            return -jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)

    qr_b = jax.jit(jax.vmap(qr_one))

    def chol_one(Jr, Jc, c, mu):
        with jax.default_matmul_precision("float32"):
            z = -c
            w = jnp.minimum(mu * _barrier_d2(z, scfg.delta), 1e5)
            H = 2.0 * (Jr.T @ Jr) + (Jc.T * w[None, :]) @ Jc \
                + scfg.reg * jnp.eye(n, dtype=dtype)
            L = jnp.linalg.cholesky(H)
            return jax.scipy.linalg.cho_solve((L, True), jnp.ones(n, dtype))

    chol_b = jax.jit(jax.vmap(chol_one))

    ls_alphas = scfg.ls_decay ** jnp.arange(scfg.n_ls, dtype=dtype)

    def ls_one(p, u_flat, du, mu):
        with jax.default_matmul_precision("float32"):
            def merit(uf):
                rr, cc = ocp.residuals_and_constraints(
                    cfg, coeffs, p, uf.reshape(N, nu), limits,
                    scaled=scfg.scale_constraints)
                return jnp.sum(rr * rr) + mu * jnp.sum(_barrier(-cc, scfg.delta))
            return jax.vmap(lambda a: merit(u_flat + a * du))(ls_alphas)

    ls_b = jax.jit(jax.vmap(ls_one))

    du = qr_b(r, c, Jr, Jc, mu)
    u_flat = u0.reshape(B, -1)

    def solve_iters(k):
        sc = scfg._replace(max_iters=k)
        f = jax.jit(jax.vmap(lambda p, u: solver_mod.solve(
            cfg, sc, coeffs, p, u, limits, mu0=scfg.mu_warm)))
        return f

    s1, s2 = solve_iters(1), solve_iters(2)

    t_jac = timeit(jac_b, params, u0)
    t_qr = timeit(qr_b, r, c, Jr, Jc, mu)
    t_chol = timeit(chol_b, Jr, Jc, c, mu)
    t_ls = timeit(ls_b, params, u_flat, du, mu)
    t_s1 = timeit(s1, params, u0)
    t_s2 = timeit(s2, params, u0)
    t_ap = timeit(ap_b, states, paths, weights, x_phi_d)
    t_tick = timeit(tick_b, states, paths, weights, x_phi_d)

    print(f"assemble_params : {t_ap:8.2f} ms")
    print(f"jacobians       : {t_jac:8.2f} ms")
    print(f"qr step         : {t_qr:8.2f} ms")
    print(f"chol (capped)   : {t_chol:8.2f} ms")
    print(f"line search     : {t_ls:8.2f} ms")
    print(f"solve 1 iter    : {t_s1:8.2f} ms")
    print(f"solve 2 iters   : {t_s2:8.2f} ms  (marginal iter {t_s2 - t_s1:.2f})")
    print(f"full tick       : {t_tick:8.2f} ms")


if __name__ == "__main__":
    main()
