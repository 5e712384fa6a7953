"""Per-iteration instrumentation of one failing RUNTIME_F32 solve.

Replays the solver's GN iteration in a host Python loop (same math, same
functions) printing mu, merit, violation, step size, line-search alpha and
Hessian conditioning per iteration — for a scenario/tick where the batched
f32 production path fails (see experiments/debug_f32.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from boundmpc_tpu import batch, engine, jerkint, kinematics, ocp
from boundmpc_tpu import solver as solver_mod
from boundmpc_tpu import jacobian as jmod
from boundmpc_tpu.solver import _barrier, _barrier_d1, _barrier_d2
from __graft_entry__ import _build_batch


# Retired-from-production woodbury/capped-Cholesky study knobs (solver.py
# keeps only the qr/qr_full methods; see SolverConfig.method).
W_CAP = 1e5
K_ACTIVE = 40

def debug_solve(cfg, scfg, coeffs, params, u0, limits, mu0, label=""):
    N, nu = cfg.N, cfg.nr_joints + 1
    n = N * nu
    dtype = u0.dtype
    lmaps = jmod.linear_maps(cfg, dtype)

    def rc(u_flat):
        return ocp.residuals_and_constraints(
            cfg, coeffs, params, u_flat.reshape(N, nu), limits,
            scaled=scfg.scale_constraints)

    def merit(u_flat, mu):
        r, c = rc(u_flat)
        return jnp.sum(r * r) + mu * jnp.sum(_barrier(-c, scfg.delta))

    ls_alphas = scfg.ls_decay ** jnp.arange(scfg.n_ls, dtype=dtype)
    u = u0.reshape(-1).astype(dtype)
    mu = jnp.asarray(mu0, dtype)

    for k in range(scfg.max_iters):
        r, c, Jr, Jc = jmod.residuals_constraints_and_jacobians(
            cfg, coeffs, lmaps, params, u.reshape(N, nu), limits,
            scaled=scfg.scale_constraints)
        z = -c
        g = 2.0 * (Jr.T @ r) - mu * (Jc.T @ _barrier_d1(z, scfg.delta))
        w = mu * _barrier_d2(z, scfg.delta)

        w_capped = jnp.minimum(w, W_CAP)
        Hm = 2.0 * (Jr.T @ Jr) + (Jc.T * w_capped[None, :]) @ Jc
        Hm = Hm + scfg.reg * jnp.eye(n, dtype=dtype)
        # conditioning diagnostics in f64
        H64 = np.asarray(Hm, np.float64)
        ev = np.linalg.eigvalsh(H64)
        kappa = ev[-1] / max(ev[0], 1e-300)
        Hfull64 = (2.0 * np.asarray(Jr, np.float64).T @ np.asarray(Jr, np.float64)
                   + (np.asarray(Jc, np.float64).T * np.asarray(w, np.float64)[None, :])
                   @ np.asarray(Jc, np.float64)
                   + scfg.reg * np.eye(n))
        evf = np.linalg.eigvalsh(Hfull64)
        kappa_full = evf[-1] / max(evf[0], 1e-300)
        n_over = int(jnp.sum(w > W_CAP))

        L = jnp.linalg.cholesky(Hm)
        Minv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(n, dtype=dtype))

        if scfg.method == "qr_reduced":
            w_capped = jnp.minimum(w, W_CAP)
            G = 2.0 * (Jr.T @ Jr) + (Jc.T * w_capped[None, :]) @ Jc
            G = G + scfg.reg * jnp.eye(n, dtype=dtype)
            L0c = jnp.linalg.cholesky(G)
            dwv = w - w_capped
            dw_k, sidx = jax.lax.top_k(dwv, K_ACTIVE)
            sel = dw_k > 0.0
            sqdw = jnp.sqrt(jnp.maximum(dw_k, 1e-30))
            S = jnp.where(sel, sqdw, 0.0)[:, None] * Jc[sidx]
            d1v = _barrier_d1(z, scfg.delta)
            d1_lo = d1v.at[sidx].set(jnp.where(sel, 0.0, d1v[sidx]))
            g_lo = 2.0 * (Jr.T @ r) - mu * (Jc.T @ d1_lo)
            b1 = jnp.where(sel, -mu * d1v[sidx] / sqdw, 0.0)
            b0 = jax.scipy.linalg.solve_triangular(L0c, g_lo, lower=True)
            Ar = jnp.concatenate([L0c.T, S], axis=0)
            br_ = jnp.concatenate([b0, b1])
            Qr_, Rr_ = jnp.linalg.qr(Ar)
            du = -jax.scipy.linalg.solve_triangular(Rr_, Qr_.T @ br_, lower=False)
        elif scfg.method == "woodbury":
            dw = jnp.maximum(w - W_CAP, 0.0)
            _, sidx = jax.lax.top_k(dw, K_ACTIVE)
            dw_k = dw[sidx]
            U = Jc[sidx]
            sol_g = jax.scipy.linalg.cho_solve((L, True), g)
            sol_U = jax.scipy.linalg.cho_solve((L, True), U.T)
            inv_dw = jnp.where(dw_k > 0.0, 1.0 / jnp.maximum(dw_k, 1e-30), 1e30)
            S = jnp.diag(inv_dw) + U @ sol_U
            y = jnp.linalg.solve(S, U @ sol_g)
            du = -(sol_g - sol_U @ y)
        elif scfg.method == "qr":
            sqw = jnp.sqrt(w)
            rho = mu * _barrier_d1(z, scfg.delta) / jnp.maximum(sqw, 1e-30)
            sq2 = jnp.sqrt(jnp.asarray(2.0, dtype))
            A = jnp.concatenate(
                [sq2 * Jr, sqw[:, None] * Jc,
                 jnp.sqrt(scfg.reg) * jnp.eye(n, dtype=dtype)], axis=0)
            b = jnp.concatenate([sq2 * r, -rho, jnp.zeros(n, dtype)], axis=0)
            Q, R = jnp.linalg.qr(A)
            du = -jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)
        else:

            def Hmul(p):
                return (2.0 * (Jr.T @ (Jr @ p)) + Jc.T @ (w * (Jc @ p))
                        + scfg.reg * p)

            x0 = -(Minv @ g)
            r0 = -g - Hmul(x0)
            z0 = Minv @ r0
            x, rr, zz, p, rz = x0, r0, z0, z0, jnp.dot(r0, z0)
            for _ in range(scfg.pcg_iters):
                Hp = Hmul(p)
                denom = jnp.dot(p, Hp)
                alpha_cg = rz / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
                alpha_cg = jnp.where(denom > 0.0, alpha_cg, 0.0)
                x = x + alpha_cg * p
                rr = rr - alpha_cg * Hp
                zz = Minv @ rr
                rz_new = jnp.dot(rr, zz)
                beta = rz_new / jnp.where(jnp.abs(rz) > 1e-30, rz, 1e-30)
                p = zz + beta * p
                rz = rz_new
            cg_better = jnp.linalg.norm(rr) < jnp.linalg.norm(r0)
            du = jnp.where(cg_better & jnp.all(jnp.isfinite(x)), x, x0)

        # f64 exact Newton step for comparison
        du64 = np.linalg.solve(Hfull64, -np.asarray(g, np.float64))
        cos = float(np.dot(np.asarray(du, np.float64), du64)
                    / (np.linalg.norm(np.asarray(du)) * np.linalg.norm(du64) + 1e-300))

        m0 = jnp.sum(r * r) + mu * jnp.sum(_barrier(z, scfg.delta))
        slope = jnp.dot(g, du)
        if os.environ.get("DBG_FTB", "0") == "1":
            # fraction-to-boundary: cap alpha so z - a*(Jc du) >= (1-tau) z
            dz = Jc @ du  # linearized constraint increase
            pos = dz > 0.0
            zsafe = jnp.maximum(z, scfg.delta)
            a_ftb = jnp.where(pos, 0.995 * zsafe / jnp.where(pos, dz, 1.0), jnp.inf)
            a_max = jnp.minimum(1.0, jnp.min(a_ftb))
        else:
            a_max = jnp.asarray(1.0, dtype)
        ls_alphas_t = a_max * ls_alphas
        cand_m = jax.vmap(lambda a: merit(u + a * du, mu))(ls_alphas_t)
        ok = (cand_m <= m0 + scfg.armijo * ls_alphas_t * slope) & jnp.isfinite(cand_m)
        first_ok = jnp.argmax(ok)
        any_ok = jnp.any(ok)
        best = jnp.argmin(jnp.where(jnp.isfinite(cand_m), cand_m, jnp.inf))
        idx = jnp.where(any_ok, first_ok, best)
        alpha = ls_alphas_t[idx]
        improved = bool(any_ok | (cand_m[best] < m0))
        alpha = jnp.where(improved, alpha, 0.0)

        viol = float(jnp.sum(jnp.where(c > 1e-6, c, 0.0)))
        print(f"{label} it{k:2d} mu={float(mu):.1e} m0={float(m0):+.6e} "
              f"viol={viol:.3e} |g|={float(jnp.linalg.norm(g)):.2e} "
              f"|du|={float(jnp.max(jnp.abs(du))):.2e} cos_du64={cos:+.3f} "
              f"kapM={kappa:.1e} kapH={kappa_full:.1e} n_over={n_over} "
              f"maxw={float(w.max()):.1e} alpha={float(alpha):.3f} "
              f"imp={improved}", flush=True)

        u_new = jnp.where(improved, u + alpha * du, u)
        mu = jnp.where(improved,
                       jnp.maximum(mu * scfg.mu_decay, scfg.mu_min),
                       jnp.minimum(mu / scfg.mu_decay, scfg.mu_init))
        u = u_new
    return u.reshape(N, nu)


def main():
    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=jnp.float32)
    limits = kinematics.robot_limits()

    B = 16
    states, paths, weights, x_phi_d = _build_batch(B, cfg)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32, donate=False)

    nticks = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scen = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    for t in range(nticks):
        states, out = tick_b(states, paths, weights, x_phi_d)
    succ = np.asarray(out.success)
    viol = np.asarray(out.stats.viol)
    print(f"after {nticks} ticks: success={succ}  viol_max={viol.max():.3e}")
    print(f"debugging scenario {scen}: success={succ[scen]} viol={viol[scen]:.3e}")

    take = lambda tree: jax.tree.map(lambda a: a[scen], tree)
    st = take(states)
    path = take(paths)
    params = engine.assemble_params(cfg, st, path, weights[scen], x_phi_d[scen])
    mu0 = scfg.mu_warm if bool(st.has_prev) and int(st.error_count) == 0 else scfg.mu_init

    method = os.environ.get("DBG_METHOD", "pcg")
    global K_ACTIVE
    K_ACTIVE = int(os.environ.get("DBG_K", "40"))
    scfg = scfg._replace(method=method)
    print(f"=== f32 {method} k={K_ACTIVE} replay ===")
    debug_solve(cfg, scfg, coeffs, params, st.u_warm, limits, mu0, "f32")


if __name__ == "__main__":
    main()
