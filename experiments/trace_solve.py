"""Iterate-level trace of ONE lane's solve from a dumped fleet state.

Python-loop replica of solver.solve's method="qr" step (same math, same
reduced stacks) printing merit / viol / alpha / reg / mu / |du| per
iteration — for diagnosing lanes that burn the full iteration budget.

Usage:
  python experiments/trace_solve.py --lane 55 --state /tmp/state_t36.npz \
      [--B 256] [--iters 40] [--mu0 1e-6] [--platform cpu] [--f64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane", type=int, required=True)
    ap.add_argument("--state", default="/tmp/fleet_state.npz")
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--mu0", type=float, default=None)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from functools import partial
    from boundmpc_tpu import engine, jacobian as jmod, jerkint, kinematics, \
        ocp, solver as solver_mod
    from boundmpc_tpu.solver import _barrier, _barrier_d1, _barrier_d2
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    dtype = jnp.float64 if args.f64 else jnp.float32

    states0, paths, weights, x_phi_d = _build_batch(args.B, cfg)
    states = engine.load_state_dump(states0, np.load(args.state))

    cast = lambda tree: jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(np.asarray(a)), tree)
    take = lambda tree: jax.tree.map(lambda a: np.asarray(a)[args.lane], tree)
    st = cast(take(states))
    pth = cast(take(paths))
    w = jnp.asarray(np.asarray(weights)[args.lane], dtype)
    x = jnp.asarray(np.asarray(x_phi_d)[args.lane], dtype)
    coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
    limits = jax.tree.map(lambda a: jnp.asarray(a, dtype)
                          if isinstance(a, jnp.ndarray) else a,
                          kinematics.robot_limits())

    sec = engine.advance_sector(pth, st.sector, st.phi)
    crossed = bool(sec != st.sector)
    st = st._replace(sector=sec)
    params = engine.assemble_params(cfg, st, pth, w, x)
    print(f"lane {args.lane}: phi={float(st.phi):.4f} sector={int(sec)} "
          f"crossed={crossed} error_count={int(st.error_count)}")

    mu0 = args.mu0
    if mu0 is None:
        shock = crossed or int(st.error_count) > 0
        mu0 = scfg.mu_shift if shock else scfg.mu_warm
        if not bool(st.has_prev):
            mu0 = scfg.mu_init
    print(f"mu0 = {mu0:g}")

    N, nu = cfg.N, cfg.nr_joints + 1
    n = N * nu

    def rc(uf):
        return ocp.residuals_and_constraints(
            cfg, coeffs, params, uf.reshape(N, nu), limits,
            scaled=scfg.scale_constraints)

    rc_j = jax.jit(rc)

    @jax.jit
    def jacs(uf):
        r, c = rc(uf)
        Jr, Jc = jax.vmap(lambda t: jax.jvp(rc, (uf,), (t,))[1],
                          out_axes=(1, 1))(jnp.eye(n, dtype=dtype))
        return r, c, Jr, Jc

    @jax.jit
    def unscaled_viol(uf):
        ev = ocp.evaluate_stages(cfg, coeffs, params, uf.reshape(N, nu))
        cf = ocp.full_constraints(cfg, params, ev, uf.reshape(N, nu), limits)
        return jnp.sum(jnp.where(cf > 1e-6, cf, 0.0))

    import numpy as onp
    nj = cfg.nr_joints
    blk = 18 + 4 * nj + 4
    dyn_idx = (onp.arange(N)[:, None] * blk + onp.arange(18)[None, :]).ravel()
    nlN, qN, phiN = 5 * N, nj * N, N
    s_nl = slice(0, nlN)
    s_qup = slice(nlN, nlN + qN)
    s_qlo = slice(nlN + qN, nlN + 2 * qN)
    s_dqup = slice(nlN + 2 * qN, nlN + 3 * qN)
    s_dqlo = slice(nlN + 3 * qN, nlN + 4 * qN)
    off = nlN + 4 * qN
    s_negphi = slice(off, off + phiN)
    s_phimax = slice(off + phiN, off + 2 * phiN)
    s_dphi = slice(off + 2 * phiN, off + 3 * phiN)
    s_uup = slice(off + 3 * phiN, off + 3 * phiN + n)
    s_ulo = slice(off + 3 * phiN + n, off + 3 * phiN + 2 * n)

    Jq0, Jdq0, Jphi0, Jdphi0 = jmod.box_jacobians(cfg, dtype)
    J_lin = jmod.linear_stack(cfg, params.weights, dtype)
    Q0, R0 = jnp.linalg.qr(J_lin)
    c_lin = jmod.linear_offsets(cfg, coeffs, params, dtype)
    d0 = Q0.T @ c_lin

    ls_alphas = scfg.ls_decay ** jnp.arange(scfg.n_ls, dtype=dtype)
    u = jnp.asarray(st.u_warm, dtype).reshape(-1)
    mu = float(mu0)
    reg = scfg.reg
    sq2 = float(np.sqrt(2.0))

    for k in range(args.iters):
        r, c, Jr, Jc = jacs(u)
        z = -c
        d1 = _barrier_d1(z, scfg.delta)
        wts = mu * _barrier_d2(z, scfg.delta)
        r_dyn = r[dyn_idx]
        Jr_dyn = Jr[dyn_idx]
        Jc_nl = Jc[s_nl]
        lin_r = R0 @ u + d0
        g = 2.0 * (Jr_dyn.T @ r_dyn + R0.T @ lin_r) - mu * (
            Jc_nl.T @ d1[s_nl]
            + Jq0.T @ (d1[s_qup] - d1[s_qlo])
            + Jdq0.T @ (d1[s_dqup] - d1[s_dqlo])
            + Jphi0.T @ (d1[s_phimax] - d1[s_negphi])
            + Jdphi0.T @ d1[s_dphi]
            + (d1[s_uup] - d1[s_ulo]))
        sqw_nl = jnp.sqrt(wts[s_nl])
        s_q = jnp.sqrt(wts[s_qup] + wts[s_qlo])
        s_dq = jnp.sqrt(wts[s_dqup] + wts[s_dqlo])
        s_phi = jnp.sqrt(wts[s_phimax] + wts[s_negphi])
        sqw_dphi = jnp.sqrt(wts[s_dphi])
        s_u = jnp.sqrt(wts[s_uup] + wts[s_ulo] + reg)
        A = jnp.concatenate([
            sq2 * Jr_dyn, sq2 * R0, sqw_nl[:, None] * Jc_nl,
            s_q[:, None] * Jq0, s_dq[:, None] * Jdq0,
            s_phi[:, None] * Jphi0, sqw_dphi[:, None] * Jdphi0,
            s_u[:, None] * jnp.eye(n, dtype=dtype)], axis=0)
        b = jnp.concatenate([
            sq2 * r_dyn, sq2 * lin_r,
            -mu * d1[s_nl] / sqw_nl,
            -mu * (d1[s_qup] - d1[s_qlo]) / s_q,
            -mu * (d1[s_dqup] - d1[s_dqlo]) / s_dq,
            -mu * (d1[s_phimax] - d1[s_negphi]) / s_phi,
            -mu * d1[s_dphi] / sqw_dphi,
            -mu * (d1[s_uup] - d1[s_ulo]) / s_u])
        Qa, Ra = jnp.linalg.qr(A)
        du = -jax.scipy.linalg.solve_triangular(Ra, Qa.T @ b, lower=False)

        m0 = float(jnp.sum(r * r) + mu * jnp.sum(_barrier(z, scfg.delta)))
        slope = float(jnp.dot(g, du))
        cand = []
        for a in np.asarray(ls_alphas):
            rr, cc = rc_j(u + float(a) * du)
            cand.append(float(jnp.sum(rr * rr)
                              + mu * jnp.sum(_barrier(-cc, scfg.delta))))
        cand = np.asarray(cand)
        ok = cand <= m0 + scfg.armijo * np.asarray(ls_alphas) * slope
        ok &= np.isfinite(cand)
        if ok.any():
            idx = int(np.argmax(ok))
            improved = True
        else:
            idx = int(np.argmin(np.where(np.isfinite(cand), cand, np.inf)))
            improved = bool(cand[idx] < m0)
        alpha = float(ls_alphas[idx]) if improved else 0.0
        sviol = float(jnp.sum(jnp.where(c > 1e-6, c, 0.0)))
        uviol = float(unscaled_viol(u))
        print(f"it {k:2d}: mu={mu:7.1e} reg={reg:7.1e} m0={m0:12.6e} "
              f"|du|={float(jnp.max(jnp.abs(du))):8.2e} slope={slope:9.2e} "
              f"alpha={alpha:5.3f} dm={m0 - cand[idx]:10.3e} "
              f"sviol={sviol:8.2e} uviol={uviol:8.2e}", flush=True)
        if improved:
            u = u + alpha * du
        if improved and alpha >= 0.3:
            reg = max(reg * scfg.reg_shrink, scfg.reg)
        elif (improved and alpha < 0.05) or not improved:
            reg = min(reg * scfg.reg_grow, scfg.reg_max)
        if improved:
            mu = max(mu * scfg.mu_decay, scfg.mu_min)
    print(f"final unscaled viol: {float(unscaled_viol(u)):.3e}")


if __name__ == "__main__":
    main()
