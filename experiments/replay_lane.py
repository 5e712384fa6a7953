"""Replay one fleet lane from a dumped batch state, bisecting precision.

Loads the EngineState batch saved by `debug_f32.py --dump T`, extracts one
lane, and re-runs that lane's tick(s):
  * f32 end-to-end (reproduce the production failure),
  * f64 end-to-end (is the NLP solvable at all from this state?),
  * f64 parameter assembly -> f32 solve (is the failure born in the
    rotation-heavy parameter assembly or in the solver?).

Usage:
  python experiments/replay_lane.py --lane 59 --state /tmp/state_t36.npz \
      [--B 256] [--ticks 4] [--platform cpu]
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
    ap.add_argument("--ticks", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from functools import partial
    from boundmpc_tpu import batch, engine, jerkint, kinematics, ocp, \
        solver as solver_mod
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32

    # Rebuild the fleet inputs and graft the dumped state in.
    states0, paths, weights, x_phi_d = _build_batch(args.B, cfg)
    states = engine.load_state_dump(states0, np.load(args.state))

    take = lambda tree: jax.tree.map(lambda a: np.asarray(a)[args.lane], tree)
    st_l = take(states)
    path_l = take(paths)
    w_l = np.asarray(weights)[args.lane]
    x_l = np.asarray(x_phi_d)[args.lane]
    print(f"lane {args.lane}: phi={float(st_l.phi):.4f} "
          f"dphi={float(st_l.dphi):.4f} sector={int(st_l.sector)} "
          f"error_count={int(st_l.error_count)} dead={bool(st_l.dead)}")

    def run(tag, dtype, params64=False):
        cast = lambda tree: jax.tree.map(
            lambda a: jnp.asarray(a, dtype)
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else jnp.asarray(a), tree)
        st = cast(st_l)
        pth = cast(path_l)
        w = jnp.asarray(w_l, dtype)
        x = jnp.asarray(x_l, dtype)
        coeffs = jerkint.coeff_matrices(cfg.N, cfg.dt, dtype=dtype)
        limits = jax.tree.map(
            lambda a: jnp.asarray(a, dtype) if isinstance(a, jnp.ndarray)
            else a, kinematics.robot_limits())

        if params64:
            # f64 parameter assembly feeding an f32 solve.
            cast64 = lambda tree: jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float64)
                if np.issubdtype(np.asarray(a).dtype, np.floating)
                else jnp.asarray(a), tree)
            st64, pth64 = cast64(st_l), cast64(path_l)

            def solve_fn_factory(st_now):
                def solve_fn(params_unused, u_warm):
                    sec = engine.advance_sector(pth64, st_now.sector,
                                                jnp.float64(st_now.phi))
                    p64 = engine.assemble_params(
                        cfg, st_now._replace(sector=sec), pth64,
                        jnp.asarray(w_l, jnp.float64),
                        jnp.asarray(x_l, jnp.float64))
                    p32 = jax.tree.map(
                        lambda a: jnp.asarray(a, dtype)
                        if jnp.issubdtype(a.dtype, jnp.floating) else a, p64)
                    mu0 = jnp.asarray(scfg.mu_shift, dtype)
                    return solver_mod.solve(cfg, scfg, coeffs, p32,
                                            u_warm, limits, mu0=mu0)
                return solve_fn

        tick = jax.jit(partial(engine.tick, cfg, scfg, coeffs, limits))
        out_hist = []
        for t in range(args.ticks):
            if params64:
                st64_now = jax.tree.map(
                    lambda a: jnp.asarray(a, jnp.float64)
                    if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                    else a, st)
                st, out = engine.tick(cfg, scfg, coeffs, limits, st, pth,
                                      w, x, solve_fn=solve_fn_factory(st64_now))
            else:
                st, out = tick(st, pth, w, x)
            jax.block_until_ready(st.phi)
            out_hist.append((bool(out.success), float(out.stats.viol),
                             int(out.stats.iters), float(st.phi)))
            print(f"  [{tag}] tick {t}: success {out_hist[-1][0]} "
                  f"viol {out_hist[-1][1]:.3e} iters {out_hist[-1][2]} "
                  f"phi {out_hist[-1][3]:.4f}", flush=True)
        return out_hist

    run("f32", jnp.float32)
    run("f64", jnp.float64)
    run("p64/s32", jnp.float32, params64=True)


if __name__ == "__main__":
    main()
