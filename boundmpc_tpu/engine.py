"""Receding-horizon MPC engine: one jittable, batchable `tick`.

Reference semantics: ``bound_mpc/bound_mpc/BoundMPC/BoundMPC.py`` (stateful
controller: warm starts, error-bound fitting, rotation-reference integration,
infeasible-solve fallback, post-solve state advance) together with the plant
update of ``nodes/bound_mpc_node.py:292-372`` (plant == model: the "robot" is
the same exact triple integrator + FK chain, util_functions.py:152-161).

TPU-first re-design:
  * The entire §3.2 tick pipeline of the reference — window gather, initial
    rotation errors, projection vectors, quartic bound fitting, solve,
    fallback, state advance — is ONE pure function `tick(state, ...)`, fully
    jit-compiled and `vmap`-able over scenarios.  No host round-trips.
  * The reference's warm-start surgery (BoundMPC.py:316-375) reduces to a
    one-stage shift of the jerk-knot plan: with the condensed formulation the
    state trajectory is implied by (x0, u), so the integrated-omega flip fix
    and the post-replan re-projection of per-stage phi states disappear.
  * The infeasible-solve fallback (BoundMPC.py:460-506) becomes a
    `lax.select` on the per-scenario success mask: on failure the previous
    plan (already shifted) is replayed, consuming one horizon stage per
    failure exactly like the reference's `error_count` slicing; after N
    consecutive failures the scenario is flagged dead.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import jerkint, kinematics, lie, ocp, solver as solver_mod
from .bounds import segment_bound_coeffs
from .path import PathData, Window, advance_sector, locate_sector, window


class EngineState(NamedTuple):
    """Per-scenario carried state (pytree; batch by stacking leaves)."""

    # Plant state (plant == model, bound_mpc_node.py:321-331)
    q: jnp.ndarray  # (7,)
    dq: jnp.ndarray  # (7,)
    ddq: jnp.ndarray  # (7,)
    jerk: jnp.ndarray  # (7,) previous joint jerk knot (node self.jerk)
    # Path-parameter state (BoundMPC.py:98-103)
    phi: jnp.ndarray  # ()
    dphi: jnp.ndarray  # ()
    ddphi: jnp.ndarray  # ()
    dddphi: jnp.ndarray  # ()
    # Rotation reference integration (BoundMPC.py:81-83)
    pr_ref: jnp.ndarray  # (3,)
    iw_ref: jnp.ndarray  # (3,)
    # Window position
    sector: jnp.ndarray  # () int32
    # Warm start (solver initial guess) and safe fallback plan.  These are
    # distinct roles: u_warm chains from the freshest sane solve (even a
    # gate-failing near-feasible one) so recovery compounds across ticks,
    # while u_safe only ever holds gated-successful plans and is what a
    # failing tick EXECUTES (the reference's prev_solution, BoundMPC.py:467-496).
    u_warm: jnp.ndarray  # (N, 8) solver initial guess
    u_safe: jnp.ndarray  # (N, 8) shifted last accepted plan
    has_prev: jnp.ndarray  # () bool
    error_count: jnp.ndarray  # () int32
    dead: jnp.ndarray  # () bool — N consecutive failures (BoundMPC.py:498)
    # Warm-started Levenberg damping: the final LM reg of the previous
    # tick's solve.  Resetting reg to its floor every tick forced hard
    # ticks to re-climb it through ~7 rejected line searches before the
    # first accepted step (measured, experiments/trace_solve.py); carrying
    # it across ticks is the damping analog of the u_warm shift —
    # the trust-region radius is as much a part of the warm start as the
    # iterate itself.
    reg_warm: jnp.ndarray  # ()
    # Previous tick's total violation (recovery-progress detector for the
    # failure ladder; see postsolve).  NOTE: keep this the LAST field —
    # state dumps are stored as ordered leaves and old dumps are re-loaded
    # by padding missing trailing leaves (load_state_dump).
    viol_prev: jnp.ndarray  # ()


class TickOut(NamedTuple):
    traj: ocp.Trajectory  # full-horizon solution trajectory
    p0: jnp.ndarray  # (6,) measured EE pose at tick start
    success: jnp.ndarray  # () bool
    error_count: jnp.ndarray  # () int32
    stats: solver_mod.SolveStats
    params: ocp.OcpParams  # assembled tick parameters (for logging/replay)
    u: jnp.ndarray  # (N, 8) executed plan


def load_state_dump(template: EngineState, npz) -> EngineState:
    """Rebuild an EngineState batch from a ``{"s0": leaf0, ...}`` state dump
    (fleet checkpoints, soak/debug dumps).  Dumps from before a trailing
    field was added are padded with the template's value for that field —
    EngineState grows by appending fields precisely so old dumps stay
    loadable."""
    tpl_leaves = jax.tree.leaves(template)
    n_files = len([k for k in npz.files if k.startswith("s")])
    leaves = [jnp.asarray(npz[f"s{i}"]) for i in range(n_files)]
    if len(leaves) < len(tpl_leaves):
        leaves = leaves + [jnp.asarray(t) for t in tpl_leaves[len(leaves):]]
    return jax.tree.unflatten(jax.tree.structure(template), leaves)


def init_state(cfg: ocp.OcpConfig, q0: jnp.ndarray, dtype=jnp.float32) -> EngineState:
    """Initial engine/plant state at rest (node reset, bound_mpc_node.py:72-80;
    BoundMPC.__init__ :81-103)."""
    q0 = jnp.asarray(q0, dtype)
    pose0 = kinematics.fk_pose(q0)
    z7 = jnp.zeros(7, dtype)
    z = jnp.zeros((), dtype)
    # Ipopt pushes iterates strictly inside bounds (bound_push); the barrier
    # solver needs the same: a small positive phi-jerk warm start keeps the
    # phi >= 0 constraints out of the quadratic-extension region at tick 0.
    u_warm0 = jnp.zeros((cfg.N, cfg.nr_joints + 1), dtype).at[:, -1].set(0.5)
    return EngineState(
        q=q0, dq=z7, ddq=z7, jerk=z7,
        phi=z, dphi=z, ddphi=z, dddphi=z,
        pr_ref=pose0[3:], iw_ref=jnp.zeros(3, dtype),
        sector=jnp.zeros((), jnp.int32),
        u_warm=u_warm0,
        u_safe=u_warm0,
        has_prev=jnp.asarray(False),
        error_count=jnp.zeros((), jnp.int32),
        dead=jnp.asarray(False),
        reg_warm=jnp.asarray(0.0, dtype),  # 0 = "no carried damping"
        viol_prev=jnp.asarray(0.0, dtype),
    )


def replan_state(cfg: ocp.OcpConfig, state: EngineState, new_path: PathData
                 ) -> EngineState:
    """Re-anchor the engine state onto a NEW path mid-run — the reference's
    mid-run replanning (`BoundMPC.update`, :163-217, triggered by the
    Trajectory service with update=true, bound_mpc_node.py:121-165).

    phi is re-anchored by projecting the current EE position onto the new
    first segment (:198-203); dphi/ddphi/dddphi by projecting the Cartesian
    velocity/acceleration/jerk onto the new direction (:204-210); the
    rotation reference is re-integrated from the new first via (:212-217).
    The jerk-knot warm start keeps its joint columns (still a feasible
    joint-space plan) but zeroes the path-jerk column — the condensed analog
    of the reference's per-stage phi-state re-projection (BoundMPC.py:335-371).
    """
    q, dq, ddq = state.q, state.dq, state.ddq
    pose = kinematics.fk_pose(q)
    J = kinematics.jacobian(q)
    dJ = kinematics.djacobian(q, dq)
    ddJ = kinematics.ddjacobian(q, dq, ddq)
    v = J @ dq
    a = J @ ddq + dJ @ dq
    j_cart = J @ state.jerk + dJ @ ddq + ddJ @ dq

    dp0 = new_path.seg_dp[0]
    phi_new = jnp.dot(pose[:3] - new_path.seg_p0[0], dp0)
    # Clamp the projected phi into the first segment, matching the
    # reference's warm-start re-projection clamp to [0, phi_switch-0.01]
    # (BoundMPC.py:349-364).  Without it, replanning from a pose slightly
    # behind the new path start yields phi0 < 0, which violates the phi >= 0
    # constraint from the first stage and wedges the solver permanently.
    seg0_len = new_path.seg_len[0]
    phi_new = jnp.clip(phi_new, 0.0, jnp.maximum(seg0_len - 0.01, 0.0))
    # The reference projects the Cartesian velocity/acceleration/jerk onto
    # the new direction unclamped (:204-210), which makes phi >= 0 *hard
    # infeasible* for several ticks whenever the current motion opposes the
    # new path (dphi0 < 0 cannot be braked within one step under the jerk
    # box) — its own Ipopt would fail those solves.  The path parameter is a
    # virtual progress variable that must never run backward, so a
    # motion-opposing replan restarts the parameter at rest instead.
    dphi_proj = jnp.dot(v[:3], dp0)
    fwd = dphi_proj > 0.0
    dphi_new = jnp.where(fwd, dphi_proj, 0.0)
    ddphi_new = jnp.where(fwd, jnp.dot(a[:3], dp0), 0.0)
    dddphi_new = jnp.where(fwd, jnp.dot(j_cart[:3], dp0), 0.0)

    pr_ref = lie.integrate_rotation_reference(
        new_path.via_rotvec[0], new_path.seg_dr[0], jnp.zeros_like(phi_new),
        phi_new,
    )
    iw_ref = new_path.seg_iw[0] + phi_new * new_path.seg_dr[0]

    u_warm = state.u_warm.at[:, cfg.nr_joints].set(0.0)
    return state._replace(
        phi=phi_new, dphi=dphi_new, ddphi=ddphi_new, dddphi=dddphi_new,
        pr_ref=pr_ref, iw_ref=iw_ref,
        sector=jnp.zeros_like(state.sector),
        u_warm=u_warm,
        u_safe=u_warm,
        # The old-path plan is not a valid fallback on the new path: marking
        # it absent routes a failed first post-replan solve into the
        # reference's "first-ever failure: use the infeasible solution"
        # branch (BoundMPC.py:479-489), which actively brakes toward
        # feasibility instead of replaying a stale plan.
        has_prev=jnp.asarray(False),
        error_count=jnp.zeros_like(state.error_count),
        reg_warm=jnp.zeros_like(state.reg_warm),
        viol_prev=jnp.zeros_like(state.viol_prev),
    )


def _shift_plan(u: jnp.ndarray) -> jnp.ndarray:
    """Receding-horizon shift (BoundMPC.py:373-375): drop stage 0, repeat the
    terminal knot."""
    return jnp.concatenate([u[1:], u[-1:]], axis=0)


def assemble_params(cfg: ocp.OcpConfig, state: EngineState, path: PathData,
                    weights: jnp.ndarray, x_phi_d: jnp.ndarray) -> ocp.OcpParams:
    """Pre-solve parameter assembly — the jit analog of BoundMPC.step's
    host-side prep (:306-443)."""
    win: Window = window(path, state.sector, cfg.nr_segs)
    dtype = state.q.dtype

    # Measured EE pose / twist (node step, bound_mpc_node.py:301)
    pose = kinematics.fk_pose(state.q)
    J = kinematics.jacobian(state.q)
    v0 = J @ state.dq
    p0 = pose

    # Initial rotation errors per window segment (BoundMPC.py:379-385)
    dtau_all = jax.vmap(
        lambda dr, b1, b2: ocp.compute_initial_rot_errors(
            pose[3:], state.pr_ref, dr, b1, b2
        )
    )(win.dp_ref[:, 3:], win.br1, win.br2)
    dtau_init = dtau_all[0][0]  # segment 0's full error (reference :418)
    dtau_init_par, dtau_init_orth1, dtau_init_orth2 = (
        dtau_all[1], dtau_all[2], dtau_all[3],
    )

    # Orientation projection vectors (BoundMPC.py:388)
    v1, v2, v3, jac_l, jac_r = ocp.projection_vectors(
        dtau_init, dtau_init_par, dtau_init_orth1, win.br1, win.br2,
        win.dp_normed,
    )

    # Quartic bound coefficients over the window (BoundMPC.py:392-395)
    seg_len = win.phi_switch[1:] - win.phi_switch[:-1]
    acoef = segment_bound_coeffs(
        seg_len, win.asymm_lower, win.asymm_upper,
        path.s, path.e_p_min, path.e_r_min, path.e_p_max, path.e_r_max,
    )
    acoef = jnp.concatenate([acoef, acoef[-1:]], axis=0)

    # Weight adjustment (BoundMPC.py:398-403) and numerical clamps (:405-413).
    # Shared with solver.make_prefactor so the setup-time QR factorization of
    # the linear residual block sees the exact same weights.
    phi_max_global = path.phi_max - 1e-4
    weights_t = solver_mod.adjusted_weights(path.phi_max, weights, x_phi_d)
    phi_max_t = jnp.minimum(state.phi + 5.0, phi_max_global)
    x_phi_d_t = x_phi_d.at[0].set(jnp.minimum(state.phi + 5.0, x_phi_d[0]))
    qd = jnp.where(phi_max_t - state.phi < 0.05, state.q, jnp.zeros(7, dtype))

    return ocp.OcpParams(
        q0=state.q, dq0=state.dq, ddq0=state.ddq,
        phi0=state.phi, dphi0=state.dphi, ddphi0=state.ddphi,
        p0=p0, v0=v0,
        u_prev=state.jerk, uphi_prev=state.dddphi,
        iw_ref0=state.iw_ref,
        dtau_init=dtau_init,
        dtau_init_par=dtau_init_par,
        dtau_init_orth1=dtau_init_orth1,
        dtau_init_orth2=dtau_init_orth2,
        jac_dtau_l=jac_l, jac_dtau_r=jac_r,
        p_ref=win.p_ref, dp_ref=win.dp_ref, dp_normed=win.dp_normed,
        bp1=win.bp1, bp2=win.bp2, br1=win.br1, br2=win.br2,
        v1=v1, v2=v2, v3=v3,
        phi_switch=win.phi_switch,
        acoef=acoef,
        weights=weights_t,
        phi_max=phi_max_t,
        dphi_max=weights[4],  # BoundMPC.py:79 — weight slot 4 is dphi_max
        x_phi_d=x_phi_d_t,
        qd=qd,
    )


def tick(cfg: ocp.OcpConfig, scfg: solver_mod.SolverConfig,
         coeffs: jerkint.JerkCoeffs, limits: kinematics.RobotLimits,
         state: EngineState, path: PathData, weights: jnp.ndarray,
         x_phi_d: jnp.ndarray, solve_fn=None, pref=None):
    """One full control tick.  Returns (new_state, TickOut).

    ``solve_fn(params, u_warm) -> (u_opt, SolveStats)`` overrides the
    built-in solver (used by the parity oracle harness, which plugs a
    host-side scipy solve into the otherwise identical tick pipeline).

    ``pref`` (optional solver_mod.QrPrefactor) supplies the setup-time QR
    factorization of the tick-constant linear residual block — build it once
    per scenario with `solver.make_prefactor(cfg, path.phi_max, weights,
    x_phi_d)`; without it the solver factors in-tick (same numerics, one
    extra batched 320 x n QR per tick).
    """
    # TPU matmul units default to bf16 inputs; the solver's normal equations
    # and the FK chain need true f32 accumulation (trace-time context).
    with jax.default_matmul_precision("float32"):
        return _tick_impl(cfg, scfg, coeffs, limits, state, path, weights,
                          x_phi_d, solve_fn, pref)


def presolve(cfg, scfg, state, path, weights, x_phi_d, coeffs=None,
             limits=None):
    """Tick front half: window slide, parameter assembly, tiered warm-start
    policy.  Returns (state', params, mu0, reg0) — everything the solver
    needs.  Shared verbatim by `tick` and the stream executor (stream.py).
    ``coeffs``/``limits`` enable the warm-start infeasibility probe below
    (None falls back to flag-based shock detection only)."""
    # Window slide on segment crossing (ReferencePath.update :190-212,
    # called from get_parameters at the start of BoundMPC.step :310).
    # With scfg.bidir_window the window FOLLOWS the plant backward too —
    # damage-control recovery legitimately retreats phi, and a retreat
    # across a switching point must re-window or the lane evaluates stale
    # geometry forever (path.locate_sector).  On a retreat-crossing the
    # rotation reference is re-anchored exactly from the path data (the
    # closed form replan_state uses); forward crossings keep the
    # reference's incremental advance semantics (postsolve).  Without the
    # flag the window is forward-only, matching the reference exactly (the
    # f64 parity configuration).
    if scfg.bidir_window:
        sector = locate_sector(path, state.phi)
        retreated = sector < state.sector
        pr_re = lie.integrate_rotation_reference(
            path.via_rotvec[sector], path.seg_dr[sector],
            path.phi_start[sector], state.phi)
        iw_re = (path.seg_iw[sector]
                 + (state.phi - path.phi_start[sector])
                 * path.seg_dr[sector])
        crossed_window = sector != state.sector
        state = state._replace(
            sector=sector,
            pr_ref=jnp.where(retreated, pr_re, state.pr_ref),
            iw_ref=jnp.where(retreated, iw_re, state.iw_ref))
    else:
        sector = advance_sector(path, state.sector, state.phi)
        crossed_window = sector != state.sector
        state = state._replace(sector=sector)

    params = assemble_params(cfg, state, path, weights, x_phi_d)

    # Tiered mu restart (Ipopt's adaptive-mu warm-start analog):
    #   * settled warm lanes resume AT the final barrier weight
    #     (scfg.mu_warm) — the shifted previous optimum already sits on
    #     the mu_min central path, so any continuation is pure waste;
    #   * lanes whose window SLID this tick, or that are recovering from
    #     a failed solve, restart the continuation at mu_shift: the new
    #     window's constraints are typically violated by the old plan,
    #     and a brief mu walk re-balances feasibility restoration vs
    #     objective descent (measured: mu-min-only crossings drove ~1%
    #     of lanes into gate failures clustered at segment switches);
    #   * cold states (no previous plan: first tick, post-replan) start
    #     at mu_init.  NEVER restart a warm lane at mu_init — that was
    #     the round-2 divergence mechanism (a 1e-2 barrier slams a
    #     boundary-hugging iterate into the interior, the linearization
    #     breaks, and one marginal failure becomes a death spiral).
    shock = crossed_window | (state.error_count > 0)
    # Warm-start infeasibility probe (one rollout, ~1 GN iteration of
    # cost): the shock flags above miss the MID-SEGMENT re-linearization
    # jump (new projection vectors / rotation re-anchoring read the same
    # physical state a few mrad differently, r5 soak forensics) — the lane
    # then resumes at mu_warm = mu_min with a solver-infeasible warm plan
    # and walks straight into the barrier's local-minimum trap.  Measured
    # on the lane-150 fixture: the identical f32 solve recovers under the
    # mu_shift continuation and traps under mu_warm.  This is the batched
    # analog of Ipopt's adaptive mu oracle raising mu with infeasibility
    # (reference options BoundMPC.py:120-148, mu_oracle: loqo).
    if scfg.warm_probe and coeffs is not None and limits is not None:
        ev_w = ocp.evaluate_stages(cfg, coeffs, params, state.u_warm)
        c_w = ocp.full_constraints(cfg, params, ev_w, state.u_warm, limits,
                                   scaled=scfg.scale_constraints,
                                   margin=scfg.margin)
        warm_viol = jnp.sum(jnp.where(c_w > 1e-6, c_w, 0.0))
        shock = shock | (warm_viol > scfg.probe_viol)
    # Deep-failure COLD RESTART (the bench-postmortem death-spiral fix): two
    # consecutive failures mean the warm CHAIN is poisoned — the fresh
    # solves diverged, so every further mu_shift restart re-solves from
    # inside the same broken basin and the lane death-spirals to viol ~1e3
    # (bench r4 postmortem, lane 250: 0.089 -> 0.27 -> 1.1 -> ... -> dead).
    # EXACTLY at the second failure, discard the chain: re-seed the solver
    # from the last GATED safe plan (u_safe — two shifts stale but on the
    # solution manifold), under the ordinary mu_shift shock continuation.
    # Fires once per failure streak (== not >=): if the reset shot itself
    # fails, the ordinary warm-chain policy resumes from its iterate.
    # Two rejected alternatives, both measured WORSE on the hard region
    # (experiments/prof_stream.py --start-ticks 60 A/B): re-seeding every
    # tick while error_count >= 2 re-diverges mid-recovery lanes (success
    # 0.995 -> 0.987), and walking mu from mu_init slams the
    # boundary-hugging safe plan into the interior (the round-2 divergence
    # mechanism, see the mu-tier comment above).  Reference analog: Ipopt
    # is warm-start-independent enough to recover from any iterate; our
    # warm-chained GN needs the explicit basin reset.
    deep = state.has_prev & (state.error_count == 2)
    state = state._replace(
        u_warm=jnp.where(deep, state.u_safe, state.u_warm))
    mu0 = jnp.where(state.has_prev,
                    jnp.where(shock, scfg.mu_shift, scfg.mu_warm),
                    scfg.mu_init)
    # Warm-started LM damping (EngineState.reg_warm): resume near the
    # previous solve's final damping instead of re-climbing from the
    # floor through rejected line searches.  Resume RELAXED (x0.1,
    # capped at 1e-2): an under-damped start regrows 10x per rejected
    # step (cheap), while an over-damped start must shrink 3x per
    # accepted step and stalls the whole solve (measured: carrying the
    # raw reg_final of shock ticks made post-replan recovery oscillate
    # success/fail).
    # Shock ticks (window slide / failure recovery) start from the
    # static floor: the event invalidated the old trust region, and the
    # recovery path is tuned around the mu_shift continuation.
    carry = (state.has_prev & (state.reg_warm > 0) & ~shock
             if scfg.carry_reg else jnp.asarray(False))
    reg0 = jnp.where(carry,
                     jnp.clip(0.1 * state.reg_warm, scfg.reg, 1e-2),
                     scfg.reg)
    return state, params, mu0, reg0


def _tick_impl(cfg, scfg, coeffs, limits, state, path, weights, x_phi_d,
               solve_fn, pref):
    state, params, mu0, reg0 = presolve(cfg, scfg, state, path, weights,
                                        x_phi_d, coeffs=coeffs,
                                        limits=limits)
    if solve_fn is None:
        u_opt, stats = solver_mod.solve(cfg, scfg, coeffs, params,
                                        state.u_warm, limits, mu0=mu0,
                                        pref=pref, reg0=reg0)
    else:
        u_opt, stats = solve_fn(params, state.u_warm)
    return postsolve(cfg, scfg, coeffs, state, path, params, u_opt, stats,
                     limits=limits)


def postsolve(cfg, scfg, coeffs, state, path, params, u_opt, stats,
              limits=None):
    """Tick back half: success gate, fallback selection, plant/controller
    state advance, dead-lane freeze.  ``state`` is the presolve'd state
    (sector already advanced).  Shared verbatim by `tick` and the stream
    executor (stream.py).  ``limits`` enables the fresh-vs-stale violation
    comparison below (None falls back to the threshold-only gate)."""
    # Two-clause success criterion, mirroring the reference's
    # "Ipopt-success OR total violation < 1e-4" (BoundMPC.py:460-465).
    # The solver's `converged` flag alone is only a small-step test and must
    # not be trusted on its own (a stuck infeasible iterate with viol ~ 1e3
    # once diverged the closed loop that way); it counts only when the
    # iterate is also near-feasible — the analog of Ipopt declaring success
    # at its own constraint tolerance.
    success = (stats.viol < 1e-4) | (stats.converged & (stats.viol < 1e-3))

    # Fallback logic (BoundMPC.py:467-496): on failure EXECUTE the previous
    # accepted (already shifted) safe plan; with no previous plan accept the
    # infeasible solution ("first-ever failure" branch).  NEAR-FEASIBLE
    # failing solves (viol < viol_exec) also execute their FRESH plan — the
    # Ipopt acceptable-level analog; see SolverConfig.viol_exec for why
    # replaying stale plans on marginal misses is a death spiral.  They
    # still count as failures (error_count) and never enter u_safe.
    #
    # Beyond the fixed threshold, the fresh plan also executes whenever it
    # violates LESS than the safe fallback evaluated under TODAY's
    # parameters (one extra rollout — ~1 GN iteration of cost).  The
    # reference replays the stale plan blindly because Ipopt's failed
    # iterate may be garbage; our failed iterate is the restoration phase's
    # LEAST-VIOLATING point (SolverConfig.rho_restore), so when the shifted
    # stale plan is measurably worse, replaying it is strictly harmful —
    # that exact choice fed the r5 deep-region spirals (fresh viol 3.1e-2
    # just missing the 3e-2 gate while the stale plan sat at viol >> 1).
    acceptable = stats.viol < scfg.viol_exec
    if scfg.exec_compare and limits is not None:
        ev_safe = ocp.evaluate_stages(cfg, coeffs, params, state.u_safe)
        c_safe = ocp.full_constraints(cfg, params, ev_safe, state.u_safe,
                                      limits)
        viol_safe = jnp.sum(jnp.where(c_safe > 1e-6, c_safe, 0.0))
        # The comparison is capped at O(1) violation: a "less-violating"
        # plan at viol 50+ still actively steers the plant into divergence
        # (measured, r5 soak lane 62: viol-compared fresh plans at 50-300
        # drove the spiral the fallback's bounded badness + dead-freeze
        # would have contained).  Past the cap the lane executes the stale
        # plan and, failing that, freezes — the reference's own endgame
        # (BoundMPC.py:498-506).
        acceptable = acceptable | ((stats.viol <= viol_safe)
                                   & (stats.viol < 1.0))
    use_opt = success | (~state.has_prev) | acceptable
    u_used = jnp.where(use_opt, u_opt, state.u_safe)
    # Failure ladder with a RECOVERY-PROGRESS hold: the counter increments
    # on failing ticks UNLESS the violation dropped substantially (< 1/2 of
    # the previous tick's) — a lane in active damage-control (restoration
    # plans crash the violation over ~5-10 ticks, r5 fixture traces) must
    # not be killed mid-recovery.  Diverging or plateaued lanes still die
    # after N non-improving failures, which is what the dead-freeze is FOR
    # (the reference's N-consecutive-failures stop, BoundMPC.py:498-506,
    # guards a single robot; the vectorized analog guards fleet metrics
    # from divergence, not from recovery).
    improving = ((stats.viol < 0.5 * state.viol_prev)
                 if scfg.ladder_hold else jnp.asarray(False))
    error_count = jnp.where(
        success, 0,
        jnp.where(improving, state.error_count, state.error_count + 1))
    error_count = jnp.where(success | state.has_prev, error_count, 0)
    dead = state.dead | (error_count >= cfg.N)

    # Warm-start policy: the NEXT tick's solver guess chains from the fresh
    # solve whenever it is sane (near-feasible), even when it failed the
    # execution gate — recovery from a replan shock then compounds across
    # ticks instead of restarting from the ever-staler shifted fallback.
    # The EXECUTED fallback stays u_safe: gate-failing plans are never
    # executed (the round-1 bug that chained them through u_warm drove the
    # plant along infeasible plans).
    u_warm_next = jnp.where(use_opt | (stats.viol < 1.0), u_opt, u_used)
    # u_safe holds GATED plans only — acceptable-executing failures must not
    # contaminate the safe fallback.
    u_safe_next = jnp.where(success | (~state.has_prev), u_opt, state.u_safe)

    # The executed trajectory is exact by construction — no post-solve
    # re-integration needed (reference must re-integrate, BoundMPC.py:526-555).
    traj = ocp.rollout(cfg, coeffs, params, u_used)

    # Rotation-reference advance across a possible segment switch
    # (BoundMPC.py:592-604)
    phi1 = traj.phi[0]
    win_switch1 = params.phi_switch[1]
    crossed = phi1 > win_switch1
    pr_new_anchor = path.via_rotvec[state.sector + 1]
    pr_crossed = lie.integrate_rotation_reference(
        pr_new_anchor, params.dp_ref[1, 3:], win_switch1, phi1
    )
    pr_stay = lie.integrate_rotation_reference(
        state.pr_ref, params.dp_ref[0, 3:], state.phi, phi1
    )
    pr_ref_new = jnp.where(crossed, pr_crossed, pr_stay)
    iw_crossed = params.p_ref[1, 3:] + (phi1 - win_switch1) * params.dp_ref[1, 3:]
    iw_stay = params.p_ref[0, 3:] + (phi1 - params.phi_switch[0]) * params.dp_ref[0, 3:]
    iw_ref_new = jnp.where(crossed, iw_crossed, iw_stay)

    # Plant + controller state advance: stage-1 states of the executed plan
    # (bound_mpc_node.py:321-336, BoundMPC.py:606-611)
    new_state = EngineState(
        q=traj.q[0], dq=traj.dq[0], ddq=traj.ddq[0],
        jerk=u_used[0, : cfg.nr_joints],
        phi=traj.phi[0], dphi=traj.dphi[0], ddphi=traj.ddphi[0],
        dddphi=u_used[0, cfg.nr_joints],
        pr_ref=pr_ref_new, iw_ref=iw_ref_new,
        sector=state.sector,
        u_warm=_shift_plan(u_warm_next),
        u_safe=_shift_plan(u_safe_next),
        has_prev=jnp.asarray(True),
        error_count=error_count,
        dead=dead,
        reg_warm=(stats.reg_final if stats.reg_final is not None
                  else jnp.zeros_like(state.reg_warm)),
        viol_prev=stats.viol.astype(state.viol_prev.dtype),
    )
    # A dead scenario is STOPPED: the reference returns Nones after N
    # consecutive failures and the node halts the robot
    # (BoundMPC.py:498-506, bound_mpc_node.py:306-307).  The vectorized
    # analog freezes the whole carried state — without this a dead lane
    # keeps replaying its exhausted stale plan and its violation diverges,
    # poisoning fleet metrics.
    was_dead = state.dead
    new_state = jax.tree.map(
        lambda old, new: jnp.where(was_dead, old, new), state, new_state)
    out = TickOut(
        traj=traj, p0=params.p0, success=success & ~was_dead,
        error_count=error_count, stats=stats, params=params, u=u_used,
    )
    return new_state, out
