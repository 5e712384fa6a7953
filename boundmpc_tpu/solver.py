"""Batched relaxed-barrier Gauss-Newton solver for the condensed OCP.

TPU-native replacement for the reference's Ipopt/CasADi stack
(`BoundMPC.py:120-161`, `casadi_ocp_formulation.py:389`): instead of a
sparse 440-var interior-point solve on the host, each scenario is a dense
80-var Gauss-Newton iteration with a relaxed logarithmic barrier for the
~520 inequalities.  Everything — Jacobians (one `jacfwd` sweep), the dense
KKT solve (Cholesky-factorable 80x80), and a *parallel* Armijo line search
that evaluates all step candidates at once — is jit-compiled XLA; scenarios
batch with `vmap` so the KKT factorizations become batched MXU work.

The relaxed barrier (quadratic extension below ``delta``) is smooth on all
of R, so warm-started iterates may pass through infeasible points without
NaNs — the batched analog of Ipopt's filter line search tolerance to
infeasible intermediate iterates.  As mu -> 0 its minimizers approach the
NLP's KKT points; the engine declares success using the reference's own
criterion (total constraint violation < 1e-4, `BoundMPC.py:460-465`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import jerkint, kinematics, ocp


class SolverConfig(NamedTuple):
    """Static solver settings."""

    max_iters: int = 40
    mu_init: float = 1e-2
    mu_min: float = 1e-6
    mu_decay: float = 0.4
    delta: float = 1e-7  # barrier relaxation threshold
    reg: float = 1e-7  # minimum Levenberg damping of the GN Hessian
    # Adaptive Levenberg-Marquardt damping.  Deep infeasibility (e.g. right
    # after a replan) turns the relaxed barrier into a ~mu/delta^2-weighted
    # quadratic penalty whose exact Newton step is far outside the constraint
    # linearization's validity ball — a fixed-reg solver then crawls at
    # alpha ~ 0.01 per backtracked step (measured: ~2%/iter violation
    # reduction in f64).  Carrying the damping in the loop state and adapting
    # it from line-search outcomes auto-scales the step to the trusted ball,
    # the same role Ipopt's filter + inertia correction play (BoundMPC.py
    # options :120-148).
    reg_max: float = 1e6
    reg_grow: float = 10.0
    reg_shrink: float = 1.0 / 3.0
    n_ls: int = 14  # line-search candidates alpha = 0.7^k
    ls_decay: float = 0.7
    armijo: float = 1e-4
    tol_step: float = 1e-8  # convergence: max |du|
    # Stagnation-based convergence (the reachable f32 criterion).  The
    # condensed objective has a nearly-flat subspace (jerk-knot weight 1e-4),
    # so near the optimum the damped Newton step du stays O(1) while the
    # merit improves by < 1e-6 relative — a pure |du| tolerance never fires
    # in float32 (measured: conv ~0.1 at tol 1e-5, every tick burning all 40
    # iterations).  Instead a lane is converged once, AT the final barrier
    # weight and FEASIBLE, the merit has stagnated for ``stall_iters``
    # consecutive iterations (relative decrease < tol_merit, or no improving
    # line-search candidate at all — the f32 noise floor).
    # Relative merit decrease that counts as progress.  3e-5 (above the f32
    # merit noise floor) was tried to cut stall-counter resets from noise-
    # positive "improvements"; it saved no wall time (a different lane then
    # sets the lockstep iteration count) and cost ~2.5e-3 of fleet success —
    # the late micro-steps it skipped were real refinement.  Keep tight.
    tol_merit: float = 1e-6
    # In-loop feasibility gate for the stagnation exit: sum of violations of
    # the constraints AS SEEN BY THE LOOP (i.e. scaled rows when
    # scale_constraints is on).  Row scales are max(bound^2, 1e-2) <= ~1
    # (the widest asymmetric bound rectangles reach 1.0,
    # experiment2_runner.py:75-89), so sum(viol_unscaled) <=
    # max_bound^2 * sum(viol_scaled) ~= sum(viol_scaled): a scaled gate of
    # 1e-4 matches the reference's unscaled 1e-4 success criterion
    # (BoundMPC.py:465).  The previous 3e-5 gate was BELOW the scaled noise
    # floor of feasible iterates: perfectly feasible lanes (unscaled viol
    # exactly 0) flicker at scaled ~2-5e-5 from active constraints on
    # small-bound rows, and burned the whole iteration budget with the
    # stagnation exit blocked (measured, experiments/trace_solve.py).
    tol_feas: float = 1e-4
    stall_iters: int = 0  # 0 disables (float64 parity runs stay strict)
    # KKT step method:
    #   "qr"       — stacked weighted least squares via Householder QR with
    #                EXACT row reduction (see the block comment in solve()):
    #                the iteration-constant affine residual rows pre-factor
    #                once per solve into an n x n triangular block, and
    #                upper/lower box-constraint pairs merge into single rows
    #                — m drops from ~1100 to ~550 with bit-level-identical
    #                normal equations.  The barrier curvature spans ~1e12 in
    #                weight, so those normal equations have condition
    #                ~1e11-1e13 — far beyond float32 Cholesky; QR sees only
    #                the SQUARE ROOT of that, which is what makes an exact
    #                Newton step computable in float32 on TPU.  (Gram-based
    #                reductions were tried and measured DIVERGENT in f32:
    #                the formed Gram matrix goes indefinite at kappa ~ 2e9.)
    #                Production path; lowers to the Pallas TSQR kernel on
    #                TPU.
    #   "qr_full"  — the same step without row reduction (reference
    #                implementation the reduced stack is tested against).
    # (A third "woodbury" method — capped-weight Cholesky + rank-k active-set
    # correction — was measured DIVERGENT in f32 on-chip at k_active 40 and
    # 128 and is retired from the production solver; the implementation
    # survives as a study in experiments/debug_solve.py.)
    method: str = "qr"
    # Barrier weight for warm-started receding-horizon re-solves (the mu
    # continuation restart).  A cold solve must walk mu down from mu_init;
    # a warm tick starts from the shifted previous optimum, which already
    # sits on the central path at small mu — restarting at mu_init would
    # pull it back into the interior and waste ~half the iterations.  This
    # mirrors Ipopt's warm_start_init_point + small mu_init recipe
    # (reference options BoundMPC.py:120-148).
    mu_warm: float = 1e-4
    # Barrier restart for warm lanes hit by a SHOCK (window slide on a
    # segment crossing, or recovery from a failed solve): a brief mu
    # continuation from here re-balances feasibility restoration against
    # objective descent (see engine._tick_impl's tiered mu policy).
    mu_shift: float = 1e-4
    # Execution gate for NEAR-FEASIBLE failing solves (engine fallback
    # policy): a solve that misses the success gate but has total violation
    # below this executes its FRESH plan instead of the shifted stale
    # fallback.  Replaying stale plans for marginal (1e-4-ish) misses was
    # the measured death mechanism: each stale shift drives the plant
    # further off the solution manifold until the NLP is genuinely
    # infeasible in ANY precision (verified: an f64 resolve from such a
    # state dies identically).  Ipopt's acceptable-level heuristics
    # (acceptable_constr_viol_tol = 1e-2 by default) play the same role for
    # the reference.  Failures still count toward error_count/dead.
    viol_exec: float = 3e-2
    # Jacobian computation: "structured" (per-stage jacfwd + constant-map
    # assembly, ~3x less AD and a far simpler XLA program) or "ad" (full
    # 80-tangent jacfwd — the reference implementation the structured path
    # is tested against).
    jac: str = "structured"
    # Carry the final LM damping across warm non-shock ticks
    # (EngineState.reg_warm): without it, hard ticks re-climb the damping
    # from the floor through ~7 rejected line searches before the first
    # accepted step (measured, experiments/trace_solve.py).  Off by default
    # so the float64 parity path keeps its bit-reproducible per-tick
    # semantics; on in RUNTIME_F32 where iteration count is wall-clock.
    carry_reg: bool = False
    # Normalize the squared bound constraints by bound^2 inside the barrier
    # (homogeneous rows — essential for float32 corridor scenarios).  Off by
    # default: the amplified rows strengthen the barrier's interior bias,
    # which costs a few 1e-3 of objective parity vs the exact NLP optimum.
    scale_constraints: bool = False
    # Solver-view constraint TIGHTENING of the ORIENTATION bounds
    # (tangential + rot-orth; position rows stay exact — see
    # ocp.nonlin_constraints): the solve sees bound*(1-margin) while success
    # is judged against the true bounds.  The deep-region death mechanism
    # (r5 soak forensics, lane 129 t102): plans ride the orientation bound
    # with zero clearance, the next tick's RE-LINEARIZATION (new projection
    # vectors / rotation re-anchoring) reads the same state ~2-10 mrad over
    # the bound at the quartic dip, stage 0 becomes hard-infeasible (no
    # control authority at x0), and the GN traps at viol ~2e-2 in ANY
    # precision (an Ipopt would need its restoration phase here).  A 5%
    # margin (13 mrad clearance at the 15-degree dip) absorbs the jump so
    # the infeasible episode never starts.  0 = parity-exact (default).
    margin: float = 0.0
    # FEASIBILITY-RESTORATION MODE — the batched analog of Ipopt's
    # restoration phase (the reference capability the plain barrier GN
    # lacked; Ipopt options BoundMPC.py:120-148).  Mechanism of the trap it
    # breaks (measured iterate-by-iterate, experiments/trace_solve.py, lane
    # 129 t102): from a shock-infeasible warm start the merit
    # sum(r^2) + mu*sum(beta) develops a LOCAL MINIMUM at viol ~2e-2 —
    # reducing violation further costs more objective than the barrier
    # saves — and the solve plateaus there for the whole budget in ANY
    # precision.  When the iteration stagnates while infeasible
    # (restore_patience consecutive stagnant-infeasible iterations at final
    # mu), the lane's residual rows are RE-WEIGHTED by rho_restore << 1 in
    # the same QR stack and line-search merit: the step direction becomes
    # (almost) pure violation minimization, immune to the trap.  Once
    # feasible, rho snaps back to 1 and barrier optimization resumes with
    # the remaining budget.  A lane whose restoration itself stagnates
    # (genuinely infeasible stage 0) exits early with its least-violating
    # iterate instead of burning the full budget.  rho_restore = 0 disables
    # (parity default: the f64 oracle-parity path keeps single-phase
    # semantics).
    rho_restore: float = 0.0
    restore_patience: int = 8
    # Progress-gated soft budget (0 disables).  Past ``soft_iters``
    # iterations, an INFEASIBLE barrier-mode lane keeps iterating only
    # while its violation is improving (>2% decrease resets the streak);
    # 6 consecutive non-improving iterations end the solve with the
    # current iterate.  Rationale: raising max_iters to 256 fixed the
    # starved hard ticks (worst soak violation 3.4 -> 0.086) but let
    # PLATEAUED lanes — whose solve converges at no budget — burn the full
    # cap every tick, and the fused stream loop runs as long as its
    # slowest lane: measured 4.6x wall-time regression at B=512.  A
    # genuinely-progressing hard tick (the measured 46-120-iteration
    # shocks cut viol >2%/iteration) is never interrupted; a plateau
    # exits by ~soft_iters+6 — the watchdog role of Ipopt's
    # max-iteration heuristics.
    soft_iters: int = 0
    # Restoration engages only for DEEP infeasibility (scaled viol above
    # this), not for margin-buffer erosion: a lane riding the margined
    # orientation bound flickers margined-infeasible at sviol ~1e-4..1e-3
    # while being perfectly fine on the true bounds, and interrupting its
    # objective optimization with a restoration detour measurably DEGRADED
    # the executed plan (experiment1 tick-13 canary, true viol 9.7e-3).
    # The measured barrier traps sit at sviol ~3e-2.
    restore_trigger_viol: float = 1e-2
    # Warm-start infeasibility probe (engine.presolve): evaluate the warm
    # plan's constraints under the NEW tick's parameters and give
    # solver-infeasible warm starts the mu_shift shock continuation even
    # when no window slide / failure flag fired (the mid-segment
    # re-linearization jump case).  See the presolve comment.
    warm_probe: bool = False
    # Probe trigger (margined scaled units): below it the lane keeps the
    # cheap mu_warm resume.  Margin-buffer flicker of bound-riding shifted
    # plans reads ~1e-3..1e-2, and shocking those onto the full mu walk
    # (~11 accepted iterations) for no correctness gain was a measured
    # ~25% mean-iteration inflation; genuine re-linearization jumps read
    # 1e-1+.
    probe_viol: float = 1e-2
    # Fresh-vs-stale execution comparison (engine.postsolve): a failing
    # solve's plan executes when it violates no more than the safe fallback
    # evaluated under today's parameters.  See the postsolve comment.
    exec_compare: bool = False
    # Recovery-progress hold on the failure ladder (engine.postsolve): a
    # failing tick whose violation dropped below half the previous tick's
    # does not increment the death counter.  Off by default — the reference
    # increments on EVERY failure (BoundMPC.py:467-496) and the f64 parity
    # path keeps those semantics (enabling it measurably shifts exp2's
    # corridor fallback sequencing by ~1 mm); on in RUNTIME_F32 where
    # multi-tick damage-control recovery must outlive the ladder.
    ladder_hold: bool = False
    # Direction-free segment windowing (engine.presolve /
    # path.locate_sector): the window follows the plant BACKWARD across
    # switching points during damage-control retreat, with exact rotation-
    # reference re-anchoring.  Off by default — the reference's window only
    # slides forward (ReferencePath.update :190-212) and the f64 parity
    # path keeps those semantics; on in RUNTIME_F32 where a retreating lane
    # evaluating a stale forward window wedged into permanent failure
    # (r5 soak, lane 62).
    bidir_window: bool = False


# Preset for the float32 TPU runtime path.  method="qr" is the only step
# method measured convergent on-chip in closed loop (experiments/debug_f32.py:
# B=16 and B=256, success 1.0, viol <= 1e-4); scale_constraints homogenizes
# the squared bound rows so the f32 barrier stays conditioned in corridor
# scenarios.  max_iters=256: the reference Ipopt budget is 500 with a ~40
# typical scale (BoundMPC.py:131, Plotter.py:442); 40 was the r2-r4 budget —
# but deep-region shock ticks need 46-120+ iterations (r4 diagnosis,
# confirmed by the r5 soaks: every failure streak starts with iters pinned
# at the cap), and under the stream executor extra iterations cost only the
# straggler lane's own time.  Measured on the 120-tick B=256 soak: 256 vs
# 128 cuts the worst live-lane violation 3.4 -> 0.086 for ~30% wall.
# The while_loop exits early once every scenario in the batch converges
# (mean warm tick: ~3-9 iterations).
# jac="ad" (one fused 80-tangent jacfwd) and the shorter 8-candidate line
# search each save ~3 ms/iteration at B=256 on-chip with no success change
# (the LM damping pre-scales steps, so deep backtracking is rarely needed).
# margin=0.05 tightens the solver-view nonlinear bounds 5% so executed
# plans keep clearance absorbing the per-tick re-linearization jump — the
# measured deep-region death mechanism (see SolverConfig.margin).
RUNTIME_F32 = SolverConfig(max_iters=256, delta=1e-7, reg=1e-6,
                           tol_step=1e-5,
                           scale_constraints=True, method="qr", jac="ad",
                           n_ls=8, stall_iters=2, margin=0.05,
                           # Restoration OFF in the fleet preset: measured
                           # head-to-head on the 120-tick B=256 from-rest
                           # soak, rho_restore=1e-3 gave 0.99642 success
                           # with 1 dead lane (its restoration solves drove
                           # a divergence plain damage-control contains)
                           # vs 0.99684 / 0 dead without.  Restoration
                           # remains the recovery mechanism for externally-
                           # inherited trapped states (RESTORE_F32,
                           # tests/test_deep_region.py).
                           rho_restore=0.0, warm_probe=True,
                           exec_compare=True, soft_iters=64,
                           ladder_hold=True, bidir_window=True,
                           # Warm ticks resume AT the final barrier weight:
                           # the previous optimum already sits on the mu_min
                           # central path, so walking 1e-4 -> 1e-6 again
                           # (5 accepted steps) is pure waste; combined with
                           # the stagnation exit this is what lets warm lanes
                           # converge in ~3 iterations instead of 40.
                           mu_warm=1e-6)


# RUNTIME_F32 with the two-phase feasibility-restoration mode enabled: the
# config for re-starting fleets from EXTERNALLY INHERITED states (foreign
# checkpoints, mid-episode captures) — restoration resurrects barrier-trapped
# lanes that plain damage-control cannot (measured: the tests/data fixture's
# bound-crossing lane recovers in 2 ticks vs death), at a small from-rest
# fleet cost (see the RUNTIME_F32 comment).
RESTORE_F32 = RUNTIME_F32._replace(rho_restore=1e-3)


class SolveStats(NamedTuple):
    iters: jnp.ndarray  # () int32
    converged: jnp.ndarray  # () bool
    obj: jnp.ndarray  # () objective at solution
    viol: jnp.ndarray  # () total constraint violation (reference metric)
    # Diagnostics (postmortem + convergence-floor analysis); None for
    # external solve_fns (oracle / fault-injection shims) that don't carry
    # loop state.
    step_inf: jnp.ndarray | None = None  # () last accepted |du|_inf
    reg_final: jnp.ndarray | None = None  # () final Levenberg damping


class LoopState(NamedTuple):
    """Per-lane GN iteration state.  Public because the stream executor
    (stream.py) carries it across its fused multi-tick loop."""

    u: jnp.ndarray  # (n,) flat decision vector
    mu: jnp.ndarray  # () barrier weight
    reg: jnp.ndarray  # () adaptive Levenberg damping
    k: jnp.ndarray  # () iteration counter
    done: jnp.ndarray  # () bool
    last_step: jnp.ndarray  # () max |du| of last accepted step
    stall: jnp.ndarray  # () int32 consecutive stagnant iterations
    rej: jnp.ndarray  # () int32 consecutive full line-search rejections
    rho: jnp.ndarray  # () residual-row weight: 1 = barrier mode,
    #                      rho_restore = feasibility-restoration mode
    fstall: jnp.ndarray  # () int32 consecutive infeasible-at-final-mu
    #                        iterations (restoration-mode trigger counter)
    sviol: jnp.ndarray  # () scaled total violation of the current iterate
    #                       (restoration progress measure)


_LoopState = LoopState  # internal alias (historical name)


def _barrier(z, delta):
    """Relaxed log barrier beta(z), z = -c (feasible when z > 0)."""
    quad = 0.5 * (((z - 2.0 * delta) / delta) ** 2 - 1.0) - jnp.log(delta)
    safe_z = jnp.maximum(z, delta)
    return jnp.where(z > delta, -jnp.log(safe_z), quad)


def _barrier_d1(z, delta):
    safe_z = jnp.maximum(z, delta)
    return jnp.where(z > delta, -1.0 / safe_z, (z - 2.0 * delta) / delta**2)


def _barrier_d2(z, delta):
    safe_z = jnp.maximum(z, delta)
    return jnp.where(z > delta, 1.0 / safe_z**2, 1.0 / delta**2)


class QrPrefactor(NamedTuple):
    """Tick-constant QR factorization of the weighted linear residual block
    J_lin (32N, n): R0 upper triangular (n, n) and Q0^T (n, 32N).

    J_lin depends only on (N, dt, adjusted weights) — constant across every
    tick of a scenario — so the factorization belongs at SETUP time (the
    analog of the reference pre-compiling its solver .so per (N, nr_segs),
    BoundMPC.py:155-161).  Per tick only d0 = Q0^T c_lin is formed, a single
    skinny matvec."""

    R0: jnp.ndarray  # (n, n)
    Q0T: jnp.ndarray  # (n, 32N)


def adjusted_weights(path_phi_max, weights: jnp.ndarray,
                     x_phi_d: jnp.ndarray) -> jnp.ndarray:
    """The reference's weight-6 rescaling for short paths
    (BoundMPC.py:398-403) — shared by the engine's parameter assembly and
    the prefactor builder so both see identical J_lin weights."""
    phi_max_global = path_phi_max - 1e-4
    scaling = jnp.minimum(1.0 / jnp.maximum(phi_max_global, 1e-6) ** 2, 2.0)
    w6 = jnp.where(x_phi_d[0] < 1.0, weights[6] * scaling, weights[6])
    return weights.at[6].set(w6)


def make_prefactor(cfg: ocp.OcpConfig, path_phi_max, weights: jnp.ndarray,
                   x_phi_d: jnp.ndarray, dtype=jnp.float32) -> QrPrefactor:
    """Factor the linear residual block once per scenario (vmap for fleets)."""
    from . import jacobian as jmod
    w_t = adjusted_weights(path_phi_max, jnp.asarray(weights, dtype),
                           jnp.asarray(x_phi_d, dtype))
    J_lin = jmod.linear_stack(cfg, w_t, dtype)
    Q0, R0 = jnp.linalg.qr(J_lin)
    return QrPrefactor(R0=R0, Q0T=Q0.T)


class StepCtx(NamedTuple):
    """Per-TICK solve context: everything one GN iteration needs besides the
    LoopState.  ``params`` vary per tick; ``R0/Q0T`` are the scenario-constant
    QR prefactor of the linear residual block (QrPrefactor); ``d0 = Q0T @
    c_lin(params)`` is its per-tick RHS projection.  A pytree so the stream
    executor (stream.py) can carry / `where`-select it per lane."""

    params: ocp.OcpParams
    R0: jnp.ndarray  # (n, n)
    Q0T: jnp.ndarray  # (n, 32N)
    d0: jnp.ndarray  # (n,)


def make_ctx(cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs,
             params: ocp.OcpParams, pref: QrPrefactor | None,
             dtype) -> StepCtx:
    """Build the per-tick StepCtx; factors the linear block when no
    setup-time prefactor is supplied (same numerics, one extra 32N x n QR)."""
    from . import jacobian as jmod
    if pref is None:
        J_lin = jmod.linear_stack(cfg, params.weights, dtype)
        Q0, R0 = jnp.linalg.qr(J_lin)
        Q0T = Q0.T
    else:
        R0, Q0T = pref.R0, pref.Q0T
    c_lin = jmod.linear_offsets(cfg, coeffs, params, dtype)
    return StepCtx(params=params, R0=R0, Q0T=Q0T, d0=Q0T @ c_lin)


def init_loop(scfg: SolverConfig, u0: jnp.ndarray, mu0=None, reg0=None
              ) -> LoopState:
    """Fresh LoopState for one tick's solve from warm start ``u0`` (N, nu)."""
    dtype = u0.dtype
    return LoopState(
        u=u0.reshape(-1).astype(dtype),
        mu=jnp.asarray(scfg.mu_init if mu0 is None else mu0, dtype),
        reg=jnp.asarray(scfg.reg if reg0 is None else reg0, dtype),
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        last_step=jnp.asarray(jnp.inf, dtype),
        stall=jnp.asarray(0, jnp.int32),
        rej=jnp.asarray(0, jnp.int32),
        rho=jnp.asarray(1.0, dtype),
        fstall=jnp.asarray(0, jnp.int32),
        sviol=jnp.asarray(jnp.inf, dtype),
    )


def make_stepper(cfg: ocp.OcpConfig, scfg: SolverConfig,
                 coeffs: jerkint.JerkCoeffs, limits: kinematics.RobotLimits,
                 dtype):
    """Build ``step_fn(st: LoopState, ctx: StepCtx) -> LoopState`` — ONE
    damped Gauss-Newton iteration (KKT step via QR least squares, parallel
    Armijo line search, LM damping + mu continuation + convergence logic).

    Single-lane semantics; `vmap` for batching.  `solve()` composes it with
    a per-tick while_loop; the stream executor (stream.py) drives it inside
    ONE fused multi-tick loop so lanes advance through their own ticks
    independently instead of waiting for the slowest lane of every tick.
    All trace-time constants (index maps, box Jacobians, line-search grid)
    are closed over here once.
    """
    N, nu = cfg.N, cfg.nr_joints + 1
    n = N * nu

    def rc(u_flat, params):
        return ocp.residuals_and_constraints(
            cfg, coeffs, params, u_flat.reshape(N, nu), limits,
            scaled=scfg.scale_constraints, margin=scfg.margin,
        )

    def merit(u_flat, mu, rho, params):
        r, c = rc(u_flat, params)
        return rho * jnp.sum(r * r) + mu * jnp.sum(_barrier(-c, scfg.delta))

    ls_alphas = scfg.ls_decay ** jnp.arange(scfg.n_ls, dtype=dtype)

    from . import jacobian as jmod
    lmaps = jmod.linear_maps(cfg, dtype)

    def _jacobians_full(u, params):
        if scfg.jac == "structured":
            return jmod.residuals_constraints_and_jacobians(
                cfg, coeffs, lmaps, params, u.reshape(N, nu), limits,
                scaled=scfg.scale_constraints, margin=scfg.margin,
            )
        r, c = rc(u, params)
        # One forward-mode sweep for both Jacobians: n tangents.
        Jr, Jc = jax.vmap(
            lambda t: jax.jvp(lambda v: rc(v, params), (u,), (t,))[1],
            out_axes=(1, 1))(jnp.eye(n, dtype=dtype))
        return r, c, Jr, Jc

    # --- exact row reduction for the QR stack (method "qr") ---------------
    # Residual-row layout per stage (ocp.residuals): 18 state-dependent rows
    # (e_p 3, e_r 3, v 6, a 6) then 4*nj + 4 rows that are AFFINE in u with
    # CONSTANT Jacobians (q, dq, ddq, u, phi-chain).  The affine block's QR
    # factor is a pure function of (N, dt, weights) — supplied by the
    # setup-time ``pref`` or built once in make_ctx — and its per-tick RHS is
    # reproduced exactly as R0 u + Q0^T c_lin with c_lin from one zero-input
    # rollout (jacobian.linear_offsets).  Box-constraint pairs (upper/lower
    # share the same Jacobian row up to sign) merge into single rows with
    # weight w_up + w_lo and RHS -mu (d1_up - d1_lo)/s — identical normal
    # equations AND identical A^T b, so R and Q^T b match the full stack
    # exactly.  Net: m = 1100 rows -> 550, halving the TSQR kernel's work,
    # with NO per-iteration AD on any affine row.
    import numpy as onp

    nj = cfg.nr_joints
    blk = 18 + 4 * nj + 4
    dyn_idx = (onp.arange(N)[:, None] * blk
               + onp.arange(18)[None, :]).ravel()
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

    # Constant box-constraint jacobians (trace-time numpy, zero runtime)
    Jq0, Jdq0, Jphi0, Jdphi0 = jmod.box_jacobians(cfg, dtype)

    def _jacobians_reduced(u, params):
        """(r, c, Jr_dyn (18N, n), Jc_nl (5N, n)) — jacobians only for
        the FK-coupled rows; affine rows are covered by R0/constants."""
        if scfg.jac == "structured":
            return jmod.reduced_jacobians(
                cfg, coeffs, lmaps, params, u.reshape(N, nu), limits,
                scaled=scfg.scale_constraints, margin=scfg.margin,
            )
        r, c, Jr, Jc = _jacobians_full(u, params)
        return r, c, Jr[dyn_idx], Jc[s_nl]

    def step(st: LoopState, ctx: StepCtx) -> LoopState:
        u, mu, reg, rho = st.u, st.mu, st.reg, st.rho
        params = ctx.params

        # Newton/GN step as a WEIGHTED LEAST SQUARES solve via QR.  The
        # barrier curvature mu * beta''(z) reaches 1/delta^2-scale weights, so
        # the normal-equation Hessian has condition ~1e10 — beyond float32
        # Cholesky.  QR on the stacked system sees only sqrt of that
        # condition number, which is what makes the solver TPU-native
        # (float32) without emulated double precision:
        #     A = [sqrt(2) Jr; sqrt(W) Jc; sqrt(reg) I],
        #     b = [sqrt(2) r; rho; 0],   rho = mu beta' / sqrt(W)
        # => A^T A du = -A^T b  ==  H du = -g.
        if scfg.method == "qr":
            r, c, Jr_dyn, Jc_nl = _jacobians_reduced(u, params)
            z = -c
            d1 = _barrier_d1(z, scfg.delta)
            w = mu * _barrier_d2(z, scfg.delta)
            r_dyn = r[dyn_idx]
            lin_r = ctx.R0 @ u + ctx.d0  # == Q0^T r_lin(u), exact
            # Full gradient from the reduced pieces (identical to
            # 2 rho Jr^T r - mu Jc^T d1 with the full stacks); rho = 1 in
            # barrier mode, rho_restore in feasibility-restoration mode.
            g = 2.0 * rho * (Jr_dyn.T @ r_dyn + ctx.R0.T @ lin_r) - mu * (
                Jc_nl.T @ d1[s_nl]
                + Jq0.T @ (d1[s_qup] - d1[s_qlo])
                + Jdq0.T @ (d1[s_dqup] - d1[s_dqlo])
                + Jphi0.T @ (d1[s_phimax] - d1[s_negphi])
                + Jdphi0.T @ d1[s_dphi]
                + (d1[s_uup] - d1[s_ulo])
            )
            sq2 = jnp.sqrt(2.0 * rho)
            sqw_nl = jnp.sqrt(w[s_nl])
            s_q = jnp.sqrt(w[s_qup] + w[s_qlo])
            s_dq = jnp.sqrt(w[s_dqup] + w[s_dqlo])
            s_phi = jnp.sqrt(w[s_phimax] + w[s_negphi])
            sqw_dphi = jnp.sqrt(w[s_dphi])
            s_u = jnp.sqrt(w[s_uup] + w[s_ulo] + reg)  # +I rows; reg folded
            A = jnp.concatenate([
                sq2 * Jr_dyn,
                sq2 * ctx.R0,
                sqw_nl[:, None] * Jc_nl,
                s_q[:, None] * Jq0,
                s_dq[:, None] * Jdq0,
                s_phi[:, None] * Jphi0,
                sqw_dphi[:, None] * Jdphi0,
                s_u[:, None] * jnp.eye(n, dtype=dtype),
            ], axis=0)
            b = jnp.concatenate([
                sq2 * r_dyn,
                sq2 * lin_r,
                -mu * d1[s_nl] / sqw_nl,
                -mu * (d1[s_qup] - d1[s_qlo]) / s_q,
                -mu * (d1[s_dqup] - d1[s_dqlo]) / s_dq,
                -mu * (d1[s_phimax] - d1[s_negphi]) / s_phi,
                -mu * d1[s_dphi] / sqw_dphi,
                -mu * (d1[s_uup] - d1[s_ulo]) / s_u,
            ])
            # vmap-transparent QR-LS: on TPU/f32 the batched call lowers to
            # the Pallas streaming TSQR kernel (ops/tsqr.py) with the
            # triangular factor resident in VMEM; elsewhere XLA QR.
            from .ops import tsqr as _tsqr
            du = _tsqr.ls_solve(A, b)
        elif scfg.method == "qr_full":
            r, c, Jr, Jc = _jacobians_full(u, params)
            z = -c
            g = (2.0 * rho * (Jr.T @ r)
                 - mu * (Jc.T @ _barrier_d1(z, scfg.delta)))
            w = mu * _barrier_d2(z, scfg.delta)
            sqw = jnp.sqrt(w)
            rhs_c = mu * _barrier_d1(z, scfg.delta) / jnp.maximum(sqw, 1e-30)
            sq2 = jnp.sqrt(2.0 * rho)
            A = jnp.concatenate(
                [sq2 * Jr, sqw[:, None] * Jc,
                 jnp.sqrt(reg) * jnp.eye(n, dtype=dtype)], axis=0
            )
            b = jnp.concatenate(
                [sq2 * r, -rhs_c, jnp.zeros(n, dtype)], axis=0
            )
            from .ops import tsqr as _tsqr
            du = _tsqr.ls_solve(A, b)
        else:
            raise ValueError(f"unknown step method {scfg.method!r}")
        # Safety net: degenerate factorization -> scaled gradient step.
        du_ok = jnp.all(jnp.isfinite(du))
        du = jnp.where(du_ok, du, -g / (jnp.linalg.norm(g) + 1.0))

        # Parallel backtracking Armijo line search: evaluate every candidate
        # at once instead of a sequential loop.
        m0 = rho * jnp.sum(r * r) + mu * jnp.sum(_barrier(z, scfg.delta))
        slope = jnp.dot(g, du)
        cand_m = jax.vmap(
            lambda a: merit(u + a * du, mu, rho, params))(ls_alphas)
        ok = cand_m <= m0 + scfg.armijo * ls_alphas * slope
        ok = ok & jnp.isfinite(cand_m)
        # First (largest-alpha) acceptable candidate; fall back to the best
        # finite merit if Armijo fails everywhere.
        first_ok = jnp.argmax(ok)
        any_ok = jnp.any(ok)
        best = jnp.argmin(jnp.where(jnp.isfinite(cand_m), cand_m, jnp.inf))
        idx = jnp.where(any_ok, first_ok, best)
        alpha = ls_alphas[idx]
        improved = any_ok | (cand_m[best] < m0)
        alpha = jnp.where(improved, alpha, 0.0)

        u_new = jnp.where(improved, u + alpha * du, u)
        step_inf = jnp.where(improved, jnp.max(jnp.abs(alpha * du)), 0.0)

        # Levenberg-Marquardt damping adaptation (see SolverConfig.reg_max):
        # a (near-)full accepted step means the local model is trusted —
        # relax the damping; an accepted-but-heavily-backtracked or rejected
        # step means the Newton step overshot the linearization — tighten it
        # so the next step comes out pre-scaled instead of being rescued by
        # the line search at alpha ~ 0.01.
        full_step = improved & (alpha >= 0.3)
        tiny_step = improved & (alpha < 0.05)
        reg_new = jnp.where(
            full_step, jnp.maximum(reg * scfg.reg_shrink, scfg.reg), reg)
        # Consecutive FULL rejections accelerate the growth (10x, 100x,
        # 1000x, ...): when the floor damping is many decades below the
        # trusted scale (a deeply-infeasible warm iterate puts the barrier
        # in its mu/delta^2 quadratic extension), a fixed 10x climb burns
        # ~7 iterations doing nothing (measured, experiments/trace_solve.py);
        # the accelerated climb reaches the same damping in ~3.  Tiny
        # accepted steps keep the plain 10x — there the scale is nearly
        # right already.
        grow = scfg.reg_grow ** (1 + jnp.minimum(st.rej, 2).astype(dtype))
        reg_new = jnp.where(~improved,
                            jnp.minimum(reg * grow, scfg.reg_max), reg_new)
        reg_new = jnp.where(tiny_step,
                            jnp.minimum(reg * scfg.reg_grow, scfg.reg_max),
                            reg_new)
        rej_new = jnp.where(improved, 0, st.rej + 1)

        # mu continuation: decay toward mu_min only on accepted steps.  (A
        # failed line search no longer backs mu off — growing the damping is
        # the escape from an untrusted model, and it cannot un-converge the
        # barrier the way re-raising mu did.)
        mu_new = jnp.where(
            improved, jnp.maximum(mu * scfg.mu_decay, scfg.mu_min), mu)
        at_final_mu = mu <= scfg.mu_min * 1.0001
        # Converged at final mu when an accepted step fell below tolerance,
        # or when the DAMPED NEWTON step itself is below tolerance (a
        # warm-started solve that starts at the optimum has no strictly
        # improving candidate, so gating `done` on `improved` alone would
        # burn all max_iters there).
        du_inf = jnp.max(jnp.abs(du))
        done = at_final_mu & (
            (du_inf < scfg.tol_step) | (improved & (step_inf < scfg.tol_step))
        )
        restoring = scfg.rho_restore > 0
        if scfg.stall_iters > 0 or restoring or scfg.soft_iters > 0:
            # Same per-row 1e-6 slack as the engine's success metric —
            # without it, ACTIVE constraints sitting exactly on their bound
            # (c ~ +f32 noise, amplified by the 1/bound^2 row scaling) keep
            # `feas` false forever and the lane burns all max_iters while
            # being perfectly feasible in reference units.
            sviol_now = jnp.sum(jnp.where(c > 1e-6, c, 0.0))
            feas = sviol_now < scfg.tol_feas
            rel_dec = (m0 - cand_m[idx]) / jnp.maximum(jnp.abs(m0), 1.0)
            stagnant_any = (~improved) | (rel_dec < scfg.tol_merit)
        in_restore = (rho < 1.0) if restoring else jnp.asarray(False)
        if restoring:
            # A DEEPLY-infeasible small-step exit in barrier mode would hand
            # back a trapped iterate restoration could still fix — require
            # feasibility (or restoration mode) for that done path.
            # SHALLOW infeasibility (below the restoration trigger — margin-
            # buffer dwelling, true bounds typically satisfied) is exempt
            # from the block ONLY on the |du| < tol_step path — the damped
            # Newton step being below tolerance means the lane literally
            # cannot move, and restoration will never engage there, so
            # blocking that exit only burns the remaining budget.  (Merit
            # stagnation is NOT exempted: a stagnant-but-mobile shallow lane
            # measurably resolves with more iterations — exiting it early
            # cost a mixed-fleet lane-tick at true viol 4e-3.)
            shallow_now = sviol_now < scfg.restore_trigger_viol
            done = done & (feas | in_restore | shallow_now)
        # Stagnation convergence: at final mu and for stall_iters
        # consecutive iterations either (barrier mode, FEASIBLE) no
        # meaningful merit decrease (SolverConfig.tol_merit) — converged —
        # or (restoration mode) no meaningful VIOLATION decrease.  Merit is
        # the wrong stagnation measure in restore mode and violation the
        # wrong one in barrier mode: the measured trap makes ~1e-4 relative
        # merit progress per iteration while violation is flat
        # (trace_solve, lane 129 t102).  A stalled RESTORATION hands the
        # lane BACK to barrier mode while budget remains (the barrier
        # routinely polishes the ~1e-2-level leftovers restoration can't —
        # terminating the whole solve there surrendered a measured
        # 9.7e-3-viol iterate that 20 more barrier iterations took to
        # 3e-6); only with the budget nearly gone does it end the solve.
        hand_back = jnp.asarray(False)
        if scfg.stall_iters > 0:
            stagnant = at_final_mu & ~in_restore & feas & stagnant_any
            if restoring:
                # Only ACCEPTED steps measure the restoration argmin — a
                # rejected step says nothing (the trust region is still
                # adapting); a 6-deep rejection cascade (reg grown ~10
                # decades under the accelerated climb) is hopeless-wedged
                # and also exits.
                stagnant = stagnant | (in_restore & (
                    (improved & (sviol_now > 0.95 * st.sviol))
                    | (rej_new >= 6)))
            stall_new = jnp.where(stagnant, st.stall + 1, 0)
            fire = stall_new >= scfg.stall_iters
            if restoring:
                # Depth decides: a restoration stalled BELOW the deep-
                # trouble trigger hands back (barrier polishes the leftover
                # and cannot re-trigger restoration, so no cycling); one
                # stalled ABOVE it has hit a genuinely-infeasible argmin —
                # return it now instead of letting the barrier walk away
                # from the least-violating point (measured: the walk-away
                # re-cycle death-spiraled the lane-129 fixture).
                budget_left = st.k < scfg.max_iters - 16
                rest_fire = fire & in_restore
                shallow = sviol_now <= scfg.restore_trigger_viol
                hand_back = rest_fire & budget_left & shallow
                done = done | (fire & ~in_restore) | (rest_fire & ~hand_back)
            else:
                done = done | fire
        else:
            stall_new = st.stall
        # Feasibility-restoration mode transitions (SolverConfig.rho_restore):
        # enter after restore_patience consecutive DEEPLY-infeasible
        # NON-IMPROVING iterations at the final barrier weight.  All three
        # qualifiers are load-bearing: honestly-converging warm lanes
        # restore feasibility in a couple of iterations (infeasible but
        # briefly); SLOWLY-converging lanes stay deep for many iterations
        # but keep cutting viol >5%/iter (the experiment1 tick-13 canary —
        # interrupting those measurably degraded the plan); a trapped lane
        # plateaus deep AND flat indefinitely.  Merit-based triggers miss
        # the plateau entirely (it still "improves" above tol_merit).
        if restoring:
            fstall_new = jnp.where(
                at_final_mu & ~in_restore
                & (sviol_now > scfg.restore_trigger_viol)
                & (sviol_now > 0.95 * st.sviol),
                st.fstall + 1, 0)
            enter = fstall_new >= scfg.restore_patience
            exit_ = in_restore & (feas | hand_back)
            rho_new = jnp.where(enter, jnp.asarray(scfg.rho_restore, dtype),
                                rho)
            rho_new = jnp.where(exit_, jnp.asarray(1.0, dtype), rho_new)
            # Mode flip = new merit landscape: fresh counters.  reg is KEPT:
            # it encodes the trusted step scale for the same constraint
            # linearization (the rows that dominate restore mode); resetting
            # it to the floor caused a rejection cascade that the argmin
            # detector misread (measured on the lane-129 fixture).
            flip = enter | exit_
            rej_new = jnp.where(flip, 0, rej_new)
            stall_new = jnp.where(flip, 0, stall_new)
            fstall_new = jnp.where(flip, 0, fstall_new)
            done = done & ~enter
        else:
            rho_new = rho
            if scfg.soft_iters > 0:
                # Progress-gated soft budget (SolverConfig.soft_iters):
                # fstall counts consecutive non-improving infeasible
                # iterations (the field is otherwise unused when
                # restoration is off).
                noprog = sviol_now > 0.98 * st.sviol
                fstall_new = jnp.where(at_final_mu & ~feas & noprog,
                                       st.fstall + 1, 0)
                done = done | ((st.k >= scfg.soft_iters)
                               & (fstall_new >= 6))
            else:
                fstall_new = st.fstall
        sviol_keep = (sviol_now
                      if scfg.stall_iters > 0 or restoring
                      or scfg.soft_iters > 0
                      else st.sviol)
        return LoopState(u_new, mu_new, reg_new, st.k + 1, done, step_inf,
                         stall_new, rej_new, rho_new, fstall_new, sviol_keep)

    return step


def finish(cfg: ocp.OcpConfig, coeffs: jerkint.JerkCoeffs,
           params: ocp.OcpParams, limits: kinematics.RobotLimits,
           out: LoopState):
    """Final iterate -> (u_opt (N, nu), SolveStats) with the UNSCALED
    reference success metric (sum of violations beyond 1e-6 slack,
    BoundMPC.py:460-465; all our constraints are c <= 0 one-sided)."""
    u_opt = out.u.reshape(cfg.N, cfg.nr_joints + 1)
    ev = ocp.evaluate_stages(cfg, coeffs, params, u_opt)
    obj = ocp.objective(cfg, params, ev, u_opt)
    cfin = ocp.full_constraints(cfg, params, ev, u_opt, limits)
    viol = jnp.sum(jnp.where(cfin > 1e-6, cfin, 0.0))
    return u_opt, SolveStats(iters=out.k, converged=out.done, obj=obj,
                             viol=viol, step_inf=out.last_step,
                             reg_final=out.reg)


def solve(cfg: ocp.OcpConfig, scfg: SolverConfig, coeffs: jerkint.JerkCoeffs,
          params: ocp.OcpParams, u0: jnp.ndarray,
          limits: kinematics.RobotLimits, mu0=None,
          pref: QrPrefactor | None = None, reg0=None):
    """Minimize the condensed OCP from warm start ``u0`` (N, 8).

    Returns (u_opt (N, 8), SolveStats).  Pure function of its inputs —
    `vmap` over (params, u0) for scenario batching, `jit` at the caller.

    ``mu0`` (traced scalar, optional) overrides the static ``scfg.mu_init``
    barrier start — the engine passes ``scfg.mu_warm`` on warm-started ticks
    so the mu continuation resumes near the central path instead of
    restarting from the interior (SolverConfig.mu_warm).

    ``pref`` (optional) supplies the setup-time QR prefactor of the linear
    residual block; when absent it is built in-solve (same numerics, pays a
    320 x n QR per call).

    ``reg0`` (traced scalar, optional) overrides the static ``scfg.reg``
    initial Levenberg damping — the engine passes the previous tick's final
    damping (EngineState.reg_warm) so hard ticks don't re-climb it through
    rejected line searches.
    """
    dtype = u0.dtype
    ctx = make_ctx(cfg, coeffs, params, pref, dtype)
    step = make_stepper(cfg, scfg, coeffs, limits, dtype)

    def cond(st: LoopState):
        return (~st.done) & (st.k < scfg.max_iters)

    init = init_loop(scfg, u0, mu0=mu0, reg0=reg0)
    out = jax.lax.while_loop(cond, lambda st: step(st, ctx), init)
    return finish(cfg, coeffs, params, limits, out)
