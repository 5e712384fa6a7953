"""Engine closed-loop behavior: goal reaching, fallback, replanning."""
import numpy as np
import jax.numpy as jnp
import pytest

from boundmpc_tpu import engine, ocp
from boundmpc_tpu.runtime import ClosedLoopRunner, experiment1, experiment2


def test_experiment1_reaches_goal_segment2():
    """The loop makes monotone progress and crosses the first via point
    (full-path runs are exercised in the slow marker test below)."""
    r = ClosedLoopRunner(experiment1())
    log = r.run(max_ticks=60)
    phis = np.asarray(log.phi)
    assert phis[-1] > 1.2, "too little progress"
    assert np.all(np.diff(phis) > -1e-9), "phi must be non-decreasing"
    assert all(log.success)
    assert max(log.viol) < 1e-3
    # Sector advanced once the first segment (length ~1.07) was crossed
    assert log.sector[-1] >= 1


def test_dphi_respects_limit():
    r = ClosedLoopRunner(experiment1())
    log = r.run(max_ticks=40)
    dphi_max = float(r.weights[4])
    assert np.max(log.dphi) < dphi_max + 1e-3


def test_replan_restarts_path():
    """Mid-run replanning onto a conflicting path (experiment2's corridors,
    entered while moving along experiment1) is a feasibility SHOCK: the
    reference's own Ipopt fails such solves and runs its fallback
    (BoundMPC.py:467-496).  The contract is recovery, not instant success:
    the engine must keep phi >= 0, keep executing safe plans, re-enter the
    success regime within the fallback budget, and stay there."""
    r = ClosedLoopRunner(experiment1())
    r.run(max_ticks=20)
    phi_before = float(r.state.phi)
    assert phi_before > 0.1

    sc2 = experiment2()
    r.replan(sc2)
    # phi re-anchored near zero on the new path; state otherwise continuous
    assert 0.0 <= float(r.state.phi) < 0.2
    assert int(r.state.sector) == 0
    log2 = r.run(max_ticks=15)
    assert not bool(r.state.dead), "fallback budget exhausted"
    phis = np.asarray(log2.phi)
    assert np.all(phis >= -1e-9), "phi must never run backward past 0"
    succ = np.asarray(log2.success)
    first_ok = int(np.argmax(succ))
    assert succ.any() and first_ok <= 8, "no recovery within 8 ticks"
    assert succ[first_ok:].all(), "success must be sustained after recovery"
    assert max(log2.viol[first_ok:]) < 1e-4


def test_fallback_counts_reset():
    """error_count stays 0 on a healthy run; dead never triggers."""
    r = ClosedLoopRunner(experiment1())
    log = r.run(max_ticks=25)
    assert max(log.fails) == 0
    assert not bool(r.state.dead)


@pytest.mark.slow
def test_experiment1_full_run_to_goal():
    r = ClosedLoopRunner(experiment1())
    log = r.run(max_ticks=400)
    assert r.phi_max - log.phi[-1] < 0.01, "did not reach the end of the path"
    assert all(log.success)
