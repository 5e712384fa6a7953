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


def _straight_scenario(p_start, direction, r0mat):
    """A gently-bent via path whose FIRST segment direction is ``direction``."""
    from boundmpc_tpu.runtime.scenarios import Scenario
    d = np.asarray(direction, float)
    d = d / np.linalg.norm(d)
    # small orthogonal bend keeps later segments non-degenerate
    orth = np.cross(d, [0.0, 0.0, 1.0])
    if np.linalg.norm(orth) < 1e-6:
        orth = np.cross(d, [0.0, 1.0, 0.0])
    orth /= np.linalg.norm(orth)
    p_via = [np.asarray(p_start, float),
             p_start + 0.5 * d,
             p_start + 0.9 * d + 0.1 * orth,
             p_start + 1.2 * d + 0.25 * orth,
             p_start + 1.5 * d + 0.3 * orth]
    ones = [np.array([1.0, 1.0]) for _ in range(5)]
    neg = [np.array([-1.0, -1.0]) for _ in range(5)]
    bz = [np.array([0.0, 0.0, 1.0]) for _ in range(5)]
    return Scenario(
        name="straight", q0=np.zeros(7), p_via=p_via,
        r_via=[np.asarray(r0mat, float).copy() for _ in range(5)],
        p_lower=neg, p_upper=ones, r_lower=[v.copy() for v in neg],
        r_upper=[v.copy() for v in ones], bp1=bz,
        br1=[v.copy() for v in bz], e_p_max=0.5,
    )


def test_replan_projection_matches_reference():
    """Pin the replan velocity-projection semantics against the reference
    (BoundMPC.update :198-210):

    * FORWARD-motion replans (current Cartesian motion along the new first
      segment) must reproduce the reference's UNCLAMPED projection exactly:
      phi = <p - via0, dp0> (clamped into the segment, :349-364) and
      (dphi, ddphi, dddphi) = (<v, dp0>, <a, dp0>, <j, dp0>) with NO
      sign clamping of the acceleration/jerk projections.
    * MOTION-OPPOSING replans keep the documented deviation: the path
      parameter never runs backward, so the phi-chain restarts at rest
      (engine.replan_state rationale)."""
    from boundmpc_tpu import kinematics
    from scipy.spatial.transform import Rotation as R

    r = ClosedLoopRunner(experiment1())
    r.run(max_ticks=20)
    st = r.state
    q, dq, ddq = st.q, st.dq, st.ddq
    pose = np.array(kinematics.fk_pose(q))  # copy: scipy rejects jax views
    J = np.asarray(kinematics.jacobian(q))
    dJ = np.asarray(kinematics.djacobian(q, dq))
    ddJ = np.asarray(kinematics.ddjacobian(q, dq, ddq))
    v = J @ np.asarray(dq)
    a = J @ np.asarray(ddq) + dJ @ np.asarray(dq)
    j = J @ np.asarray(st.jerk) + dJ @ np.asarray(ddq) + ddJ @ np.asarray(dq)
    assert np.linalg.norm(v[:3]) > 1e-3, "plant must be moving"

    r0mat = R.from_rotvec(pose[3:]).as_matrix()

    # --- forward case: new path direction = current velocity direction ----
    d = v[:3] / np.linalg.norm(v[:3])
    sc_fwd = _straight_scenario(pose[:3] - 0.05 * d, d, r0mat)
    path_fwd = sc_fwd.build(dtype=np.float64)
    st_fwd = engine.replan_state(r.cfg, st, path_fwd)
    dp0 = np.asarray(path_fwd.seg_dp[0])
    phi_exp = np.clip(np.dot(pose[:3] - np.asarray(path_fwd.seg_p0[0]), dp0),
                      0.0, float(path_fwd.seg_len[0]) - 0.01)
    assert float(st_fwd.phi) == pytest.approx(phi_exp, abs=1e-9)
    assert float(st_fwd.dphi) == pytest.approx(float(np.dot(v[:3], dp0)),
                                               abs=1e-9)
    assert float(st_fwd.dphi) > 0.0
    # acceleration / jerk projections are UNCLAMPED (sign preserved even
    # when negative) — the reference applies no sign logic here
    assert float(st_fwd.ddphi) == pytest.approx(float(np.dot(a[:3], dp0)),
                                                abs=1e-9)
    assert float(st_fwd.dddphi) == pytest.approx(float(np.dot(j[:3], dp0)),
                                                 abs=1e-9)

    # --- opposing case: new path direction = reversed velocity ------------
    sc_rev = _straight_scenario(pose[:3] + 0.05 * d, -d, r0mat)
    path_rev = sc_rev.build(dtype=np.float64)
    st_rev = engine.replan_state(r.cfg, st, path_rev)
    assert float(np.dot(v[:3], np.asarray(path_rev.seg_dp[0]))) < 0.0
    assert float(st_rev.dphi) == 0.0
    assert float(st_rev.ddphi) == 0.0
    assert float(st_rev.dddphi) == 0.0
    assert float(st_rev.phi) >= 0.0


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
