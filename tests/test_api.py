"""Reference-compatible facade: the reference's own calling pattern works."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from boundmpc_tpu import kinematics as kin
from boundmpc_tpu.api import BoundMPC, MPCParams
from boundmpc_tpu.runtime.scenarios import experiment1


def test_reference_calling_pattern():
    """Reproduces the node's usage: construct with via lists, then call
    step(q, dq, ddq, p_lie, v, x_phi_d, jerk) in a loop with an external
    plant (here: the returned first-stage states, like the simulated node)."""
    sc = experiment1()
    params = MPCParams(n=10, dt=0.1, nr_segs=4, weights=sc.weights.tolist())
    mpc = BoundMPC(
        sc.p_via, sc.r_via, [sc.p_upper, sc.p_lower], [sc.r_upper, sc.r_lower],
        sc.bp1, sc.br1, sc.s, sc.e_p_min, sc.e_r_min, sc.e_p_max, sc.e_r_max,
        p0=np.array(kin.fk_pose(jnp.asarray(sc.q0))), params=params,
    )
    x_phi_d = np.array([mpc.phi_max[0], 0.0, 0.0])

    q, dq, ddq = sc.q0.copy(), np.zeros(7), np.zeros(7)
    jerk = np.zeros(7)
    for k in range(5):
        p_lie = np.array(kin.fk_pose(jnp.asarray(q)))
        v = np.asarray(kin.jacobian(jnp.asarray(q))) @ dq
        traj_data, ref_data, err_data, t_comp, iters = mpc.step(
            q, dq, ddq, p_lie, v, x_phi_d, jerk
        )
        assert traj_data is not None
        # Reference layouts: (7, N) joints, (6, N) Cartesian
        assert traj_data["q"].shape == (7, 10)
        assert traj_data["p"].shape == (6, 10)
        assert traj_data["phi"].shape == (10,)
        assert len(ref_data["p"]) == 10
        assert len(err_data["e_r"]) == 10
        assert iters > 0 and t_comp > 0
        # external plant: advance with the first-stage solution
        q = traj_data["q"][:, 0]
        dq = traj_data["dq"][:, 0]
        ddq = traj_data["ddq"][:, 0]
        jerk = traj_data["dddq"][:, 0]

    assert mpc.phi_current[0] > 0.0
    assert mpc.error_count == 0


def test_update_replans():
    from boundmpc_tpu.runtime.scenarios import experiment2

    sc = experiment1()
    mpc = BoundMPC(
        sc.p_via, sc.r_via, [sc.p_upper, sc.p_lower], [sc.r_upper, sc.r_lower],
        sc.bp1, sc.br1, sc.s, sc.e_p_min, sc.e_r_min, sc.e_p_max, sc.e_r_max,
        p0=np.array(kin.fk_pose(jnp.asarray(sc.q0))),
        params=MPCParams(weights=sc.weights.tolist()),
    )
    q, dq, ddq, jerk = sc.q0.copy(), np.zeros(7), np.zeros(7), np.zeros(7)
    x_phi_d = np.array([mpc.phi_max[0], 0.0, 0.0])
    for _ in range(3):
        p_lie = np.array(kin.fk_pose(jnp.asarray(q)))
        v = np.asarray(kin.jacobian(jnp.asarray(q))) @ dq
        traj_data, *_ = mpc.step(q, dq, ddq, p_lie, v, x_phi_d, jerk)
        q, dq, ddq = (traj_data["q"][:, 0], traj_data["dq"][:, 0],
                      traj_data["ddq"][:, 0])
        jerk = traj_data["dddq"][:, 0]

    sc2 = experiment2()
    p_lie = np.array(kin.fk_pose(jnp.asarray(q)))
    v = np.asarray(kin.jacobian(jnp.asarray(q))) @ dq
    # new path starting at the current pose (node semantics)
    p_via2 = [p_lie[:3]] + [np.asarray(p) for p in sc2.p_via[1:]]
    r_via2 = [R.from_rotvec(p_lie[3:]).as_matrix()] + list(sc2.r_via[1:])
    mpc.update(
        p_via2, r_via2, [sc2.p_upper, sc2.p_lower], [sc2.r_upper, sc2.r_lower],
        sc2.bp1, sc2.br1, sc2.s, sc2.e_p_min, sc2.e_r_min, sc2.e_p_max,
        sc2.e_r_max, p_lie, v, np.zeros(6), np.zeros(6), p0=p_lie,
    )
    assert abs(mpc.phi_current[0]) < 0.2
    traj_data, *_ = mpc.step(q, dq, ddq, p_lie, v,
                             np.array([mpc.phi_max[0], 0, 0]), jerk)
    assert traj_data is not None


def test_update_with_new_dims_rebuilds_solver():
    """An MPCParams record changing (n, nr_segs, dt) must rebuild the OCP
    config, coefficients, and jitted tick — the reference node re-runs
    BoundMPC.__init__ on every MPCParams arrival (bound_mpc_node.py:48,
    BoundMPC.py:35-62).  Round-2 silently kept the old jitted tick."""
    sc = experiment1()
    mpc = BoundMPC(
        sc.p_via, sc.r_via, [sc.p_upper, sc.p_lower], [sc.r_upper, sc.r_lower],
        sc.bp1, sc.br1, sc.s, sc.e_p_min, sc.e_r_min, sc.e_p_max, sc.e_r_max,
        p0=np.array(kin.fk_pose(jnp.asarray(sc.q0))),
        params=MPCParams(weights=sc.weights.tolist()),
    )
    q, dq, ddq, jerk = sc.q0.copy(), np.zeros(7), np.zeros(7), np.zeros(7)
    p_lie = np.array(kin.fk_pose(jnp.asarray(q)))
    v = np.asarray(kin.jacobian(jnp.asarray(q))) @ dq
    x_phi_d = np.array([mpc.phi_max[0], 0.0, 0.0])
    traj_data, *_ = mpc.step(q, dq, ddq, p_lie, v, x_phi_d, jerk)
    assert traj_data["q"].shape == (7, 10)

    # Same path, new problem dimensions: longer horizon, finer dt.
    new_params = MPCParams(n=14, dt=0.05, nr_segs=4,
                           weights=sc.weights.tolist())
    mpc.update(
        sc.p_via, sc.r_via, [sc.p_upper, sc.p_lower], [sc.r_upper, sc.r_lower],
        sc.bp1, sc.br1, sc.s, sc.e_p_min, sc.e_r_min, sc.e_p_max, sc.e_r_max,
        p_lie, v, np.zeros(6), np.zeros(6), p0=p_lie, params=new_params,
    )
    assert mpc.N == 14 and mpc.dt == 0.05
    assert mpc.cfg.N == 14 and mpc.cfg.dt == 0.05
    assert mpc._state.u_warm.shape == (14, 8)
    traj_data, *_ = mpc.step(q, dq, ddq, p_lie, v,
                             np.array([mpc.phi_max[0], 0, 0]), jerk)
    assert traj_data is not None
    assert traj_data["q"].shape == (7, 14)
    assert traj_data["phi"].shape == (14,)


def _mpc_for(sc, **params_kw):
    return BoundMPC(
        sc.p_via, sc.r_via, [sc.p_upper, sc.p_lower], [sc.r_upper, sc.r_lower],
        sc.bp1, sc.br1, sc.s, sc.e_p_min, sc.e_r_min, sc.e_p_max, sc.e_r_max,
        p0=np.array(kin.fk_pose(jnp.asarray(sc.q0))),
        params=MPCParams(weights=sc.weights.tolist(), **params_kw),
    )


def _one_step(mpc, sc):
    q, dq, ddq, jerk = sc.q0.copy(), np.zeros(7), np.zeros(7), np.zeros(7)
    p_lie = np.array(kin.fk_pose(jnp.asarray(q)))
    v = np.asarray(kin.jacobian(jnp.asarray(q))) @ dq
    x_phi_d = np.array([mpc.phi_max[0], 0.0, 0.0])
    return mpc.step(q, dq, ddq, p_lie, v, x_phi_d, jerk)


def test_return_data_key_layout_matches_reference():
    """Key-by-key layout check against the reference's compute_return_data
    write set (BoundMPC.py:614-680 ref_data, :700-712 err_data,
    :755-768 traj_data)."""
    sc = experiment1()
    mpc = _mpc_for(sc)
    traj_data, ref_data, err_data, _, _ = _one_step(mpc, sc)

    assert set(traj_data.keys()) == {
        "p", "v", "a", "q", "dq", "ddq", "dddq", "phi", "dphi", "ddphi",
        "dddphi",
    }
    # reference ref_data fields (BoundMPC.py:646-676)
    ref_keys = {"p", "dp", "ddp", "dp_normed", "r_par_bound", "bound_lower",
                "bound_upper", "e_p_off", "e_r_off", "bp1", "bp2", "br1",
                "br2", "v1", "v2", "v3"}
    assert ref_keys <= set(ref_data.keys()), ref_keys - set(ref_data.keys())
    # reference err_data fields (BoundMPC.py:700-712)
    err_keys = {"e_p", "de_p", "e_p_par", "e_p_orth", "de_p_par", "de_p_orth",
                "e_r", "de_r", "e_r_par", "e_r_orth1", "e_r_orth2"}
    assert err_keys <= set(err_data.keys()), err_keys - set(err_data.keys())
    for k in ref_keys:
        assert len(ref_data[k]) == mpc.N, k
    for k in err_keys:
        assert len(err_data[k]) == mpc.N, k

    # the corrected logged e_r is the exact Lie error vs the integrated
    # rotation reference (BoundMPC.py:646-752): at a near-zero initial
    # error it must stay small, and ref p rotation part equals pr_ref
    np.testing.assert_allclose(ref_data["p"][0][3:],
                               np.array(mpc._state.pr_ref), atol=1e-12)
    assert np.linalg.norm(err_data["e_r"][0]) < 0.2


def test_real_time_gates_log_computation():
    """real_time=True skips the ref/err log computation entirely
    (BoundMPC.py:47, :613)."""
    sc = experiment1()
    mpc = _mpc_for(sc, real_time=True)
    traj_data, ref_data, err_data, _, iters = _one_step(mpc, sc)
    assert traj_data is not None and iters > 0
    assert ref_data is None and err_data is None


def test_default_path_holds_pose():
    """get_default_path analog: a hold-in-place scenario solves trivially
    (utils/path_utils.py:4-39)."""
    from boundmpc_tpu.runtime import ClosedLoopRunner, default_path

    sc = default_path(nr_segs=4)
    r = ClosedLoopRunner(sc)
    log = r.run(max_ticks=4)
    assert all(log.success)
    assert max(log.viol) < 1e-6
    assert np.abs(np.asarray(log.q)[-1] - sc.q0).max() < 1e-8
