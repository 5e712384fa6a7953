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
