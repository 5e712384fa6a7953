"""Condensed OCP stage functions vs the reference numpy code paths."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from boundmpc_tpu import jerkint, kinematics as kin, ocp
from boundmpc_tpu.bounds import segment_bound_coeffs
from ref_oracle import ref_funcs, ref_mpc_utils, ref_util, ref_lie

NR_SEGS = 4
N = 10
DT = 0.1
CFG = ocp.OcpConfig(N=N, nr_segs=NR_SEGS, dt=DT)


def random_window(rng):
    """Random but geometrically consistent window parameters."""
    phi_switch = np.concatenate([[0.0], np.cumsum(rng.uniform(0.3, 0.8, NR_SEGS))])
    dp_pos = rng.normal(size=(NR_SEGS, 3))
    dp_pos /= np.linalg.norm(dp_pos, axis=1, keepdims=True)
    dr = rng.normal(size=(NR_SEGS, 3)) * 0.6
    dp_ref = np.concatenate([dp_pos, dr], axis=1)
    p_pos = rng.normal(size=(NR_SEGS, 3))
    iw = rng.normal(size=(NR_SEGS, 3))
    p_ref = np.concatenate([p_pos, iw], axis=1)
    dp_normed = dr / np.linalg.norm(dr, axis=1, keepdims=True)

    def orth_pair(vs):
        b1l, b2l = [], []
        for v in vs:
            b = rng.normal(size=3)
            b -= (b @ v) * v
            b /= np.linalg.norm(b)
            b1l.append(b)
            b2l.append(np.cross(v, b))
        return np.array(b1l), np.array(b2l)

    bp1, bp2 = orth_pair(dp_pos)
    br1, br2 = orth_pair(dp_normed)
    return phi_switch, p_ref, dp_ref, dp_normed, bp1, bp2, br1, br2


def make_params(rng, q0=None):
    phi_switch, p_ref, dp_ref, dp_normed, bp1, bp2, br1, br2 = random_window(rng)
    if q0 is None:
        q0 = rng.uniform(-1.0, 1.0, 7)
    dq0 = rng.normal(size=7) * 0.1
    ddq0 = rng.normal(size=7) * 0.1
    pose0 = np.asarray(kin.fk_pose(jnp.asarray(q0)))
    v0 = np.asarray(kin.jacobian(jnp.asarray(q0))) @ dq0
    p0 = np.concatenate([pose0[:3], pose0[3:]])

    pr_ref = pose0[3:] + rng.normal(size=3) * 0.05
    iw_ref0 = rng.normal(size=3) * 0.1

    dtau_inits = [
        ref_util.compute_initial_rot_errors(p0[3:], pr_ref, dp_ref[i, 3:], br1[i], br2[i])
        for i in range(NR_SEGS)
    ]
    dtau_init = dtau_inits[0][0]
    dtau_init_par = np.stack([d[1] for d in dtau_inits])
    dtau_init_orth1 = np.stack([d[2] for d in dtau_inits])
    dtau_init_orth2 = np.stack([d[3] for d in dtau_inits])

    v1, v2, v3, jac_l, jac_r = ocp.projection_vectors(
        jnp.asarray(dtau_init), jnp.asarray(dtau_init_par),
        jnp.asarray(dtau_init_orth1), jnp.asarray(br1), jnp.asarray(br2),
        jnp.asarray(dp_normed),
    )

    seg_len = np.diff(phi_switch)
    acoef = segment_bound_coeffs(
        jnp.asarray(seg_len),
        jnp.asarray(np.tile([[-1.0, -1.0, -1.0, -1.0]], (NR_SEGS, 1))),
        jnp.asarray(np.tile([[1.0, 1.0, 1.0, 1.0]], (NR_SEGS, 1))),
        jnp.asarray(0.1), jnp.asarray(0.02), jnp.asarray(0.02),
        jnp.asarray(0.3), jnp.asarray(0.3),
    )
    acoef = jnp.concatenate([acoef, acoef[-1:]], axis=0)  # (nr_segs+1, 9, 5)

    weights = np.abs(rng.normal(size=15)) + 0.1
    params = ocp.OcpParams(
        q0=jnp.asarray(q0), dq0=jnp.asarray(dq0), ddq0=jnp.asarray(ddq0),
        phi0=jnp.asarray(0.05), dphi0=jnp.asarray(0.3), ddphi0=jnp.asarray(0.0),
        p0=jnp.asarray(p0), v0=jnp.asarray(v0),
        u_prev=jnp.asarray(rng.normal(size=7) * 0.2),
        uphi_prev=jnp.asarray(0.1),
        iw_ref0=jnp.asarray(iw_ref0),
        dtau_init=jnp.asarray(dtau_init),
        dtau_init_par=jnp.asarray(dtau_init_par),
        dtau_init_orth1=jnp.asarray(dtau_init_orth1),
        dtau_init_orth2=jnp.asarray(dtau_init_orth2),
        jac_dtau_l=jac_l, jac_dtau_r=jac_r,
        p_ref=jnp.asarray(p_ref), dp_ref=jnp.asarray(dp_ref),
        dp_normed=jnp.asarray(dp_normed),
        bp1=jnp.asarray(bp1), bp2=jnp.asarray(bp2),
        br1=jnp.asarray(br1), br2=jnp.asarray(br2),
        v1=v1, v2=v2, v3=v3,
        phi_switch=jnp.asarray(phi_switch),
        acoef=acoef,
        weights=jnp.asarray(weights),
        phi_max=jnp.asarray(phi_switch[-1] - 1e-4),
        dphi_max=jnp.asarray(1.0),
        x_phi_d=jnp.asarray([phi_switch[-1] - 1e-4, 0.0, 0.0]),
        qd=jnp.zeros(7),
    )
    return params


def ref_reference_at(params, phi, phi_prev=0.0):
    """Call the reference reference_function in its numpy branch using the
    logging-path calling convention (BoundMPC.py:621-639)."""
    acoef = np.asarray(params.acoef)

    def col(a):
        # The reference numpy branch assumes casadi-DM column-vector
        # semantics; (S, d, 1) arrays reproduce them under pure numpy.
        return np.asarray(a)[..., None]

    return ref_funcs.reference_function(
        dp_ref=col(params.dp_ref),
        p_ref=col(params.p_ref),
        phi_switch=np.expand_dims(np.asarray(params.phi_switch), 1),
        phi=phi,
        phi_prev=phi_prev,
        bp1=col(params.bp1),
        bp2=col(params.bp2),
        br1=col(params.br1),
        br2=col(params.br2),
        v1=col(params.v1),
        v2=col(params.v2),
        v3=col(params.v3),
        dp_normed_ref=col(params.dp_normed),
        a4=acoef[:, :, 0], a3=acoef[:, :, 1], a2=acoef[:, :, 2],
        a1=acoef[:, :, 3], a0=acoef[:, :, 4],
        nr_segs=NR_SEGS,
    )


def test_stage_reference_vs_reference(rng):
    params = make_params(rng)
    phi_probe = np.linspace(0.01, float(params.phi_switch[-1]) - 0.01, 13)
    for phi in phi_probe:
        ours = ocp.stage_reference(CFG, params, jnp.asarray(phi))
        ref = ref_reference_at(params, phi)
        np.testing.assert_allclose(np.asarray(ours.p_d), np.asarray(ref["p_d"]).flatten(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.dp_d), np.asarray(ref["dp_d"]).flatten(), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ours.bound_lower), np.asarray(ref["bound_lower"]).flatten(), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ours.bound_upper), np.asarray(ref["bound_upper"]).flatten(), atol=1e-12
        )
        np.testing.assert_allclose(
            float(ours.r_par_bound), float(np.asarray(ref["r_par_bound"])), atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(ours.e_p_off), np.asarray(ref["e_p_off"]).flatten(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.e_r_off), np.asarray(ref["e_r_off"]).flatten(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.bp1), np.asarray(ref["bp1_current"]).flatten(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.v2), np.asarray(ref["v2_current"]).flatten(), atol=1e-12)


def test_stage_error_vs_reference(rng):
    params = make_params(rng)
    for phi in [0.1, 0.6, 1.4]:
        p = np.asarray(params.p0) + rng.normal(size=6) * 0.05
        v = rng.normal(size=6) * 0.2
        dphi = 0.4
        ours_ref = ocp.stage_reference(CFG, params, jnp.asarray(phi))
        ours = ocp.stage_error(
            CFG, params, ours_ref, jnp.asarray(p), jnp.asarray(v),
            jnp.asarray(dphi), jnp.asarray(phi),
        )
        refd = ref_reference_at(params, phi)
        ref_err = ref_funcs.error_function(
            p=p, v=v,
            p_ref=np.asarray(refd["p_d"]).flatten(),
            dp_ref=np.asarray(refd["dp_d"]).flatten(),
            dp_normed_ref=np.asarray(refd["dp_normed_d"]).flatten(),
            dphi=dphi,
            i_omega_0=np.asarray(params.p0)[3:],
            i_omega_ref_0=np.asarray(params.iw_ref0),
            dtau_init=np.asarray(params.dtau_init),
            dtau_init_par=np.asarray(params.dtau_init_par),
            dtau_init_orth1=np.asarray(params.dtau_init_orth1),
            dtau_init_orth2=np.asarray(params.dtau_init_orth2),
            br1=np.asarray(refd["br1_current"]).flatten(),
            br2=np.asarray(refd["br2_current"]).flatten(),
            jac_dtau_l=np.asarray(params.jac_dtau_l),
            jac_dtau_r=np.asarray(params.jac_dtau_r),
            phi=phi,
            phi_switch=np.asarray(params.phi_switch),
            v1=np.asarray(refd["v1_current"]).flatten(),
            v2=np.asarray(refd["v2_current"]).flatten(),
            v3=np.asarray(refd["v3_current"]).flatten(),
            nr_segs=NR_SEGS,
        )
        for name in ErrFields:
            np.testing.assert_allclose(
                np.asarray(getattr(ours, name)).flatten(),
                np.asarray(ref_err[name]).flatten(),
                atol=1e-10, err_msg=name,
            )


ErrFields = [
    "e_p_par", "e_p_orth", "de_p_par", "de_p_orth", "e_p", "de_p",
    "e_r_par", "e_r", "de_r", "e_r_orth1", "e_r_orth2",
]


def test_projection_vectors_vs_reference(rng):
    """Dual-basis solve vs the reference's cofactor formulas
    (BoundMPC.compute_orientation_projection_vectors :284-304)."""
    from ref_oracle import BoundMPCClass

    params = make_params(rng)
    eng = object.__new__(BoundMPCClass)
    eng.dtau_init = np.array(params.dtau_init)[:, None].repeat(NR_SEGS, 1)
    eng.dtau_init_par = np.array(params.dtau_init_par).T
    eng.dtau_init_orth1 = np.array(params.dtau_init_orth1).T
    eng.dtau_init_orth2 = np.array(params.dtau_init_orth2).T
    v1r, v2r, v3r, jac_l_r, jac_r_r = eng.compute_orientation_projection_vectors(
        np.array(params.br1).T, np.array(params.br2).T, np.array(params.dp_normed).T
    )
    np.testing.assert_allclose(np.asarray(params.v1), v1r.T, atol=1e-9)
    np.testing.assert_allclose(np.asarray(params.v2), v2r.T, atol=1e-9)
    np.testing.assert_allclose(np.asarray(params.v3), v3r.T, atol=1e-9)
    np.testing.assert_allclose(np.asarray(params.jac_dtau_l), jac_l_r, atol=1e-9)
    np.testing.assert_allclose(np.asarray(params.jac_dtau_r), jac_r_r, atol=1e-9)


def test_rollout_dynamics_consistency(rng):
    """Condensed rollout equals sequential exact stage integration
    (integration_function semantics, bound_mpc_functions.py:249-295)."""
    params = make_params(rng)
    coeffs = jerkint.coeff_matrices(N, DT, dtype=jnp.float64)
    u = rng.normal(size=(N, 8)) * 0.5
    traj = ocp.rollout(CFG, coeffs, params, jnp.asarray(u))

    # Sequential: step through with jerkint.step and FK
    q, dq, ddq = np.asarray(params.q0), np.asarray(params.dq0), np.asarray(params.ddq0)
    phi, dphi, ddphi = float(params.phi0), float(params.dphi0), float(params.ddphi0)
    iw = np.asarray(params.p0)[3:]
    omega_prev = np.asarray(kin.jacobian(jnp.asarray(q)))[3:] @ dq
    u_prev = np.concatenate([np.asarray(params.u_prev), [float(params.uphi_prev)]])
    for k in range(N):
        uk = u[k]
        qn, dqn, ddqn = jerkint.step(
            jnp.asarray(u_prev[:7]), jnp.asarray(uk[:7]), jnp.asarray(q),
            jnp.asarray(dq), jnp.asarray(ddq), DT,
        )
        phin, dphin, ddphin = jerkint.step(u_prev[7], uk[7], phi, dphi, ddphi, DT)
        q, dq, ddq = np.asarray(qn), np.asarray(dqn), np.asarray(ddqn)
        phi, dphi, ddphi = float(phin), float(dphin), float(ddphin)
        J = np.asarray(kin.jacobian(jnp.asarray(q)))
        omega = J[3:] @ dq
        iw = iw + 0.5 * DT * (omega_prev + omega)
        omega_prev = omega
        u_prev = uk

        np.testing.assert_allclose(np.asarray(traj.q[k]), q, atol=1e-10)
        np.testing.assert_allclose(float(traj.phi[k]), phi, atol=1e-10)
        np.testing.assert_allclose(np.asarray(traj.p[k, :3]), np.asarray(kin.fk_pos(jnp.asarray(q))), atol=1e-9)
        np.testing.assert_allclose(np.asarray(traj.p[k, 3:]), iw, atol=1e-9)
        np.testing.assert_allclose(np.asarray(traj.v[k]), J @ dq, atol=1e-9)


def test_objective_and_constraints_finite(rng):
    params = make_params(rng)
    coeffs = jerkint.coeff_matrices(N, DT, dtype=jnp.float64)
    limits = kin.robot_limits()
    u = jnp.asarray(rng.normal(size=(N, 8)) * 0.1)
    f, c = ocp.objective_and_constraints(CFG, coeffs, params, u, limits)
    assert np.isfinite(float(f))
    assert np.all(np.isfinite(np.asarray(c)))
    # Nonlinear block first: N*5 entries
    assert c.shape[0] == N * 5 + 4 * N * 7 + 3 * N + 2 * N * 8

    # Differentiability of the full pipeline
    g = jax.grad(lambda uu: ocp.objective_and_constraints(CFG, coeffs, params, uu, limits)[0])(u)
    assert np.all(np.isfinite(np.asarray(g)))
