"""Report generation from closed-loop telemetry (the Plotter analog).

Figure catalog mirrors the reference `Plotter/Plotter.py`:
  * orthogonal position/orientation errors inside their quartic bound
    envelopes vs path parameter (:249-413)
  * joint positions / velocities with limits (:445-520)
  * Cartesian path vs reference with via points (:522-600)
  * path parameter phi / dphi over time (:602-660)
  * computation time (semilog, 0.1 s real-time line, :414-445) and solver
    iterations (:436-445)
  * manipulability measure (:668-681)
  * npz export of every series (:683-756)

Errors are recomputed offline from logged states exactly like the reference
recomputes "true" errors from logged poses (:96-135): position error via the
window decomposition, orientation error as log(R_actual R_ref^T).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from .. import kinematics, lie  # noqa: E402
from ..bounds import quartic_eval, segment_bound_coeffs  # noqa: E402


@dataclass
class Report:
    outdir: str
    figures: Dict[str, str]
    timing: Dict[str, float]
    npz_path: str


def _bound_envelopes(path, phis):
    """Evaluate the 9-channel quartic bounds at each logged phi (host)."""
    seg_len = np.asarray(path.seg_len)
    acoef = np.asarray(
        segment_bound_coeffs(
            path.seg_len, path.asymm_lower, path.asymm_upper, path.s,
            path.e_p_min, path.e_r_min, path.e_p_max, path.e_r_max,
        )
    )  # (S, 9, 5)
    phi_start = np.asarray(path.phi_start)
    segs = np.clip(np.searchsorted(phi_start[1:-1], phis, side="right"), 0,
                   acoef.shape[0] - 1)
    local = phis - phi_start[segs]
    vals = np.stack(
        [np.asarray(quartic_eval(jnp.asarray(local), jnp.asarray(acoef[segs, ch])))
         for ch in range(9)], axis=-1,
    )  # (T, 9)
    return vals, segs


def _position_error_decomp(path, phis, segs, p_meas):
    """e_p in the window frame: (par, bp1, bp2) coordinates."""
    p0 = np.asarray(path.seg_p0)[segs]
    dp = np.asarray(path.seg_dp)[segs]
    bp1 = np.asarray(path.bp1)[segs]
    bp2 = np.asarray(path.bp2)[segs]
    phi_start = np.asarray(path.phi_start)[segs]
    p_d = p0 + dp * (phis - phi_start)[:, None]
    e = p_meas - p_d
    return (
        np.einsum("ti,ti->t", e, dp),
        np.einsum("ti,ti->t", e, bp1),
        np.einsum("ti,ti->t", e, bp2),
        p_d,
    )


def _orientation_error(p_meas_rot, pr_ref):
    """True rotation error rotvec: log(R_c R_d^T) (Plotter.py:96-135)."""
    Rc = np.asarray(lie.rotvec_to_matrix(jnp.asarray(p_meas_rot)))
    Rd = np.asarray(lie.rotvec_to_matrix(jnp.asarray(pr_ref)))
    return np.asarray(
        lie.matrix_to_rotvec(jnp.asarray(Rc @ np.transpose(Rd, (0, 2, 1))))
    )


def generate_report(log, runner, outdir: str, tail: str = "run") -> Report:
    """Render the figure catalog + npz export for a RunLog."""
    os.makedirs(outdir, exist_ok=True)
    figures = {}
    arrays = log.arrays()
    t = arrays["t"]
    phis = arrays["phi"]
    q = arrays["q"]
    dq = arrays["dq"]
    # Recompute the pose from the POST-tick joints: log.p is the pose
    # measured at tick START (Logger semantics), while log.phi/pr_ref are
    # post-tick — pairing them directly puts a half-tick phase error into
    # the bound audit, which near segment crossings (steep quartic slopes)
    # looks like multi-millimeter violations that never happened.
    p = np.asarray(jax.vmap(kinematics.fk_pose)(jnp.asarray(q)))
    path = runner.path

    bounds, segs = _bound_envelopes(path, phis)
    e_par, e_b1, e_b2, p_d = _position_error_decomp(path, phis, segs, p[:, :3])
    e_r = _orientation_error(p[:, 3:], arrays["pr_ref"])
    br1 = np.asarray(path.br1)[segs]
    br2 = np.asarray(path.br2)[segs]
    dr_u = np.asarray(path.seg_dr_unit)[segs]
    er_b1 = np.einsum("ti,ti->t", e_r, br1)
    er_b2 = np.einsum("ti,ti->t", e_r, br2)
    er_par = np.einsum("ti,ti->t", e_r, dr_u)

    def save(fig, name):
        fp = os.path.join(outdir, f"{name}_{tail}.png")
        fig.savefig(fp, dpi=110, bbox_inches="tight")
        plt.close(fig)
        figures[name] = fp

    # 1. Position errors in the bound envelopes
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    for ax, (ei, lo, hi, lbl) in zip(axes, [
        (e_b1, bounds[:, 2], bounds[:, 0], "bp1"),
        (e_b2, bounds[:, 3], bounds[:, 1], "bp2"),
    ]):
        ax.plot(phis, ei, label=f"e_p·{lbl}")
        ax.plot(phis, lo, "r--", lw=0.8, label="bounds")
        ax.plot(phis, hi, "r--", lw=0.8)
        ax.set_ylabel(f"{lbl} error [m]")
        ax.legend(loc="upper right", fontsize=8)
    axes[-1].set_xlabel("path parameter φ")
    fig.suptitle("Orthogonal position errors vs quartic bounds")
    save(fig, "position_errors")

    # 2. Orientation errors in the bound envelopes
    fig, axes = plt.subplots(3, 1, figsize=(8, 8), sharex=True)
    for ax, (ei, lo, hi, lbl) in zip(axes, [
        (er_b1, bounds[:, 6], bounds[:, 4], "br1"),
        (er_b2, bounds[:, 7], bounds[:, 5], "br2"),
        (er_par, -bounds[:, 8], bounds[:, 8], "tangential"),
    ]):
        ax.plot(phis, ei, label=f"e_r·{lbl}")
        ax.plot(phis, lo, "r--", lw=0.8)
        ax.plot(phis, hi, "r--", lw=0.8)
        ax.set_ylabel(f"{lbl} [rad]")
        ax.legend(loc="upper right", fontsize=8)
    axes[-1].set_xlabel("path parameter φ")
    fig.suptitle("Orientation errors vs quartic bounds")
    save(fig, "orientation_errors")

    # 3. Joint states with limits
    lims = kinematics.robot_limits()
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    axes[0].plot(t, q)
    for v in np.asarray(lims.q_upper):
        axes[0].axhline(v, color="r", ls=":", lw=0.5)
        axes[0].axhline(-v, color="r", ls=":", lw=0.5)
    axes[0].set_ylabel("q [rad]")
    axes[1].plot(t, dq)
    for v in np.asarray(lims.dq_upper):
        axes[1].axhline(v, color="r", ls=":", lw=0.5)
        axes[1].axhline(-v, color="r", ls=":", lw=0.5)
    axes[1].set_ylabel("dq [rad/s]")
    axes[1].set_xlabel("t [s]")
    fig.suptitle("Joint positions / velocities with limits")
    save(fig, "joints")

    # 4. Cartesian path vs reference
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot(p[:, 0], p[:, 1], p[:, 2], label="EE path")
    ax.plot(p_d[:, 0], p_d[:, 1], p_d[:, 2], "--", label="reference")
    n_real = int(path.n_real)
    vias = np.asarray(path.seg_p0)[: n_real + 1]
    ax.scatter(vias[:, 0], vias[:, 1], vias[:, 2], c="k", marker="o", s=25,
               label="via points")
    ax.legend()
    fig.suptitle("Cartesian end-effector path")
    save(fig, "cartesian")

    # 5. Path parameter
    fig, axes = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    axes[0].plot(t, phis)
    axes[0].axhline(runner.phi_max, color="k", ls="--", lw=0.8)
    axes[0].set_ylabel("φ")
    axes[1].plot(t, arrays["dphi"])
    axes[1].set_ylabel("dφ")
    axes[1].set_xlabel("t [s]")
    fig.suptitle("Path parameter evolution")
    save(fig, "phi")

    # 6. Timing + iterations (reference real-time line at dt)
    fig, axes = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    axes[0].semilogy(t, arrays["t_comp"], ".-")
    axes[0].axhline(runner.cfg.dt, color="r", ls="--", label=f"{runner.cfg.dt}s budget")
    axes[0].set_ylabel("t_comp [s]")
    axes[0].legend(fontsize=8)
    axes[1].plot(t, arrays["iters"], ".-")
    axes[1].set_ylabel("solver iters")
    axes[1].set_xlabel("t [s]")
    save(fig, "timing")

    # 7. Manipulability / condition number / ellipsoid volume
    # (Plotter.py:668-681): three measures of the Jacobian's conditioning.
    manip = np.asarray(
        jnp.stack([kinematics.manipulability(jnp.asarray(qi)) for qi in q])
    )
    J_all = np.asarray(jnp.stack([kinematics.jacobian(jnp.asarray(qi))
                                  for qi in q]))
    svals = np.linalg.svd(J_all, compute_uv=False)  # (T, 6)
    cond = svals[:, 0] / np.maximum(svals[:, -1], 1e-12)
    ellipsoid_volume = np.prod(svals, axis=1)
    fig, axes = plt.subplots(3, 1, figsize=(8, 7), sharex=True)
    axes[0].semilogy(t, ellipsoid_volume, label="ellipsoid volume")
    axes[1].semilogy(t, cond, label="condition number")
    axes[2].plot(t, manip, label="manipulability")
    for ax in axes:
        ax.legend(fontsize=8)
    axes[-1].set_xlabel("t [s]")
    fig.suptitle("Manipulability measures")
    save(fig, "manipulability")

    # 8. Lie-linearization approximation error (Plotter.py:240-335):
    # per-horizon-stage statistics of |true - linearized| plane rotation
    # errors — the regression oracle for the orientation linearization.
    approx_error = None
    if len(getattr(log, "horizon_e_r_lin", [])):
        er_lin = arrays["horizon_e_r_lin"]  # (T, N, 3)
        er_true = arrays["horizon_e_r_true"]
        approx_error = er_true - er_lin
        abs_err_deg = np.abs(approx_error) * 180.0 / np.pi
        stage_mean = abs_err_deg.mean(axis=0)  # (N, 3)
        stage_max = abs_err_deg.max(axis=0)
        fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
        stages = np.arange(stage_mean.shape[0])
        for ch, lbl in enumerate(["orth1", "orth2", "par"]):
            axes[0].plot(stages, stage_mean[:, ch], ".-", label=lbl)
            axes[1].plot(stages, stage_max[:, ch], ".-", label=lbl)
        axes[0].set_ylabel("mean |err| [deg]")
        axes[1].set_ylabel("max |err| [deg]")
        axes[1].set_xlabel("horizon stage")
        axes[0].legend(fontsize=8)
        fig.suptitle("Orientation linearization approximation error")
        save(fig, "approx_error")

    # 9. Derivative cross-check (Plotter.py:456-463, 490-494): the MPC's
    # COMPUTED error derivatives vs NUMERICAL differentiation of the logged
    # error series — the regression oracle for the error linearization.
    if len(getattr(log, "de_p", [])):
        dt_s = float(np.median(np.diff(t))) if len(t) > 1 else runner.cfg.dt
        fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
        for ax, (e_ser, de_ser, unit) in zip(axes, [
            (arrays["e_p"], arrays["de_p"], "m/s"),
            (arrays["e_r"], arrays["de_r"], "rad/s"),
        ]):
            num = np.gradient(e_ser, dt_s, axis=0)  # (T, 3)
            for ch, c in zip(range(3), ["C0", "C1", "C2"]):
                ax.plot(t, de_ser[:, ch], c, lw=1.0,
                        label=f"computed [{ch}]" if ch == 0 else None)
                ax.plot(t, num[:, ch], c + "--", lw=0.8,
                        label=f"numeric d/dt [{ch}]" if ch == 0 else None)
            ax.set_ylabel(f"de [{unit}]")
            ax.legend(fontsize=8)
        axes[0].set_title("position error derivative")
        axes[1].set_title("orientation error derivative")
        axes[-1].set_xlabel("t [s]")
        fig.suptitle("Computed vs numerically differentiated error derivatives")
        save(fig, "error_derivatives")

    # 10. Joint acceleration / jerk with limits (the reference's joint
    # dynamics horizon figures; jerk limit RobotModel.py:42-43).
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    axes[0].plot(t, arrays["ddq"])
    axes[0].set_ylabel("ddq [rad/s²]")
    axes[1].plot(t, arrays["jerk"])
    for vlim in np.unique(np.atleast_1d(np.asarray(lims.u_max)).ravel()[:7]):
        axes[1].axhline(vlim, color="r", ls=":", lw=0.5)
        axes[1].axhline(-vlim, color="r", ls=":", lw=0.5)
    axes[1].set_ylabel("dddq [rad/s³]")
    axes[1].set_xlabel("t [s]")
    fig.suptitle("Joint accelerations / jerks with limits")
    save(fig, "joint_dynamics")

    timing = {
        "t_comp_min": float(np.min(arrays["t_comp"])),
        "t_comp_max": float(np.max(arrays["t_comp"])),
        "t_comp_avg": float(np.mean(arrays["t_comp"])),
        "t_comp_p99": float(np.percentile(arrays["t_comp"], 99)),
    }

    # Bound-corner rectangles in global coordinates, projected onto the
    # principal planes (Plotter.py:689-706 + util_functions.
    # project_position_bounds :102-132) — the npz payload downstream paper
    # figures consume.
    lo1, lo2 = bounds[:, 2], bounds[:, 3]
    up1, up2 = bounds[:, 0], bounds[:, 1]
    bp1_t = np.asarray(path.bp1)[segs]
    bp2_t = np.asarray(path.bp2)[segs]
    corners = np.stack([
        lo1[:, None] * bp1_t + lo2[:, None] * bp2_t,
        lo1[:, None] * bp1_t + up2[:, None] * bp2_t,
        up1[:, None] * bp1_t + lo2[:, None] * bp2_t,
        up1[:, None] * bp1_t + up2[:, None] * bp2_t,
    ], axis=1)  # (T, 4, 3)
    dp_t = np.asarray(path.seg_dp)[segs]

    def project_bounds(pidx):
        vi = dp_t[:, pidx]
        vi = vi / np.maximum(np.linalg.norm(vi, axis=1, keepdims=True), 1e-12)
        v_orth = np.stack([vi[:, 1], -vi[:, 0]], axis=1)  # (T, 2)
        proj = np.einsum("tck,tk->tc", corners[:, :, pidx], v_orth)  # (T, 4)
        p_lo = proj.min(axis=1)[:, None] * v_orth + p_d[:, pidx]
        p_up = proj.max(axis=1)[:, None] * v_orth + p_d[:, pidx]
        return p_lo, p_up

    pl_xy, pu_xy = project_bounds([0, 1])
    pl_xz, pu_xz = project_bounds([0, 2])
    pl_zy, pu_zy = project_bounds([1, 2])

    extra = {}
    if approx_error is not None:
        extra["approx_error"] = approx_error

    npz_path = os.path.join(outdir, f"data_{tail}.npz")
    # `audit_*` keys are the report's OFFLINE recomputation (the Plotter's
    # "true error" pass); same-named raw keys from RunLog.arrays() are the
    # MPC's own in-loop values.
    np.savez_compressed(
        npz_path, **arrays,
        e_p_b1=e_b1, e_p_b2=e_b2, audit_e_p_par=e_par,
        e_r_b1=er_b1, e_r_b2=er_b2, audit_e_r_par=er_par,
        bounds=bounds, audit_p_ref=p_d,
        bound_corners=corners,
        bound_pl_proj_xy=pl_xy, bound_pu_proj_xy=pu_xy,
        bound_pl_proj_xz=pl_xz, bound_pu_proj_xz=pu_xz,
        bound_pl_proj_zy=pl_zy, bound_pu_proj_zy=pu_zy,
        manipulability=manip, condition_number=cond,
        ellipsoid_volume=ellipsoid_volume,
        **extra,
    )
    return Report(outdir=outdir, figures=figures, timing=timing, npz_path=npz_path)
