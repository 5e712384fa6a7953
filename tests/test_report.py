"""Observability report generation smoke test."""
import os

import numpy as np

from boundmpc_tpu.observability import generate_report
from boundmpc_tpu.runtime import ClosedLoopRunner, experiment1


def test_report_generation(tmp_path):
    r = ClosedLoopRunner(experiment1())
    log = r.run(max_ticks=8)
    rep = generate_report(log, r, str(tmp_path), tail="t")
    expected = {"position_errors", "orientation_errors", "joints", "cartesian",
                "phi", "timing", "manipulability", "approx_error",
                "error_derivatives", "joint_dynamics"}
    assert expected == set(rep.figures)
    for f in rep.figures.values():
        assert os.path.exists(f) and os.path.getsize(f) > 1000
    assert os.path.exists(rep.npz_path)
    data = np.load(rep.npz_path)
    assert "e_p_b1" in data and "bounds" in data
    # reference npz parity extras (Plotter.py:683-756)
    for key in ("bound_pl_proj_xy", "bound_pu_proj_xz",
                "condition_number", "approx_error"):
        assert key in data, key
    assert rep.timing["t_comp_avg"] > 0
    # Logger-grade series present in the export (Logger.py:30-91 analog)
    for key in ("e_p", "de_p", "e_r", "de_r", "horizon_dddq", "t_loop",
                "t_overhead", "audit_e_p_par"):
        assert key in data, key
    # Derivative cross-check as a regression oracle (Plotter.py:456-463):
    # the numerically differentiated logged e_p must track the MPC's
    # computed de_p (interior points; the closed loop is smooth here).
    e_p = np.asarray(data["e_p"])
    de_p = np.asarray(data["de_p"])
    dt = float(np.median(np.diff(np.asarray(data["t"]))))
    num = np.gradient(e_p, dt, axis=0)
    err = np.abs(num[1:-1] - de_p[1:-1])
    assert np.median(err) < 5e-3, f"derivative cross-check off: {np.median(err)}"
