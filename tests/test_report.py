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
                "phi", "timing", "manipulability", "approx_error"}
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
