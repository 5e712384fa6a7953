"""MPCData-grade native telemetry: horizon payload round-trip + report.

Reference analog: /mpc/mpc_data publishing (nodes/bound_mpc_node.py:169-290)
-> Logger accumulation (Logger/Logger.py:30-91) -> Plotter.  Here: fleet ->
native sink -> runlog_from_telemetry -> generate_report, with NO access to
the in-process RunLog.
"""
import os

import numpy as np

from boundmpc_tpu import ocp, solver as solver_mod
from boundmpc_tpu.runtime import FleetRunner, experiment1, random_scenario
from boundmpc_tpu.runtime.mpcdata import (read_mpcdata, record_floats,
                                          report_from_telemetry,
                                          runlog_from_telemetry)


def test_mpcdata_roundtrip_and_report(tmp_path):
    rng = np.random.default_rng(5)
    scs = [experiment1(), random_scenario(rng)]
    mpc_path = str(tmp_path / "mpcdata.bin")
    f = FleetRunner(scs, solver_cfg=solver_mod.RUNTIME_F32,
                    mpcdata_path=mpc_path)
    stats = f.run(ticks=6)
    f.close()
    assert stats.success_rate == 1.0

    cfg = ocp.OcpConfig()
    d = read_mpcdata(mpc_path, cfg)
    B, T = 2, 6
    assert d["tick"].shape == (B * T,)
    assert d["hq"].shape == (B * T, cfg.N, 7)
    assert d["he_p"].shape == (B * T, cfg.N, 3)
    assert d["hbound_lower"].shape == (B * T, cfg.N, 4)
    # success recorded for every lane-tick of a healthy fleet
    assert d["success"].all()
    # horizon phi must be non-decreasing along the horizon for each record
    assert (np.diff(d["hphi"], axis=1) > -1e-6).all()

    # Logger-equivalent reconstruction for scenario 0
    log = runlog_from_telemetry(mpc_path, cfg, scenario=0)
    assert len(log.phi) == T
    assert np.all(np.diff(log.phi) > -1e-9)
    assert log.horizon_q[0].shape == (cfg.N, 7)

    # Full report from the binary log alone
    rep = report_from_telemetry(mpc_path, scs[0], str(tmp_path / "rep"))
    for name in ("position_errors", "orientation_errors", "joints",
                 "error_derivatives", "joint_dynamics"):
        assert name in rep.figures
        assert os.path.getsize(rep.figures[name]) > 1000
    assert os.path.exists(rep.npz_path)
