"""Parity harness: independent golden solver for the BoundMPC OCP.

SURVEY.md §4 calls for an Ipopt oracle; CasADi/Ipopt are not installable in
this environment, so the oracle is scipy's SLSQP run in float64 on the same
condensed NLP (whose residuals/constraints are themselves validated
term-by-term against the reference's numpy code paths in tests/test_ocp.py).
Closed-loop trajectories from the TPU solver are compared against
oracle-driven closed loops in tests/test_parity.py.
"""
from .oracle import OracleSolver, oracle_runner  # noqa: F401
