"""Host runtime: scenario construction, closed-loop runners, telemetry.

Replaces the reference's ROS2 node / experiment-runner / Logger plumbing
(`nodes/bound_mpc_node.py`, `nodes/experiment{1,2}_runner.py`,
`Logger/Logger.py`) with an in-process Python API (SURVEY.md §5.8): the
service round-trips become function calls, the telemetry topic becomes a
stacked-pytree log.
"""
from .scenarios import Scenario, experiment1, experiment2, default_weights, random_scenario  # noqa: F401
from .runner import ClosedLoopRunner, RunLog  # noqa: F401
from .fleet import FleetRunner, FleetStats  # noqa: F401
