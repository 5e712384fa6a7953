"""Host runtime: scenario construction, closed-loop runners, telemetry.

Replaces the reference's ROS2 node / experiment-runner / Logger plumbing
(`nodes/bound_mpc_node.py`, `nodes/experiment{1,2}_runner.py`,
`Logger/Logger.py`) with an in-process Python API (SURVEY.md §5.8): the
service round-trips become function calls, the telemetry topic becomes a
stacked-pytree log.
"""
import os as _os

import jax as _jax


def enable_compilation_cache(path: str = "/tmp/boundmpc_xla_cache") -> None:
    """Persistent XLA compilation cache — the analog of the reference's
    pre-compiled solver artifacts (`mpc{N}_segs{nr_segs}.so`,
    BoundMPC.py:155-161): one compiled executable per (N, nr_segs, batch)
    survives process restarts."""
    _os.makedirs(path, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", path)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from .scenarios import (Scenario, experiment1, experiment2, default_weights,  # noqa: F401,E402
                        default_path, random_scenario)
from .runner import ClosedLoopRunner, RunLog  # noqa: F401,E402
from .fleet import FleetRunner, FleetStats  # noqa: F401,E402
