"""boundmpc_tpu — TPU-native Cartesian path-following MPC framework.

A from-scratch JAX / XLA / Pallas re-design with the capabilities of the
BoundMPC reference (joint-space OCP with Cartesian error bounds for a 7-DOF
manipulator): kinematics, Lie-space path errors, quartic bound envelopes, a
batched relaxed-barrier Gauss-Newton solver, a receding-horizon engine, and
scenario-parallel scaling over TPU device meshes.
"""

__version__ = "0.1.0"

from . import lie, kinematics, jerkint, bounds, path, ocp, solver, engine  # noqa: F401
from . import jacobian, batch  # noqa: F401
from .api import BoundMPC, MPCParams  # noqa: F401
