"""Read-only access to the reference implementation as a numeric test oracle.

The reference at /root/reference is CasADi-based; casadi is not installed in
this environment.  Its numpy code paths only need a handful of elementwise
casadi functions, so we install a minimal numpy-backed stub before importing.
Nothing from the reference is copied into the framework — these imports exist
solely so tests can compare against the reference's numeric outputs.
"""
import sys
import types

import numpy as np


def _install_casadi_stub():
    if "casadi" in sys.modules:
        return
    stub = types.ModuleType("casadi")
    stub.sin = np.sin
    stub.cos = np.cos
    stub.sqrt = np.sqrt
    stub.acos = np.arccos
    stub.exp = np.exp
    stub.norm_2 = np.linalg.norm
    stub.dot = lambda a, b: np.dot(np.asarray(a).flatten(), np.asarray(b).flatten())
    stub.sumsqr = lambda a: float(np.sum(np.square(a)))
    stub.if_else = lambda c, a, b: a if c else b
    stub.vertcat = lambda *xs: np.concatenate(
        [np.atleast_1d(np.asarray(x, dtype=float)).flatten() for x in xs]
    )
    stub.DM = np.ndarray

    class _SymUnavailable:
        def __getattr__(self, name):
            raise RuntimeError("symbolic casadi path not available in tests")

        @staticmethod
        def zeros(*a):
            raise RuntimeError("symbolic casadi path not available in tests")

    stub.SX = _SymUnavailable()
    stub.MX = _SymUnavailable()
    sys.modules["casadi"] = stub


def _install_ros_stubs():
    """The reference's utils package pulls in ROS message types at import
    time; stub just enough for the pure-math modules to import."""
    if "sensor_msgs" in sys.modules:
        return

    class _Msg:
        def __init__(self, *a, **k):
            pass

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs_msg.JointState = _Msg
    sensor_msgs.msg = sensor_msgs_msg
    sys.modules["sensor_msgs"] = sensor_msgs
    sys.modules["sensor_msgs.msg"] = sensor_msgs_msg

    bmm = types.ModuleType("bound_mpc_msg")
    bmm_msg = types.ModuleType("bound_mpc_msg.msg")
    bmm_msg.Vector = _Msg
    bmm_srv = types.ModuleType("bound_mpc_msg.srv")
    bmm_srv_traj = types.ModuleType("bound_mpc_msg.srv._trajectory")
    bmm_srv_traj.Trajectory_Request = _Msg
    bmm.msg = bmm_msg
    bmm.srv = bmm_srv
    sys.modules["bound_mpc_msg"] = bmm
    sys.modules["bound_mpc_msg.msg"] = bmm_msg
    sys.modules["bound_mpc_msg.srv"] = bmm_srv
    sys.modules["bound_mpc_msg.srv._trajectory"] = bmm_srv_traj


_install_casadi_stub()
_install_ros_stubs()
if "/root/reference/bound_mpc" not in sys.path:
    sys.path.insert(0, "/root/reference/bound_mpc")

from bound_mpc.RobotModel.RobotModel import RobotModel  # noqa: E402
from bound_mpc.ReferencePath.ReferencePath import ReferencePath  # noqa: E402
from bound_mpc.BoundMPC import jerk_trajectory_casadi as ref_jerk  # noqa: E402
from bound_mpc.BoundMPC import mpc_utils_casadi as ref_mpc_utils  # noqa: E402
from bound_mpc.utils import lie_functions as ref_lie  # noqa: E402
from bound_mpc.utils import util_functions as ref_util  # noqa: E402
from bound_mpc.BoundMPC import bound_mpc_functions as ref_funcs  # noqa: E402
from bound_mpc.BoundMPC.BoundMPC import BoundMPC as BoundMPCClass  # noqa: E402

__all__ = [
    "RobotModel",
    "ReferencePath",
    "ref_jerk",
    "ref_mpc_utils",
    "ref_lie",
    "ref_util",
    "ref_funcs",
    "BoundMPCClass",
]
