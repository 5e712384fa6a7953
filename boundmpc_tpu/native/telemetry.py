"""ctypes bindings for the native telemetry runtime (telemetry.cpp).

The sink is the host-side analog of the reference's /mpc/mpc_data channel
(bound_mpc_node.py:369-372 → Logger.py:93): the control loop pushes
fixed-size float records into a lock-free ring; a C++ writer thread drains
them to a binary log without ever blocking a tick.  Auto-builds the shared
library with `make` on first use if it is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Dict, List

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB = _DIR / "libboundmpc_telemetry.so"

_MAGIC = 0x424D5031
_HEADER_DTYPE = np.dtype(
    [("magic", "<u4"), ("version", "<u4"), ("record_floats", "<u4"),
     ("reserved", "<u4"), ("record_count", "<u8")]
)


def _load_lib() -> ctypes.CDLL:
    if not _LIB.exists():
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB))
    lib.bmpc_sink_create.restype = ctypes.c_void_p
    lib.bmpc_sink_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32]
    lib.bmpc_sink_push.restype = ctypes.c_int
    lib.bmpc_sink_push.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.bmpc_sink_push_batch.restype = ctypes.c_uint64
    lib.bmpc_sink_push_batch.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64]
    lib.bmpc_sink_flush.argtypes = [ctypes.c_void_p]
    lib.bmpc_sink_dropped.restype = ctypes.c_uint64
    lib.bmpc_sink_dropped.argtypes = [ctypes.c_void_p]
    lib.bmpc_sink_written.restype = ctypes.c_uint64
    lib.bmpc_sink_written.argtypes = [ctypes.c_void_p]
    lib.bmpc_sink_destroy.argtypes = [ctypes.c_void_p]
    return lib


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = _load_lib()
    return _lib


class TelemetrySink:
    """Non-blocking per-tick telemetry writer backed by the C++ ring."""

    def __init__(self, path: str | os.PathLike, fields: List[str],
                 capacity_log2: int = 14):
        self.fields = list(fields)
        self.record_floats = len(self.fields)
        self._lib = _get_lib()
        self._handle = self._lib.bmpc_sink_create(
            str(path).encode(), self.record_floats, capacity_log2
        )
        self._path = str(path)

    def push(self, record: np.ndarray) -> bool:
        rec = np.ascontiguousarray(record, dtype=np.float32)
        assert rec.size == self.record_floats
        ptr = rec.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return bool(self._lib.bmpc_sink_push(self._handle, ptr))

    def push_batch(self, records: np.ndarray) -> int:
        recs = np.ascontiguousarray(records, dtype=np.float32)
        assert recs.ndim == 2 and recs.shape[1] == self.record_floats
        ptr = recs.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return int(self._lib.bmpc_sink_push_batch(self._handle, ptr, recs.shape[0]))

    def flush(self):
        self._lib.bmpc_sink_flush(self._handle)

    @property
    def dropped(self) -> int:
        return int(self._lib.bmpc_sink_dropped(self._handle))

    @property
    def written(self) -> int:
        return int(self._lib.bmpc_sink_written(self._handle))

    def close(self):
        if self._handle is not None:
            self._lib.bmpc_sink_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_log(path: str | os.PathLike, fields: List[str] | None = None
             ) -> Dict[str, np.ndarray] | np.ndarray:
    """Read a telemetry log back; returns a dict by field name when field
    names are supplied, else the raw (records, floats) array."""
    raw = np.fromfile(path, dtype=np.uint8)
    header = raw[: _HEADER_DTYPE.itemsize].view(_HEADER_DTYPE)[0]
    assert header["magic"] == _MAGIC, "not a BMPC telemetry log"
    rf = int(header["record_floats"])
    body = raw[_HEADER_DTYPE.itemsize:].view(np.float32)
    n = body.size // rf
    data = body[: n * rf].reshape(n, rf)
    if fields is None:
        return data
    assert len(fields) == rf
    return {name: data[:, i].copy() for i, name in enumerate(fields)}
