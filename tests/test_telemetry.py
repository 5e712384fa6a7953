"""Native telemetry ring buffer: round-trip, batching, non-blocking drops."""
import os
import tempfile

import numpy as np
import pytest

native = pytest.importorskip("boundmpc_tpu.native.telemetry")


def test_roundtrip(tmp_path):
    path = tmp_path / "log.bmpc"
    fields = ["t", "phi", "viol", "iters", "q0"]
    with native.TelemetrySink(path, fields) as s:
        recs = np.stack(
            [np.array([k, k * 0.5, 1e-6, 10, 0.1], dtype=np.float32) for k in range(500)]
        )
        for r in recs[:100]:
            assert s.push(r)
        assert s.push_batch(recs[100:]) == 400
        s.flush()
        assert s.written == 500
        assert s.dropped == 0
    data = native.read_log(path, fields)
    np.testing.assert_allclose(data["t"], np.arange(500, dtype=np.float32))
    np.testing.assert_allclose(data["phi"], 0.5 * np.arange(500, dtype=np.float32))


def test_header_and_raw_read(tmp_path):
    path = tmp_path / "log2.bmpc"
    with native.TelemetrySink(path, ["a", "b"]) as s:
        s.push(np.array([1.0, 2.0], dtype=np.float32))
        s.flush()
    raw = native.read_log(path)
    assert raw.shape == (1, 2)
    np.testing.assert_allclose(raw[0], [1.0, 2.0])
