"""Tests for the device-trace attribution utility (utils/profiling.py) on a
synthetic profiler trace (the real-trace path is exercised on hardware by
benchmarks/trace_step.py)."""

import gzip
import json

import pytest

from voicebox_tpu.utils.profiling import (
    format_attribution,
    parse_device_trace,
)


def _write_trace(tmp_path, events):
    p = tmp_path / "plugins" / "profile" / "run1"
    p.mkdir(parents=True)
    with gzip.open(p / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


@pytest.fixture
def trace_dir(tmp_path):
    meta = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "python host"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},  # host-side thread: must be ignored
    ]
    ops = [
        # 2 calls of a matmul fusion: 0.5 ms each, 2 GFLOP each
        {"ph": "X", "pid": 1, "tid": 2, "name": "dot.1", "dur": 500,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "2000000000",
                  "raw_bytes_accessed": "1000000"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "dot.1", "dur": 500,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "2000000000",
                  "raw_bytes_accessed": "1000000"}},
        # an elementwise fusion: 1 ms, 8 MB
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.7", "dur": 1000,
         "args": {"hlo_category": "loop fusion",
                  "raw_bytes_accessed": "8000000",
                  "source": "models/transformer.py:367"}},
        # outer while op double-counts its body: excluded
        {"ph": "X", "pid": 1, "tid": 2, "name": "while.3", "dur": 2000,
         "args": {"hlo_category": "while"}},
        # host-side event on the wrong pid: excluded
        {"ph": "X", "pid": 9, "tid": 1, "name": "host.1", "dur": 9999,
         "args": {"hlo_category": "loop fusion"}},
    ]
    return _write_trace(tmp_path, meta + ops)


class TestParseDeviceTrace:
    def test_categories_and_exclusions(self, trace_dir):
        cats, ops = parse_device_trace(trace_dir)
        assert cats == {"convolution fusion": 1.0, "loop fusion": 1.0}
        assert set(ops) == {"dot.1", "fusion.7"}  # while + host excluded

    def test_op_stats_rates(self, trace_dir):
        _, ops = parse_device_trace(trace_dir)
        dot = ops["dot.1"]
        assert dot.calls == 2 and dot.duration_ms == pytest.approx(1.0)
        # 2 calls x 2 GFLOP in 1 ms = 4 TF/s
        assert dot.tflops_per_s == pytest.approx(4.0)
        # 2 calls x 1 MB in 1 ms = 2 GB/s
        assert dot.gbytes_per_s == pytest.approx(2.0)
        fus = ops["fusion.7"]
        assert fus.gbytes_per_s == pytest.approx(8.0)
        assert fus.tflops_per_s is None
        assert "transformer.py" in fus.source

    def test_format_attribution(self, trace_dir):
        cats, ops = parse_device_trace(trace_dir)
        text = format_attribution(cats, ops, steps=2)
        assert "convolution fusion" in text and "loop fusion" in text
        assert "1.00 ms/step" in text  # 2 ms total / 2 steps
        assert "dot.1" in text and "TF/s" in text

    def test_missing_trace_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            parse_device_trace(str(tmp_path))

    def test_cpu_trace_rejected_with_clear_error(self, tmp_path):
        # CPU-backend traces record host threads only (no 'XLA Ops')
        events = [
            {"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "/host:CPU"}},
            {"ph": "M", "pid": 1, "tid": 1, "name": "thread_name",
             "args": {"name": "python"}},
        ]
        d = _write_trace(tmp_path, events)
        with pytest.raises(ValueError, match="TPU"):
            parse_device_trace(d)
