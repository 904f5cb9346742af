"""Unit-pin bench.py's profiler-trace parser (_trace_device_ms).

The driver-recorded `hbm_util_measured` / `device_ms_per_app` come from
this parser; its two sharp edges are locked here with a fabricated trace:
(1) the device process exports parallel "XLA Modules" and "XLA Ops" lanes
that EACH carry the full device time — summing both doubles the number
(the round-5 bug caught on TPU); only the Ops lane counts.
(2) per-op `bytes_accessed` args are summed for the utilization number.
"""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class _FakeProfiler:
    def __init__(self):
        self.dir = None

    def start_trace(self, tdir):
        self.dir = tdir

    def stop_trace(self):
        d = os.path.join(self.dir, "plugins", "profile", "run1")
        os.makedirs(d, exist_ok=True)
        events = [
            # lane metadata
            {"ph": "M", "name": "thread_name", "pid": 3, "tid": 2,
             "args": {"name": "XLA Modules"}},
            {"ph": "M", "name": "thread_name", "pid": 3, "tid": 3,
             "args": {"name": "XLA Ops"}},
            {"ph": "M", "name": "thread_name", "pid": 701, "tid": 9,
             "args": {"name": "python"}},
            # module lane: one 10 ms module event (must NOT be counted)
            {"ph": "X", "pid": 3, "tid": 2, "ts": 0, "dur": 10_000,
             "name": "jit_fwd", "args": {}},
            # ops lane: two ops totalling 10 ms, 8 GB
            {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 6_000,
             "name": "fusion.1", "args": {"bytes_accessed": 5e9}},
            {"ph": "X", "pid": 3, "tid": 3, "ts": 6_000, "dur": 4_000,
             "name": "fusion.2", "args": {"bytes_accessed": 3e9}},
            # host lane noise (must not be counted)
            {"ph": "X", "pid": 701, "tid": 9, "ts": 0, "dur": 50_000,
             "name": "python-dispatch", "args": {}},
        ]
        with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as fh:
            json.dump({"traceEvents": events}, fh)


class _FakeJax:
    profiler = _FakeProfiler()


def test_trace_parser_sums_ops_lane_only():
    out = bench._trace_device_ms(_FakeJax, lambda: None, chain=2)
    # 10 ms of ops over 2 chained apps -> 5 ms/app (NOT 10 from the
    # module lane, NOT 20 from summing both, NOT 60 with host events)
    assert out["device_ms_per_app"] == 5.0
    assert out["bytes_per_app_traced"] == 4e9  # 8 GB / 2 apps
    # utilization = bytes / device_time / peak BW
    expected = 8e9 / 0.010 / bench.V5E_HBM_BW
    assert abs(out["hbm_util_measured"] - round(expected, 4)) < 1e-9


def test_trace_parser_handles_missing_trace():
    class _NoTraceProfiler:
        def start_trace(self, tdir):
            self.dir = tdir

        def stop_trace(self):
            pass

    class _J:
        profiler = _NoTraceProfiler()

    assert bench._trace_device_ms(_J, lambda: None, chain=1) is None
