"""Metrics and profiling utilities."""

import os
import time

from facekit.utils import LatencyTracker, profile_trace


def test_latency_tracker_percentiles():
    t = LatencyTracker()
    for ms in (1, 2, 3, 4, 100):
        t.observe("x", ms / 1e3)
    snap = t.snapshot()["x"]
    assert snap["count"] == 5
    assert snap["p50_ms"] == 3.0
    assert snap["p99_ms"] == 100.0
    assert 20 < snap["mean_ms"] < 23


def test_latency_tracker_context():
    t = LatencyTracker()
    with t.time("op", count=4):
        time.sleep(0.01)
    snap = t.snapshot()["op"]
    assert snap["count"] == 4
    assert snap["p50_ms"] >= 10


def test_profile_trace_writes(tmp_path):
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with profile_trace(logdir):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, _dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "no trace files written"
