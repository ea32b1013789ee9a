"""Profiler attribution (utils/profile_tools.py): synthetic-xplane golden test
plus a real jax.profiler trace round-trip on CPU."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.utils.profile_tools import (
    attribute, attribute_trace, bucket_of, format_table, parse_xplane,
)

xplane_pb2 = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")


def _write_synthetic_trace(tmp_path, steps_ms):
    """One TPU-style device plane with an 'XLA Ops' line."""
    space = xplane_pb2.XSpace()
    plane = space.planes.add()
    plane.name = "/device:TPU:0"
    line = plane.lines.add()
    line.name = "XLA Ops"
    for i, (name, ms, count) in enumerate(steps_ms):
        mid = i + 1
        plane.event_metadata[mid].id = mid
        plane.event_metadata[mid].name = name
        ev = line.events.add()
        ev.metadata_id = mid
        ev.duration_ps = int(ms * 1e9)
        ev.num_occurrences = count
    sess = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    sess.mkdir(parents=True)
    path = sess / "host.xplane.pb"
    path.write_bytes(space.SerializeToString())
    return str(tmp_path)


def test_bucket_rules():
    assert bucket_of("fused_flash_fwd custom-call.7") == "attention kernels"
    assert bucket_of("convert_reduce_fusion.12") == "LN reductions"
    assert bucket_of("copy.3") == "copies/layout"
    assert bucket_of("fusion.99") == "matmul fusions"
    assert bucket_of("all-reduce.1") == "collectives"
    assert bucket_of("iota.2") == "misc"


def test_synthetic_attribution(tmp_path):
    trace = _write_synthetic_trace(tmp_path, [
        ("flash_bwd custom-call.1", 90.0, 8),
        ("fusion.10", 66.0, 24),
        ("convert_reduce_fusion.2", 40.0, 40),
        ("copy.5", 14.0, 4),
        ("iota.1", 4.0, 1),
    ])
    table = attribute_trace(trace, steps=2)
    assert np.isclose(table["attention kernels"]["ms_per_step"], 45.0)
    assert np.isclose(table["matmul fusions"]["ms_per_step"], 33.0)
    assert np.isclose(table["LN reductions"]["ms_per_step"], 20.0)
    assert np.isclose(table["__total__"]["ms_per_step"], 107.0)
    # buckets come out sorted by cost
    order = [k for k in table if k != "__total__"]
    assert order[0] == "attention kernels"
    txt = format_table(table)
    assert "attention kernels" in txt and "TOTAL" in txt
    # per-op drill-down survives
    assert table["attention kernels"]["top_ops"][0][0].startswith("flash_bwd")


def test_parse_xplane_filters_planes(tmp_path):
    trace = _write_synthetic_trace(tmp_path, [("fusion.1", 10.0, 1)])
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(trace) for f in fs]
    ops = parse_xplane(files[0], line_name="XLA Ops", plane_prefix="/device:")
    assert ops == {"fusion.1": (10.0, 1)}
    assert parse_xplane(files[0], plane_prefix="/host:") == {}


def test_real_cpu_trace_roundtrip(tmp_path):
    """A real jax.profiler trace parses and yields a non-empty table via the
    all-lines fallback (CPU traces have no 'XLA Ops' device line)."""
    trace_dir = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((256, 256))
    float(f(x))  # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        y = f(x)
    float(y)
    jax.profiler.stop_trace()
    table = attribute_trace(trace_dir, steps=3)
    assert table["__total__"]["ms_per_step"] > 0
