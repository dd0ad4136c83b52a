"""XPlane trace parser (utils/xplane.py) — wire-format + live-trace tests."""
import tempfile

import jax
import jax.numpy as jnp
import pytest

from istvt_tpu.utils import xplane


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload: bytes) -> bytes:
    key = _varint((num << 3) | wt)
    if wt == 2:
        return key + _varint(len(payload)) + payload
    return key + payload


def _msg(num: int, payload: bytes) -> bytes:
    return _field(num, 2, payload)


def _hand_encoded_space() -> bytes:
    # XEventMetadata {id=7, name="ln_ff_bwd.3"} inside a map entry
    meta = _field(1, 0, _varint(7)) + _msg(2, b"ln_ff_bwd.3")
    entry = _field(1, 0, _varint(7)) + _msg(2, meta)
    # two events of metadata 7: durations 2000 ps and 1000 ps
    ev1 = _field(1, 0, _varint(7)) + _field(2, 0, _varint(10)) + \
        _field(3, 0, _varint(2000))
    ev2 = _field(1, 0, _varint(7)) + _field(2, 0, _varint(50)) + \
        _field(3, 0, _varint(1000))
    line = _msg(2, b"XLA Ops") + _field(3, 0, _varint(123)) + \
        _msg(4, ev1) + _msg(4, ev2)
    plane = _msg(2, b"/device:TPU:0") + _msg(3, line) + _msg(4, entry)
    return _msg(1, plane)


def test_wire_roundtrip():
    planes = xplane.parse_bytes(_hand_encoded_space())
    assert len(planes) == 1
    p = planes[0]
    assert p.name == "/device:TPU:0"
    assert len(p.lines) == 1 and p.lines[0].name == "XLA Ops"
    evs = p.lines[0].events
    assert [e.name for e in evs] == ["ln_ff_bwd.3", "ln_ff_bwd.3"]
    assert [e.duration_ps for e in evs] == [2000, 1000]


def test_aggregate_groups_by_prefix_and_flags_async():
    planes = xplane.parse_bytes(_hand_encoded_space())
    rows = xplane.aggregate(planes, plane_filter="TPU")
    assert len(rows) == 1
    r = rows[0]
    assert r.prefix == "ln_ff_bwd" and r.count == 2
    assert r.total_ms == pytest.approx(3e-6)
    assert not r.asynchronous
    # async markers are split out, never merged into busy rows
    assert xplane.hlo_prefix("fusion.1203") == "fusion"
    assert xplane.hlo_prefix("dynamic-slice-start.4") == "dynamic-slice-start"
    table = xplane.format_table(rows)
    assert "ln_ff_bwd" in table and "busy" in table


def test_live_trace_parses():
    """jax.profiler -> .xplane.pb -> named events come back out."""
    d = tempfile.mkdtemp()
    f = jax.jit(lambda a, b: (a @ b).sum())
    a = jnp.ones((64, 64))
    float(f(a, a))  # compile outside the trace
    jax.profiler.start_trace(d)
    float(f(a, a))
    jax.profiler.stop_trace()
    traces = xplane.find_traces(d)
    assert traces, "no .xplane.pb written"
    planes = xplane.parse_file(traces[-1])
    assert planes
    named = [e.name for p in planes for ln in p.lines for e in ln.events]
    assert named and any(e for e in named)
    # every plane aggregates without error
    rows = xplane.aggregate(planes, plane_filter="")
    assert rows and all(r.total_ms >= 0 for r in rows)
