"""XPlane trace parsing — dependency-free profile analysis (SURVEY.md §5.1).

`jax.profiler.start_trace` writes `*.xplane.pb` protobufs (the XSpace
schema from tsl/profiler). The usual readers (TensorBoard + the profile
plugin) are heavyweight and absent from lean TPU images, so this module
decodes the protobuf wire format directly — no tensorflow, no generated
stubs — and aggregates device-side kernel events the way this repo's
perf work consumed them (docs/KERNELS.md "profile parse" discipline):

  * events are grouped by HLO-name prefix (the text before the first
    '.'/'(' — Pallas kernels keep their `pl.pallas_call` names, XLA
    fusions group as `fusion`);
  * async DMA windows (`slice-start`/`copy-start`/... ) OVERLAP compute
    on TPU — they are aggregated separately and must never be summed
    into busy time;
  * per-prefix totals are reported per occurrence and per step when the
    step count is known.

Usage:
    from istvt_tpu.utils import xplane
    space = xplane.parse_file("/tmp/trace/.../foo.xplane.pb")
    rows = xplane.aggregate(space, line_filter="device")
    print(xplane.format_table(rows))
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Iterator, List, Optional, Tuple

# ---------------------------------------------------------------------------
# protobuf wire-format decoding (schema-tolerant: unknown fields skipped)

_VARINT, _I64, _LEN, _SGROUP, _EGROUP, _I32 = 0, 1, 2, 3, 4, 5


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, raw_value) triples."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == _VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == _I64:
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wt == _LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == _I32:
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:  # groups: obsolete, never emitted by tsl
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _signed(v: int) -> int:
    """Wire varints are unsigned; int64 fields reinterpret the 2c bits."""
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# XSpace schema (tsl/profiler/protobuf/xplane.proto)


@dataclasses.dataclass
class XEvent:
    name: str
    offset_ps: int
    duration_ps: int


@dataclasses.dataclass
class XLine:
    name: str
    timestamp_ns: int
    events: List[XEvent]


@dataclasses.dataclass
class XPlane:
    name: str
    lines: List[XLine]


def _parse_event(buf: bytes) -> Tuple[int, int, int]:
    meta_id = offset = dur = 0
    for f, _, v in _fields(buf):
        if f == 1:
            meta_id = v
        elif f == 2:
            offset = _signed(v)
        elif f == 3:
            dur = _signed(v)
    return meta_id, offset, dur


def _parse_line(buf: bytes, names: Dict[int, str]) -> XLine:
    name, ts, raw_events = "", 0, []
    for f, wt, v in _fields(buf):
        if f == 2 and wt == _LEN:
            name = v.decode("utf-8", "replace")
        elif f == 11 and wt == _LEN and not name:
            name = v.decode("utf-8", "replace")
        elif f == 3 and wt == _VARINT:
            ts = _signed(v)
        elif f == 4 and wt == _LEN:
            raw_events.append(v)
    events = []
    for e in raw_events:
        mid, off, dur = _parse_event(e)
        events.append(XEvent(names.get(mid, f"<{mid}>"), off, dur))
    return XLine(name, ts, events)


def _parse_metadata_entry(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry: key=1, value=2 (XEventMetadata
    {id=1, name=2, display_name=5})."""
    key, name = 0, ""
    for f, wt, v in _fields(buf):
        if f == 1 and wt == _VARINT:
            key = v
        elif f == 2 and wt == _LEN:
            for f2, wt2, v2 in _fields(v):
                if f2 == 2 and wt2 == _LEN:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf: bytes) -> XPlane:
    name, raw_lines, names = "", [], {}
    for f, wt, v in _fields(buf):
        if f == 2 and wt == _LEN:
            name = v.decode("utf-8", "replace")
        elif f == 3 and wt == _LEN:
            raw_lines.append(v)
        elif f == 4 and wt == _LEN:
            k, n = _parse_metadata_entry(v)
            names[k] = n
    return XPlane(name, [_parse_line(b, names) for b in raw_lines])


def parse_bytes(data: bytes) -> List[XPlane]:
    return [_parse_plane(v) for f, wt, v in _fields(data)
            if f == 1 and wt == _LEN]


def parse_file(path: str) -> List[XPlane]:
    with open(path, "rb") as f:
        return parse_bytes(f.read())


def find_traces(log_dir: str) -> List[str]:
    """All .xplane.pb files under a jax.profiler log dir (newest last)."""
    hits = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                     recursive=True)
    return sorted(hits, key=os.path.getmtime)


# ---------------------------------------------------------------------------
# aggregation (the docs/KERNELS.md discipline)

#: name markers of async DMA windows that OVERLAP compute on TPU — their
#: durations are wall windows, not busy time, and must not be summed into
#: a kernel budget.
ASYNC_MARKERS = ("slice-start", "copy-start", "dynamic-update-slice-start",
                 "all-reduce-start", "collective-permute-start", "copy-done",
                 "slice-done", "send", "recv")


def hlo_prefix(name: str) -> str:
    """Group key: HLO/kernel name up to the first '.', '(' or digit-suffix
    separator — `ln_ff_bwd.277` -> `ln_ff_bwd`, `fusion.1203` -> `fusion`."""
    for sep in (".", "(", ":"):
        i = name.find(sep)
        if i > 0:
            name = name[:i]
    return name


@dataclasses.dataclass
class Row:
    prefix: str
    count: int
    total_ms: float
    mean_us: float
    asynchronous: bool


def aggregate(planes: List[XPlane], line_filter: Optional[str] = None,
              plane_filter: str = "TPU") -> List[Row]:
    """Per-HLO-prefix totals over device planes, busiest first.

    plane_filter: substring of the plane name ('TPU' catches
    '/device:TPU:0'; use '' for everything incl. host threads).
    line_filter: optional substring of the line name (e.g. 'XLA Op' /
    'Steps' lines on TPU device planes).
    """
    acc: Dict[Tuple[str, bool], List[float]] = {}
    for plane in planes:
        if plane_filter and plane_filter.lower() not in plane.name.lower():
            continue
        for line in plane.lines:
            if line_filter and line_filter.lower() not in line.name.lower():
                continue
            for ev in line.events:
                # match async markers only against the op's OWN name (the
                # text before ' = '): verbose HLO names embed operand
                # names, so a compute fusion consuming %copy-done.N would
                # otherwise be flagged async (r4 bug)
                lname = ev.name.split(" = ", 1)[0].lower()
                is_async = any(m in lname for m in ASYNC_MARKERS)
                key = (hlo_prefix(ev.name), is_async)
                cell = acc.setdefault(key, [0, 0.0])
                cell[0] += 1
                cell[1] += ev.duration_ps / 1e9  # ps -> ms
    rows = [Row(prefix=k[0], count=int(c), total_ms=t,
                mean_us=(t / c * 1e3 if c else 0.0), asynchronous=k[1])
            for k, (c, t) in acc.items()]
    rows.sort(key=lambda r: -r.total_ms)
    return rows


def format_table(rows: List[Row], top: int = 25) -> str:
    out = [f"{'prefix':40s} {'count':>7s} {'total ms':>10s} "
           f"{'mean us':>9s}  async"]
    for r in rows[:top]:
        out.append(f"{r.prefix[:40]:40s} {r.count:7d} {r.total_ms:10.3f} "
                   f"{r.mean_us:9.1f}  {'Y' if r.asynchronous else ''}")
    busy = sum(r.total_ms for r in rows if not r.asynchronous)
    out.append(f"-- busy (non-async) total: {busy:.3f} ms over "
               f"{sum(r.count for r in rows if not r.asynchronous)} events")
    return "\n".join(out)


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse
    p = argparse.ArgumentParser("istvt_tpu.utils.xplane")
    p.add_argument("path", help=".xplane.pb file or jax trace log dir")
    p.add_argument("--line", default=None, help="line-name substring")
    p.add_argument("--plane", default="TPU",
                   help="plane-name substring ('' = all planes)")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)
    path = args.path
    if os.path.isdir(path):
        traces = find_traces(path)
        if not traces:
            raise SystemExit(f"no .xplane.pb under {path}")
        path = traces[-1]
        print(f"# {path}")
    rows = aggregate(parse_file(path), line_filter=args.line,
                     plane_filter=args.plane)
    print(format_table(rows, top=args.top))


if __name__ == "__main__":  # pragma: no cover
    main()
