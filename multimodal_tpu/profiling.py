"""Profiling: JAX trace capture + a self-contained XPlane parser for op-level summaries.

The reference has no profiler integration — only wall-clock AverageMeters (SURVEY §5,
main/train.py:26-42). Here: ``trace`` wraps jax.profiler around a step function, and
``xplane_op_summary`` aggregates per-op device time straight from the dumped
``*.xplane.pb`` — via a minimal protobuf wire-format reader, so it needs no tensorflow/
tensorboard protos (whose generated code conflicts with the image's protobuf).

XPlane schema (tsl/profiler/protobuf/xplane.proto):
    XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4(map)}
    XLine{events=4}; XEvent{metadata_id=1, duration_ps=3}; XEventMetadata{id=1, name=2}
"""

from __future__ import annotations

import collections
import contextlib
import glob
import os
from typing import Iterator

import jax


# ---------------------------------------------------------------------------
# minimal protobuf wire reader
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message's wire bytes."""
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = bytes(buf[pos : pos + 4])
            pos += 4
        elif wire == 1:  # 64-bit
            val = bytes(buf[pos : pos + 8])
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_event_metadata(buf: memoryview) -> tuple[int, str]:
    """map entry -> XEventMetadata{id=1, name=2}; the map value is field 2 of the entry."""
    meta_id, name = 0, ""
    for field, _, val in _fields(buf):
        if field == 2:  # value = XEventMetadata
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    meta_id = v2
                elif f2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
    return meta_id, name


def xplane_op_summary(trace_dir: str, plane_filter: str = "TPU") -> dict:
    """Aggregate device op time from the newest xplane dump under ``trace_dir``.

    Returns {plane_name: {'total_ms': float, 'ops': [(name, ms), ...] sorted desc}}."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    data = memoryview(open(paths[-1], "rb").read())

    out = {}
    for field, _, plane_buf in _fields(data):
        if field != 1:  # XSpace.planes
            continue
        name = ""
        metadata = {}
        line_bufs = []
        for f, _, v in _fields(plane_buf):
            if f == 2:
                name = bytes(v).decode("utf-8", "replace")
            elif f == 3:
                line_bufs.append(v)
            elif f == 4:
                mid, mname = _parse_event_metadata(v)
                metadata[mid] = mname
        if plane_filter and plane_filter.lower() not in name.lower():
            continue
        ops: collections.Counter = collections.Counter()
        for line_buf in line_bufs:
            for f, _, v in _fields(line_buf):
                if f != 4:  # XLine.events
                    continue
                meta_id = dur = 0
                for f2, w2, v2 in _fields(v):
                    if f2 == 1 and w2 == 0:
                        meta_id = v2
                    elif f2 == 3 and w2 == 0:
                        dur = v2
                ops[metadata.get(meta_id, str(meta_id))] += dur / 1e9  # ps -> ms
        out[name] = {
            "total_ms": sum(ops.values()),
            "ops": ops.most_common(),
        }
    return out


def xplane_line_summary(trace_dir: str, plane_filter: str = "TPU") -> dict:
    """Per-LINE aggregation of the newest xplane dump — unlike ``xplane_op_summary``,
    which folds every line of a plane together, this keeps the TensorCore op line
    ('XLA Ops') separate from the async-DMA line ('Async XLA Ops'), whose
    copy-start/slice-start spans overlap compute and must not be summed as busy time.

    Returns {plane: {line: {'events', 'sum_ms', 'occupancy_ms', 'ops': [(name, ms)...]}}}
    where occupancy_ms is the union of event intervals (true busy time)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    data = memoryview(open(paths[-1], "rb").read())

    out: dict = {}
    for field, _, plane_buf in _fields(data):
        if field != 1:
            continue
        pname, metadata, line_bufs = "", {}, []
        for f, _, v in _fields(plane_buf):
            if f == 2:
                pname = bytes(v).decode("utf-8", "replace")
            elif f == 3:
                line_bufs.append(v)
            elif f == 4:
                mid, mname = _parse_event_metadata(v)
                metadata[mid] = mname
        if plane_filter and plane_filter.lower() not in pname.lower():
            continue
        lines: dict = {}
        for line_buf in line_bufs:
            lname, events = "", []
            for f, _, v in _fields(line_buf):
                if f == 2:
                    lname = bytes(v).decode("utf-8", "replace")
                elif f == 4:
                    meta_id = dur = off = 0
                    for f2, w2, v2 in _fields(v):
                        if f2 == 1 and w2 == 0:
                            meta_id = v2
                        elif f2 == 2 and w2 == 0:
                            off = v2
                        elif f2 == 3 and w2 == 0:
                            dur = v2
                    events.append((off, dur, meta_id))
            if not events:
                continue
            ops: collections.Counter = collections.Counter()
            for _, d, m in events:
                ops[metadata.get(m, str(m))] += d / 1e9
            ivs = sorted((o, o + d) for o, d, _ in events)
            occ, (cs, ce) = 0, ivs[0]
            for s, e in ivs[1:]:
                if s > ce:
                    occ += ce - cs
                    cs, ce = s, e
                else:
                    ce = max(ce, e)
            occ += ce - cs
            lines[lname] = {
                "events": len(events),
                "sum_ms": sum(ops.values()),
                "occupancy_ms": occ / 1e9,
                "ops": ops.most_common(),
            }
        out[pname] = lines
    return out


# ---------------------------------------------------------------------------
# capture helper
# ---------------------------------------------------------------------------


@contextlib.contextmanager
def trace(trace_dir: str):
    """jax.profiler trace context; pair with xplane_op_summary(trace_dir)."""
    jax.profiler.start_trace(trace_dir)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


def print_op_summary(trace_dir: str, top: int = 25, plane_filter: str = "TPU"):
    for plane, info in xplane_op_summary(trace_dir, plane_filter).items():
        print(f"== {plane}: {info['total_ms']:.2f} ms total")
        for name, ms in info["ops"][:top]:
            pct = 100.0 * ms / max(info["total_ms"], 1e-9)
            print(f"  {ms:9.3f} ms {pct:5.1f}%  {name[:100]}")
