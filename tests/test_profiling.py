"""XPlane parser tests: hand-encoded protobuf wire bytes -> op/line summaries.

The reference has no profiler integration (SURVEY §5); this guards our from-scratch
XPlane reader (multimodal_tpu/profiling.py), which the perf audits depend on.
"""

import os

from multimodal_tpu.profiling import xplane_line_summary, xplane_op_summary


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def _msg(num: int, payload: bytes) -> bytes:
    return _field(num, 2, payload)


def _event(meta_id: int, offset_ps: int, duration_ps: int) -> bytes:
    return (
        _field(1, 0, _varint(meta_id))
        + _field(2, 0, _varint(offset_ps))
        + _field(3, 0, _varint(duration_ps))
    )


def _line(name: str, events: list[bytes]) -> bytes:
    buf = _msg(2, name.encode())
    for e in events:
        buf += _msg(4, e)
    return buf


def _metadata_entry(meta_id: int, name: str) -> bytes:
    meta = _field(1, 0, _varint(meta_id)) + _msg(2, name.encode())
    return _msg(2, meta)  # map entry value = XEventMetadata


def _plane(name: str, lines: list[bytes], metadata: list[bytes]) -> bytes:
    buf = _msg(2, name.encode())
    for ln in lines:
        buf += _msg(3, ln)
    for m in metadata:
        buf += _msg(4, m)
    return buf


def _write_space(tmp_path, planes: list[bytes]) -> str:
    space = b"".join(_msg(1, p) for p in planes)
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    (d / "host.xplane.pb").write_bytes(space)
    return str(tmp_path)


def test_op_summary_aggregates_durations(tmp_path):
    # two ops on one line: matmul twice (1ms + 2ms), add once (0.5ms); ps units
    plane = _plane(
        "/device:TPU:0",
        [
            _line(
                "XLA Ops",
                [
                    _event(1, 0, int(1e9)),
                    _event(1, int(3e9), int(2e9)),
                    _event(2, int(1e9), int(5e8)),
                ],
            )
        ],
        [_metadata_entry(1, "%matmul.1"), _metadata_entry(2, "%add.2")],
    )
    out = xplane_op_summary(_write_space(tmp_path, [plane]))
    info = out["/device:TPU:0"]
    assert abs(info["total_ms"] - 3.5) < 1e-9
    assert info["ops"][0] == ("%matmul.1", 3.0)
    assert info["ops"][1] == ("%add.2", 0.5)


def test_line_summary_separates_lines_and_unions_intervals(tmp_path):
    # compute line: two back-to-back ops (no overlap) -> occupancy == sum
    compute = _line("XLA Ops", [_event(1, 0, int(1e9)), _event(1, int(1e9), int(1e9))])
    # async line: two overlapping 2ms spans offset by 1ms -> sum 4ms, union 3ms;
    # plus a disjoint 1ms span -> sum 5ms, union 4ms
    async_l = _line(
        "Async XLA Ops",
        [
            _event(2, 0, int(2e9)),
            _event(2, int(1e9), int(2e9)),
            _event(2, int(10e9), int(1e9)),
        ],
    )
    plane = _plane(
        "/device:TPU:0",
        [compute, async_l],
        [_metadata_entry(1, "%fusion.7"), _metadata_entry(2, "%copy-start.9")],
    )
    out = xplane_line_summary(_write_space(tmp_path, [plane]))
    lines = out["/device:TPU:0"]
    assert abs(lines["XLA Ops"]["sum_ms"] - 2.0) < 1e-9
    assert abs(lines["XLA Ops"]["occupancy_ms"] - 2.0) < 1e-9
    assert lines["Async XLA Ops"]["events"] == 3
    assert abs(lines["Async XLA Ops"]["sum_ms"] - 5.0) < 1e-9
    assert abs(lines["Async XLA Ops"]["occupancy_ms"] - 4.0) < 1e-9
    assert lines["Async XLA Ops"]["ops"] == [("%copy-start.9", 5.0)]


def test_plane_filter_excludes_host(tmp_path):
    tpu = _plane("/device:TPU:0", [_line("XLA Ops", [_event(1, 0, 1000)])],
                 [_metadata_entry(1, "%x.1")])
    host = _plane("/host:CPU", [_line("python", [_event(1, 0, 1000)])],
                  [_metadata_entry(1, "pyfunc")])
    root = _write_space(tmp_path, [tpu, host])
    assert set(xplane_op_summary(root)) == {"/device:TPU:0"}
    assert set(xplane_line_summary(root)) == {"/device:TPU:0"}
