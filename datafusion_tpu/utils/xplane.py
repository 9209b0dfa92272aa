"""Minimal XPlane (XLA profiler) trace reader: per-op time aggregation.

`jax.profiler.trace(dir)` writes an `xplane.pb` XSpace proto. The full
reader lives in the external `xprof`/`tensorboard_plugin_profile` packages
(not available here), but the schema is tiny and stable
(tsl/profiler/protobuf/xplane.proto), so this module decodes the wire
format directly — enough to answer "which fused HLO ops did the device
spend its time in?", the question every kernel-optimization loop starts
with (the reference exposes the same via per-operator metrics,
datafusion/physical-plan/src/metrics/).

Usage:
    with jax.profiler.trace("/tmp/t"):
        run()
    print(top_ops("/tmp/t"))
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for one message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:  # groups: unused in xplane
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, v


def _submessages(buf: bytes, fnum: int) -> List[bytes]:
    return [v for f, w, v in _fields(buf) if f == fnum and w == 2]


def _scalar(buf: bytes, fnum: int, default=0) -> int:
    for f, w, v in _fields(buf):
        if f == fnum and w == 0:
            return v
    return default


def _string(buf: bytes, fnum: int) -> str:
    for f, w, v in _fields(buf):
        if f == fnum and w == 2:
            return v.decode("utf-8", "replace")
    return ""


def plane_op_times(path_or_dir: str, plane_filter: str = "TPU") -> Dict[str, Tuple[float, int]]:
    """Aggregate event durations by event-metadata name over all planes whose
    name contains `plane_filter`. Returns {op_name: (total_ms, count)}."""
    paths = [path_or_dir]
    if os.path.isdir(path_or_dir):
        # aggregate over every host's dump in the run directory (multi-host
        # traces write one xplane.pb per host)
        paths = sorted(glob.glob(os.path.join(path_or_dir, "**", "*.xplane.pb"),
                                 recursive=True))
        if not paths:
            raise FileNotFoundError(f"no xplane.pb under {path_or_dir}")
    agg: Dict[str, List[float]] = defaultdict(lambda: [0.0, 0])
    for path in paths:
        space = open(path, "rb").read()
        for plane in _submessages(space, 1):
            name = _string(plane, 2)
            if plane_filter not in name:
                continue
            meta = {}
            for entry in _submessages(plane, 4):  # map<int64, XEventMetadata>
                k = _scalar(entry, 1)
                md = _submessages(entry, 2)
                if md:
                    meta[k] = _string(md[0], 2) or _string(md[0], 4)
            for line in _submessages(plane, 3):
                for ev in _submessages(line, 4):
                    mid = _scalar(ev, 1)
                    dur_ps = _scalar(ev, 3)
                    nm = meta.get(mid, f"#{mid}")
                    a = agg[nm]
                    a[0] += dur_ps / 1e9  # ps -> ms
                    # aggregated planes fold repeat counts into field 5
                    a[1] += max(_scalar(ev, 5, 1), 1)
    return {k: (v[0], v[1]) for k, v in agg.items()}


def top_ops(path_or_dir: str, n: int = 25, plane_filter: str = "TPU") -> str:
    """Human-readable top-N ops by total device time."""
    times = plane_op_times(path_or_dir, plane_filter)
    rows = sorted(times.items(), key=lambda kv: -kv[1][0])[:n]
    total = sum(v[0] for v in times.values())
    out = [f"{'ms':>10}  {'calls':>6}  {'%':>5}  op", "-" * 70]
    for name, (ms, cnt) in rows:
        out.append(f"{ms:10.3f}  {cnt:6d}  {100 * ms / max(total, 1e-9):5.1f}  {name[:120]}")
    out.append(f"{total:10.3f}  total device time")
    return "\n".join(out)
