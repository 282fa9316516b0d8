"""Tiny xplane.pb parser for on-chip kernel A/Bs — no tensorflow dependency.

Wall-clock through the axon tunnel carries a ~40 ms host-sync constant and
±15% run-to-run noise (PERF.md "Process notes"), so every kernel-level A/B in
this repo is decided on DEVICE time from a `jax.profiler.trace` xplane dump.

The xplane.pb is parsed with a minimal protobuf wire-format reader (the
environment's tensorboard-plugin-profile build does not ship xplane_pb2);
field numbers follow tsl/profiler/protobuf/xplane.proto:

    XSpace.planes=1 ; XPlane.name=2 .lines=3 .event_metadata=4
    XLine.name=2 .events=4 ; XEvent.metadata_id=1 .duration_ps=3
    XEventMetadata.id=1 .name=2 ; map entry: key=1 value=2

Usage:
    times = trace_device_times(fn, iters=10)   # {op_name: seconds_per_iter}
    print(top_ops(times))
"""

from __future__ import annotations

import glob
import os
import tempfile
from collections import defaultdict
from typing import Callable, Dict, Iterator, Tuple


# ---------------------------------------------------------------------------
# minimal protobuf wire reader
# ---------------------------------------------------------------------------

def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
        elif wt == 1:  # 64-bit
            val = buf[i : i + 8]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _parse_event(buf: bytes) -> Tuple[int, int]:
    mid = dur = 0
    for fnum, wt, val in _fields(buf):
        if fnum == 1 and wt == 0:
            mid = val
        elif fnum == 3 and wt == 0:
            dur = val
    return mid, dur


def _parse_line(buf: bytes) -> Tuple[str, list]:
    name = ""
    events = []
    for fnum, wt, val in _fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:
            events.append(_parse_event(val))
    return name, events


def _parse_metadata_entry(buf: bytes) -> Tuple[int, str]:
    key = 0
    name = ""
    for fnum, wt, val in _fields(buf):
        if fnum == 1 and wt == 0:
            key = val
        elif fnum == 2 and wt == 2:  # XEventMetadata
            for f2, w2, v2 in _fields(val):
                if f2 == 2 and w2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf: bytes) -> Tuple[str, list, Dict[int, str]]:
    name = ""
    lines = []
    meta: Dict[int, str] = {}
    for fnum, wt, val in _fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines.append(_parse_line(val))
        elif fnum == 4 and wt == 2:
            k, v = _parse_metadata_entry(val)
            meta[k] = v
    return name, lines, meta


def parse_xspace(path: str) -> list:
    """[(plane_name, [(line_name, [(metadata_id, duration_ps)])], {id: name})]"""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fnum, wt, val in _fields(buf):
        if fnum == 1 and wt == 2:
            planes.append(_parse_plane(val))
    return planes


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

def device_op_times(trace_dir: str) -> Dict[str, float]:
    """Total seconds per XLA op name on the (first) TPU device plane."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    planes = parse_xspace(sorted(paths)[-1])
    device = [p for p in planes if "/device:TPU" in p[0] or "TPU:" in p[0]]
    if not device:  # CPU fallback: busiest plane that isn't the python host threads
        device = [
            max(
                (p for p in planes if "/host" not in p[0].lower()) or planes,
                key=lambda p: sum(len(ev) for _, ev in p[1]),
            )
        ]
    totals: Dict[str, float] = defaultdict(float)
    for pname, lines, meta in device:
        # EXACT line match: the device plane also carries an 'Async XLA Ops' line
        # whose events (DMA copy-start spans etc.) OVERLAP the compute line —
        # summing both over-reports device time ~4x (364 "ms" vs 94 real)
        oplines = [(n, ev) for n, ev in lines if n == "XLA Ops"]
        if not oplines:
            oplines = [(n, ev) for n, ev in lines if "XLA Ops" in n and "Async" not in n]
        if not oplines:
            oplines = lines
        for _, events in oplines:
            for mid, dur in events:
                totals[meta.get(mid, str(mid))] += dur * 1e-12
    return dict(totals)


def trace_device_times(fn: Callable[[], object], iters: int = 10, warmup: int = 3) -> Dict[str, float]:
    """Run `fn` under a profiler trace; return per-iteration device seconds by op."""
    import jax

    out = fn()
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn())
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
        times = device_op_times(d)
    return {k: v / iters for k, v in times.items()}


def bucket(times: Dict[str, float]) -> Dict[str, float]:
    """Group op times into coarse categories (convs / fusions / copies / ...)."""
    out: Dict[str, float] = defaultdict(float)
    for name, t in times.items():
        n = name.lower()
        if "conv" in n:
            key = "conv"
        elif "custom-call" in n or "custom_call" in n:
            key = "custom-call"
        elif n.startswith("copy") or ".copy" in n or "transpose" in n:
            key = "copy/transpose"
        elif "fusion" in n:
            key = "fusion"
        elif "reduce" in n:
            key = "reduce"
        else:
            key = "other"
        out[key] += t
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def top_ops(times: Dict[str, float], n: int = 25) -> str:
    rows = sorted(times.items(), key=lambda kv: -kv[1])[:n]
    total = sum(times.values())
    lines = [f"device total: {total*1e3:.3f} ms/iter"]
    for name, t in rows:
        lines.append(f"  {t*1e3:8.3f} ms  {name[:110]}")
    return "\n".join(lines)
