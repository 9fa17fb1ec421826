"""Parse a ``jax.profiler`` trace into a per-op / per-category device-time report.

Complements ``profiling.maybe_profile``: that context writes an xplane trace;
this module reads it back WITHOUT TensorBoard (whose profile plugin is
version-locked to its bundled pywrap symbols and routinely broken). The
xplane protobuf schema itself is stable; we locate a generated ``xplane_pb2``
from whichever package ships one.

Typical loop:

    with maybe_profile(trace_dir):        # N iterations of the hot step
        ...
    report = xprof.device_op_report(trace_dir, iters=N)
    print(xprof.format_report(report))

The report aggregates the "XLA Ops" device lines: total device-busy time,
time per HLO-category (fusion kinds, convolution, custom-call kernels, ...)
and the top individual ops with their shapes — the data used to find, e.g.,
that the S=4096/D=40 UNet self-attentions are transpose-bound (STATUS.md
"Measured perf notes").
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import os
from typing import Dict, List, Optional, Tuple


def _xplane_pb2():
    """Locate a generated xplane proto module (tensorflow/tsl ship one)."""
    candidates = (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
    )
    for name in candidates:
        try:
            module = __import__(name, fromlist=["XSpace"])
            return module
        except Exception:
            continue
    return None


def available() -> bool:
    return _xplane_pb2() is not None


def _category(op_name: str) -> str:
    """Bucket an HLO op label: '%convert_reduce_fusion.15 = ...' -> 'convert_reduce_fusion'."""
    head = op_name.lstrip("%").split(" ", 1)[0]
    base = head.split(".", 1)[0]
    return base or "?"


@dataclasses.dataclass
class OpReport:
    plane: str
    total_ms: float  # device-busy ms per iteration
    iters: int
    by_category: List[Tuple[str, float]]  # (category, ms/iter) descending
    top_ops: List[Tuple[str, float]]  # (full op label, ms/iter) descending


def device_op_report(
    trace_dir: str,
    iters: int = 1,
    top: int = 25,
) -> Optional[OpReport]:
    """Aggregate the newest ``*.xplane.pb`` under ``trace_dir``.

    ``iters``: how many identical iterations ran inside the trace — times are
    reported per iteration. Returns None when no trace/proto support exists.
    """
    pb2 = _xplane_pb2()
    if pb2 is None:
        return None
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        return None
    xs = pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    best: Optional[OpReport] = None
    for plane in xs.planes:
        # Device planes are named like "/device:TPU:0"; host planes have no
        # "XLA Ops" line and aggregate to zero.
        agg: Dict[str, float] = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e9  # -> ms
        total = sum(agg.values())
        if total <= 0:
            continue
        cats: Dict[str, float] = collections.Counter()
        for name, ms in agg.items():
            cats[_category(name)] += ms
        rep = OpReport(
            plane=plane.name,
            total_ms=total / iters,
            iters=iters,
            by_category=[(k, v / iters) for k, v in cats.most_common()],
            top_ops=[(k, v / iters) for k, v in collections.Counter(agg).most_common(top)],
        )
        if best is None or rep.total_ms > best.total_ms:
            best = rep
    return best


def format_report(rep: Optional[OpReport], shape_chars: int = 110) -> str:
    if rep is None:
        return "xprof: no device trace found (or no xplane proto module installed)"
    lines = [
        f"plane {rep.plane}: {rep.total_ms:.2f} ms/iter device-busy ({rep.iters} iters)",
        "-- by category --",
    ]
    for cat, ms in rep.by_category[:20]:
        lines.append(f"  {ms:9.3f} ms  {ms / rep.total_ms * 100:5.1f}%  {cat}")
    lines.append("-- top ops --")
    for name, ms in rep.top_ops:
        lines.append(f"  {ms:9.3f} ms  {ms / rep.total_ms * 100:5.1f}%  {name[:shape_chars]}")
    return "\n".join(lines)
