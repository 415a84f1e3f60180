"""Parse jax.profiler xplane.pb traces into per-op device-time tables.

The TPU device plane of a `jax.profiler.trace` capture carries real
per-op device timings (XLA Ops line) and per-dispatch module spans (XLA
Modules line) — the ground truth the SURVEY §5 tracing requirement asks
for, and the only trustworthy timing on tunneled platforms where wall-clock
brackets include ~30 ms sync fetches (CLAUDE.md). Protos ship with the
image's tensorflow (tensorflow.tsl.profiler.protobuf); loading is lazy so
this module imports without TF.

Typical use:
    with jax.profiler.trace("/tmp/prof"):
        for _ in range(5): state, m = trainer.train_step(state, batch)
        float(m["loss"])
    rep = parse_trace("/tmp/prof")
    print(format_report(rep, steps=5))
"""
from __future__ import annotations

import dataclasses
import glob
import os
import re
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass
class OpTime:
    name: str            # full HLO text (first 120 chars)
    key: str             # aggregation key (op result name, e.g. %fusion.15)
    total_ms: float      # summed device time across the window
    count: int           # occurrences (≈ steps for per-step ops)
    bytes_est: int       # crude traffic estimate from HLO shapes (see below)

    @property
    def gbps(self) -> float:
        """Achieved HBM GB/s if bytes_est is right (0 when unknown)."""
        if not self.total_ms:
            return 0.0
        return self.bytes_est * self.count / (self.total_ms * 1e-3) / 1e9


@dataclasses.dataclass
class TraceReport:
    device_total_ms: float       # summed XLA-module device time
    span_ms: float               # first-event start -> last-event end
    ops: List[OpTime]            # per-op aggregate, descending total time
    step_spans_ms: List[float]   # per-step durations from the Steps line
    plane: str


_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|s64|u64|f64)"
                       r"\[([0-9,]*)\]")
_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1,
          "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}


def _hlo_bytes(text: str) -> int:
    """Sum the bytes of every shape mentioned in the op's HLO one-liner
    (result + operands). A rough traffic model: assumes each named array is
    read/written once and fusions don't re-stream operands; good to ~2x,
    which is enough to tell 'near roofline' from 'order off'."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dtype]
    return total


def parse_trace(trace_dir: str, plane_suffix: str = "TPU") -> TraceReport:
    """Aggregate the newest xplane.pb under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if plane_suffix in p.name and
              any(len(l.events) for l in p.lines)]
    if not planes:
        raise ValueError(
            f"no populated '{plane_suffix}' plane; planes = "
            f"{[p.name for p in xs.planes]}")
    plane = planes[0]
    emeta = {m.id: m.name for m in plane.event_metadata.values()}

    agg: Dict[str, Tuple[str, float, int]] = {}
    device_total = 0.0
    step_spans: List[float] = []
    t_min, t_max = float("inf"), 0.0
    for line in plane.lines:
        for ev in line.events:
            name = emeta.get(ev.metadata_id, "?")
            dur_ms = ev.duration_ps / 1e9
            t0 = line.timestamp_ns * 1e3 + ev.offset_ps / 1e0  # ps
            t_min = min(t_min, t0)
            t_max = max(t_max, t0 + ev.duration_ps)
            if line.name == "XLA Modules":
                device_total += dur_ms
            elif line.name == "Steps":
                step_spans.append(dur_ms)
            elif line.name == "XLA Ops":
                key = name.split(" = ")[0] if " = " in name else name
                full, tot, cnt = agg.get(key, (name, 0.0, 0))
                agg[key] = (full, tot + dur_ms, cnt + 1)
    ops = [OpTime(name=full[:200], key=key, total_ms=tot, count=cnt,
                  bytes_est=_hlo_bytes(full))
           for key, (full, tot, cnt) in agg.items()]
    ops.sort(key=lambda o: -o.total_ms)
    span_ms = (t_max - t_min) / 1e9 if t_max > t_min else 0.0
    return TraceReport(device_total_ms=device_total, span_ms=span_ms,
                       ops=ops, step_spans_ms=step_spans, plane=plane.name)


def format_report(rep: TraceReport, steps: Optional[int] = None,
                  top: int = 15) -> str:
    lines = [f"device plane {rep.plane}: busy {rep.device_total_ms:.2f} ms "
             f"over a {rep.span_ms:.2f} ms span "
             f"({100 * rep.device_total_ms / max(rep.span_ms, 1e-9):.0f}% "
             f"device busy)"]
    if steps:
        lines.append(f"per-step device time: "
                     f"{rep.device_total_ms / steps:.3f} ms over {steps} steps")
    if rep.step_spans_ms:
        ss = sorted(rep.step_spans_ms)
        lines.append(f"step spans (incl. dispatch gaps): "
                     f"min {ss[0]:.2f} / median {ss[len(ss) // 2]:.2f} / "
                     f"max {ss[-1]:.2f} ms")
    lines.append(f"{'ms/occ':>8} {'occ':>4} {'~GB/s':>6}  op")
    for op in rep.ops[:top]:
        per = op.total_ms / max(op.count, 1)
        gbps = op.bytes_est / (per * 1e-3) / 1e9 if per else 0.0
        lines.append(f"{per:8.3f} {op.count:4d} {gbps:6.0f}  {op.key} "
                     f":: {op.name[:80]}")
    return "\n".join(lines)
