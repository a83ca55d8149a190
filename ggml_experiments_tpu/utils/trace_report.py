"""Per-op device-time reports from jax.profiler traces.

The reference's only profiling is a wall-clock print around the whole graph
compute (/root/reference/mobilevit/main.cpp:639-641). The TPU counterpart
needs *per-op* attribution — XLA fuses the user program into opaque fusions,
so "where does the time go" is answerable only from a device trace. This
module parses the Chrome-trace JSON that ``jax.profiler`` writes (the
``*.trace.json.gz`` next to the xplane protobuf — no tensorboard/tensorflow
dependency) and aggregates device-stream events into a top-op table, e.g.::

    with profiler_trace(logdir) as d:
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
    rows = parse_trace(d, reps=reps)

Used by tools/trace_report.py to answer questions like "is the model conv-
bound or attention-bound" directly against the roofline numbers in
:mod:`~ggml_experiments_tpu.utils.observability`.
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
from typing import Dict, List, Optional


@dataclasses.dataclass(frozen=True)
class OpTime:
    name: str
    total_us: float     # summed over all occurrences in the trace
    count: int
    per_call_us: float  # total / reps (one "call" = one traced iteration)


def _newest_trace_file(logdir: str) -> str:
    pats = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not pats:
        raise FileNotFoundError(f"no trace.json.gz under {logdir!r} — "
                                "was jax.profiler.start_trace/stop_trace used?")
    return pats[-1]


def parse_trace(logdir: str, *, reps: int = 1) -> List[OpTime]:
    """Aggregate device-side complete events from the newest trace in logdir.

    Device streams are identified by their process metadata name
    (``/device:TPU:0``-style); host threads (``/host:CPU``) are excluded.
    If no device process exists (CPU-only runs label everything as host),
    all non-host processes — or, failing that, every process — are used, so
    the report degrades gracefully off-TPU. ``reps`` divides the totals into
    per-iteration numbers.
    """
    events = json.load(gzip.open(_newest_trace_file(logdir)))["traceEvents"]
    proc_names: Dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", "")
    device = {p for p, n in proc_names.items() if "/device:" in n}
    if not device:
        device = {p for p, n in proc_names.items() if "host" not in n.lower()}
    total: Dict[str, float] = {}
    count: Dict[str, int] = {}
    for e in events:
        if e.get("ph") == "X" and (not device or e.get("pid") in device):
            name = e.get("name", "")
            if name.startswith("jit_"):
                # whole-module span enclosing the per-op events — keeping it
                # would double-count every op underneath it
                continue
            total[name] = total.get(name, 0.0) + float(e.get("dur", 0))
            count[name] = count.get(name, 0) + 1
    rows = [
        OpTime(name=n, total_us=t, count=count[n], per_call_us=t / max(reps, 1))
        for n, t in total.items()
    ]
    rows.sort(key=lambda r: -r.total_us)
    return rows


def format_report(rows: List[OpTime], *, top: int = 25, min_us: float = 0.0) -> str:
    """Render a fixed-width top-op table (dominant entry first)."""
    shown = [r for r in rows[:top] if r.per_call_us >= min_us]
    grand = sum(r.total_us for r in rows)
    lines = [f"{'us/call':>10}  {'%':>5}  {'count':>5}  op"]
    for r in shown:
        pct = 100.0 * r.total_us / grand if grand else 0.0
        lines.append(f"{r.per_call_us:10.1f}  {pct:5.1f}  {r.count:5d}  {r.name[:90]}")
    rest = rows[top:]
    if rest:
        rest_us = sum(r.total_us for r in rest)
        rest_per_call = sum(r.per_call_us for r in rest)
        lines.append(f"{rest_per_call:10.1f}  "
                     f"{100.0 * rest_us / grand if grand else 0.0:5.1f}  "
                     f"{sum(r.count for r in rest):5d}  (+{len(rest)} more ops)")
    return "\n".join(lines)


def trace_and_report(
    fn, *args, reps: int = 4, logdir: Optional[str] = None, **kw
) -> List[OpTime]:
    """Warm up ``fn`` (compile outside the trace), trace ``reps`` pipelined
    calls, and return the aggregated per-op rows."""
    import tempfile

    import jax

    from ggml_experiments_tpu.utils.observability import profiler_trace

    logdir = logdir or tempfile.mkdtemp(prefix="gxt_trace_")
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    with profiler_trace(logdir) as d:
        outs = [fn(*args, **kw) for _ in range(reps)]
        jax.block_until_ready(outs)
    return parse_trace(d, reps=reps)
