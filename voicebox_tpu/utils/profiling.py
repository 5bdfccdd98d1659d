"""Device-trace attribution: turn a `jax.profiler` trace into per-HLO-category
time and per-op tables.

The reference has no profiling subsystem at all (SURVEY.md §5: "Tracing /
profiling: none"); on TPU the idiomatic tool is `jax.profiler.start_trace`,
which (even over a tunneled backend) records per-op device events carrying
`hlo_category`, `model_flops`, and `raw_bytes_accessed`. This module parses
the written `*.trace.json.gz` into the tables PERFORMANCE.md's attribution
sections are built from — pair it with `VoiceBoxTrainer(profile_dir=...)`
(which traces a configurable step window) or any manual trace.

    from voicebox_tpu.utils.profiling import parse_device_trace, format_attribution
    cats, ops = parse_device_trace("/tmp/trace")
    print(format_attribution(cats, ops, steps=5))
"""

from __future__ import annotations

import glob
import gzip
import json
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

__all__ = ["OpStats", "parse_device_trace", "format_attribution"]


@dataclass
class OpStats:
    """Aggregated device-side stats for one HLO op (by name)."""

    duration_ms: float = 0.0
    calls: int = 0
    category: str = "?"
    bytes_accessed: Optional[float] = None  # per call
    model_flops: Optional[float] = None     # per call
    source: str = ""                        # python source attribution

    @property
    def gbytes_per_s(self) -> Optional[float]:
        if not self.bytes_accessed or not self.duration_ms:
            return None
        return self.bytes_accessed * self.calls / (self.duration_ms / 1e3) / 1e9

    @property
    def tflops_per_s(self) -> Optional[float]:
        if not self.model_flops or not self.duration_ms:
            return None
        return self.model_flops * self.calls / (self.duration_ms / 1e3) / 1e12


def _maybe_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def parse_device_trace(
    trace_dir: str,
) -> Tuple[Dict[str, float], Dict[str, OpStats]]:
    """Parse the newest trace under `trace_dir`.

    Returns (category -> total device ms, op name -> OpStats). Outer
    control-flow ops ('while'/'conditional') are excluded — their duration
    double-counts the loop body they contain."""
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    op_tids = {
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in tpu_pids
        and "XLA Ops" in str(e.get("args", {}).get("name", ""))
    }
    if not op_tids:
        raise ValueError(
            "trace has no TPU 'XLA Ops' thread — per-op device events exist "
            "only in traces captured on a TPU backend (the CPU backend "
            "records host threads only); capture with the trainer's "
            "profile_dir on hardware"
        )

    cats: Dict[str, float] = defaultdict(float)
    ops: Dict[str, OpStats] = defaultdict(OpStats)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        if cat in ("while", "conditional"):
            continue
        dur_ms = e.get("dur", 0) / 1e3
        cats[cat] += dur_ms
        st = ops[e.get("name", "?")]
        st.duration_ms += dur_ms
        st.calls += 1
        st.category = cat
        if st.bytes_accessed is None:
            st.bytes_accessed = _maybe_float(args.get("raw_bytes_accessed"))
        if st.model_flops is None:
            st.model_flops = _maybe_float(args.get("model_flops"))
        if not st.source:
            st.source = str(args.get("source", ""))
    return dict(cats), dict(ops)


def format_attribution(
    cats: Dict[str, float],
    ops: Dict[str, OpStats],
    steps: int = 1,
    top: int = 20,
) -> str:
    """Render the PERFORMANCE.md-style tables; `steps` divides totals into
    per-step numbers (pass the number of steps the trace window covered)."""
    total = sum(cats.values()) or 1.0
    lines = [f"device time by HLO category ({total / steps:.2f} ms/step):"]
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        if ms / total < 0.001:
            continue
        lines.append(
            f"  {c:32s} {ms / steps:8.3f} ms/step  {100 * ms / total:5.1f}%"
        )
    lines.append(f"top {top} ops by device time:")
    for name, st in sorted(ops.items(), key=lambda kv: -kv[1].duration_ms)[:top]:
        extra = ""
        if st.tflops_per_s:
            extra += f"  {st.tflops_per_s:6.1f} TF/s"
        if st.gbytes_per_s:
            extra += f"  {st.gbytes_per_s:5.0f} GB/s"
        src = f"  [{st.source}]" if st.source else ""
        lines.append(
            f"  {st.duration_ms / steps:8.3f} ms/step x{st.calls:4d}"
            f"  {name[:60]:60s}{extra}{src}"
        )
    return "\n".join(lines)
