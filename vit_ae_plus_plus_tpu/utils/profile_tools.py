"""Step-time attribution from a jax.profiler trace (SURVEY.md §5.1).

The reference's only observability is timing meters + max-memory
(/root/reference/utils/misc.py:129-156); this module turns the TPU-native
equivalent — a `jax.profiler` xplane trace captured by
`pretrain-kfold --profile-dir` — into the named-bucket step attribution table
used throughout BASELINE.md (attention custom calls / matmul fusions / LN
reductions / copies / misc), without TensorBoard: the tensorboard profile
plugin's trace converter is broken in this environment, so we read the
`.xplane.pb` protobuf directly.

Usage:
    python -m vit_ae_plus_plus_tpu.cli profile-attrib --trace-dir DIR --steps N

Parsing notes (learned round 2): the proto lives at
`tensorflow.tsl.profiler.protobuf.xplane_pb2` and needs the pure-python
protobuf backend (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python — the upb
backend segfaults on these descriptors here). Device planes are named
"/device:TPU:N"; the per-op line is "XLA Ops".
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# (bucket, list of substrings matched against the lowercased XLA op name);
# first hit wins, so order is specificity-descending
_BUCKET_RULES: List[Tuple[str, Tuple[str, ...]]] = [
    ("attention kernels", ("flash", "custom-call", "custom_call")),
    ("LN reductions", ("convert_reduce", "multiply_reduce", "reduce_fusion")),
    ("copies/layout", ("copy", "bitcast", "transpose", "reshape")),
    ("convolutions", ("conv",)),
    ("matmul fusions", ("dot", "matmul", "gemm", "fusion")),
    ("collectives", ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute", "all-to-all")),
]


def find_xplane_files(trace_dir: str) -> List[str]:
    """Newest-session .xplane.pb files under a jax.profiler trace dir."""
    pattern = os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    files = sorted(glob.glob(pattern))
    if not files:  # trace dir may itself be the session dir
        files = sorted(glob.glob(os.path.join(trace_dir, "*.xplane.pb")))
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    newest = max(os.path.dirname(f) for f in files)
    return [f for f in files if os.path.dirname(f) == newest]


def parse_xplane(path: str, line_name: str = "XLA Ops",
                 plane_prefix: str = "/device:") -> Dict[str, Tuple[float, int]]:
    """Sum per-op-name (total_ms, occurrences) over every matching plane/line.

    `line_name=None` aggregates all lines of the matching planes (useful for
    CPU traces, which have no "XLA Ops" line)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    ops: Dict[str, Tuple[float, int]] = defaultdict(lambda: (0.0, 0))
    for plane in space.planes:
        if plane_prefix and not plane.name.startswith(plane_prefix):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line_name and line.name != line_name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
                ms = ev.duration_ps / 1e9
                n = max(int(ev.num_occurrences), 1)
                t, c = ops[name]
                ops[name] = (t + ms, c + n)
    return dict(ops)


def bucket_of(op_name: str) -> str:
    low = op_name.lower()
    for bucket, needles in _BUCKET_RULES:
        if any(n in low for n in needles):
            return bucket
    return "misc"


def attribute(ops: Dict[str, Tuple[float, int]], steps: int = 1,
              top_k: int = 8) -> Dict[str, dict]:
    """Fold per-op totals into the BASELINE.md bucket table.

    Returns {bucket: {"ms_per_step", "pct", "top_ops": [(name, ms/step), ...]}}
    plus a "__total__" entry."""
    per_bucket_ms: Dict[str, float] = defaultdict(float)
    per_bucket_ops: Dict[str, Dict[str, float]] = defaultdict(lambda: defaultdict(float))
    for name, (ms, _count) in ops.items():
        b = bucket_of(name)
        per_bucket_ms[b] += ms / steps
        per_bucket_ops[b][name] += ms / steps
    total = sum(per_bucket_ms.values())
    out = {}
    for b, ms in sorted(per_bucket_ms.items(), key=lambda kv: -kv[1]):
        tops = sorted(per_bucket_ops[b].items(), key=lambda kv: -kv[1])[:top_k]
        out[b] = {
            "ms_per_step": ms,
            "pct": 100.0 * ms / total if total else 0.0,
            "top_ops": tops,
        }
    out["__total__"] = {"ms_per_step": total, "pct": 100.0, "top_ops": []}
    return out


def format_table(table: Dict[str, dict], show_ops: int = 3) -> str:
    lines = [f"{'bucket':<22} {'ms/step':>9} {'%':>6}"]
    for b, row in table.items():
        if b == "__total__":
            continue
        lines.append(f"{b:<22} {row['ms_per_step']:>9.2f} {row['pct']:>5.1f}%")
        for name, ms in row["top_ops"][:show_ops]:
            nm = name if len(name) <= 48 else name[:45] + "..."
            lines.append(f"    {nm:<48} {ms:>7.2f}")
    tot = table["__total__"]["ms_per_step"]
    lines.append(f"{'TOTAL (device busy)':<22} {tot:>9.2f}")
    return "\n".join(lines)


def attribute_trace(trace_dir: str, steps: int = 1,
                    line_name: Optional[str] = "XLA Ops",
                    plane_prefix: str = "/device:") -> Dict[str, dict]:
    """End-to-end: newest trace session -> merged op table -> buckets."""
    merged: Dict[str, Tuple[float, int]] = defaultdict(lambda: (0.0, 0))
    for path in find_xplane_files(trace_dir):
        for name, (ms, n) in parse_xplane(path, line_name, plane_prefix).items():
            t, c = merged[name]
            merged[name] = (t + ms, c + n)
    if not merged and line_name:
        # CPU traces have no "XLA Ops" line — fall back to all lines
        return attribute_trace(trace_dir, steps, None, plane_prefix="")
    return attribute(dict(merged), steps=steps)
