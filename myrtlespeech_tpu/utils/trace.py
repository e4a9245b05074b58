"""Parse a ``jax.profiler`` trace capture into device-op timing rows.

Shared by ``tools/profile_kernels.py`` (the per-kernel roofline table)
and ``bench.py`` (the ``ms_per_step_device`` field): the driver-visible
benchmark needs a tunnel-independent device-time reading, and the only
source of one in this sandbox is the profiler's device lanes.

The reference has no equivalent — its profiling story is TensorBoard
scalars only (SURVEY §5 "Tracing/profiling"); device-op accounting is a
TPU-build addition.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import List, Optional, Tuple

Row = Tuple[str, str, float, int, int]  # (name, hlo_category, us, flops, bytes)


def aggregate_trace(logdir: str) -> Optional[List[Row]]:
    """Parse the newest trace capture under ``logdir`` into op rows.

    Only events on the device process's "XLA Ops" lane count — host
    lanes, the "Steps"/"XLA Modules" wrapper spans, and async markers
    all nest or duplicate the op timings and must be excluded (round-3
    fix: the first cut summed every lane and reported 96% "other").

    Each ``jax.profiler.trace()`` creates a new timestamped run
    directory; summing over ALL of them silently multiplies per-step
    figures by the number of stale captures (observed: exactly 2x with
    one old trace present — round-4 fix).  Aggregate the NEWEST capture
    only.
    """
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        return None
    newest = max(paths, key=lambda p: os.path.dirname(p))
    paths = [p for p in paths
             if os.path.dirname(p) == os.path.dirname(newest)]
    rows: List[Row] = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            events = json.load(f).get("traceEvents", [])
        device_pids = set()
        op_lanes = set()  # (pid, tid) of "XLA Ops" threads
        for e in events:
            if e.get("ph") != "M":
                continue
            if e.get("name") == "process_name" and \
                    "TPU" in e["args"].get("name", ""):
                device_pids.add(e["pid"])
            if e.get("name") == "thread_name" and \
                    e["args"].get("name") == "XLA Ops":
                op_lanes.add((e["pid"], e["tid"]))
        lanes = {pt for pt in op_lanes if pt[0] in device_pids}
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if (e.get("pid"), e.get("tid")) not in lanes:
                continue
            a = e.get("args", {})
            rows.append((e["name"], a.get("hlo_category", "?"), e["dur"],
                         int(a.get("model_flops", 0) or 0),
                         int(a.get("raw_bytes_accessed", 0) or 0)))
    return rows or None


def device_ms(logdir: str) -> Optional[float]:
    """Total device-op milliseconds in the newest capture under logdir.

    Sum of op durations on the device "XLA Ops" lane — the same
    accounting the committed per-kernel tables use, so ``bench.py``'s
    ``ms_per_step_device`` and ``tools/profile_kernels.py`` agree by
    construction — EXCLUDING wrapper ``while`` spans: a capture of an
    N-step ``fori_loop`` has one outer while event covering the whole
    program whose body ops also appear on the lane, so the naive sum
    double-counts (found round 5: a features capture reported ~2x its
    leaf-op time).  A while is treated as a wrapper when its single
    span covers >= 45% of the capture's op time — inner lax scans
    (LSTM time loops, beam frames) stay far below that individually.
    Inter-op gaps are not counted; the residue vs wall is tunnel
    dispatch, not device idle (see docs/performance.md).
    """
    rows = aggregate_trace(logdir)
    if not rows:
        return None
    total = sum(r[2] for r in rows)
    wrappers = sum(r[2] for r in rows
                   if r[0].lower().startswith("while")
                   and r[2] >= 0.45 * total)
    return (total - wrappers) / 1e3
