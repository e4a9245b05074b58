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
        per_lane = {}
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            key = (e.get("pid"), e.get("tid"))
            if key not in lanes:
                continue
            per_lane.setdefault(key, []).append(e)
        for evs in per_lane.values():
            rows.extend(_self_time_rows(evs))
    return rows or None


def _self_time_rows(events) -> List[Row]:
    """Convert one lane's span events into SELF-time rows.

    Container spans (``while``/``fusion`` wrappers around lax scan
    bodies, the profiling harness's own fori_loop) cover their children,
    which ALSO appear on the lane — summing raw durations double-counts
    every nested region (found round 5: the 15 s per-kernel table read
    201 ms/step against a 169 ms quiet wall because the chunked-joint
    scan's body ops were counted inside AND beside their while span).
    Self time = span duration minus the duration of immediate children,
    computed with a nesting sweep over start-sorted events.
    """
    evs = sorted(events, key=lambda e: (e["ts"], -e["dur"]))
    out: List[Row] = []
    stack = []  # [end_ts, self_us, event]
    def emit(frame):
        e = frame[2]
        a = e.get("args", {})
        out.append((e["name"], a.get("hlo_category", "?"),
                    max(frame[1], 0.0),
                    int(a.get("model_flops", 0) or 0),
                    int(a.get("raw_bytes_accessed", 0) or 0)))
    for e in evs:
        ts, dur = e["ts"], e["dur"]
        while stack and stack[-1][0] <= ts + 1e-9:
            emit(stack.pop())
        if stack:  # nested: subtract from the parent's self time
            stack[-1][1] -= dur
        stack.append([ts + dur, float(dur), e])
    while stack:
        emit(stack.pop())
    return out


def device_ms(logdir: str) -> Optional[float]:
    """Total device-op milliseconds in the newest capture under logdir.

    Sum of SELF-time op durations on the device "XLA Ops" lane (see
    ``_self_time_rows`` — container spans contribute only their own
    loop/control overhead, so nothing is double-counted and no wrapper
    heuristics are needed).  The same accounting backs the per-kernel
    tables, so ``bench.py``'s ``ms_per_step_device`` and
    ``tools/profile_kernels.py`` agree by construction.  Inter-op gaps
    are not counted; the residue vs wall is tunnel dispatch, not device
    idle (see docs/performance.md).
    """
    rows = aggregate_trace(logdir)
    if not rows:
        return None
    return sum(r[2] for r in rows) / 1e3
