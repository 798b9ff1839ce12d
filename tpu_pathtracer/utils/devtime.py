"""Device-time measurement via jax.profiler traces.

The TPU in this environment is reached through a relay whose
`block_until_ready` does NOT reliably block until device completion
(measured: a 137-GFLOP matmul chain "completed" in 0.1 ms => 10,678 TFLOP/s,
50x over hardware peak), so wall-clock timing alone cannot be trusted.  The
profiler, however, records true on-device execution spans.  This module runs
a callable under ``jax.profiler.trace`` and extracts the total device-side
execution time of the jitted program(s).

This is the TPU equivalent of the reference's GPU timestamp queries
(reference: src/timing.ts:28-146): per-program device-nanosecond spans read
back from the runtime rather than host wall time.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile
from typing import Callable


def _load_trace_events(trace_dir: str) -> list:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))
    return events


def _device_pids(events) -> set:
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = (e.get("args") or {}).get("name", "")
            if "TPU" in name or "device" in name.lower():
                if "CPU" not in name:
                    pids.add(e.get("pid"))
    return pids


def device_time(fn: Callable[[], object], *, match: str = "jit_") -> dict:
    """Run ``fn`` under the profiler; return device-side timing totals.

    Returns {"total_s": sum of matching device spans,
             "programs": {name: seconds}, "ok": bool}.
    ``match``: only top-level spans whose name contains this substring count
    toward ``total_s`` (XLA programs show up as ``jit_<fn_name>(...)``);
    everything on a device pid is reported in ``programs``.
    """
    trace_dir = tempfile.mkdtemp(prefix="tpupt_prof_")
    try:
        import jax

        with jax.profiler.trace(trace_dir):
            out = fn()
            for leaf in jax.tree.leaves(out):
                try:
                    import numpy as np

                    np.asarray(leaf).ravel()[:1]  # force real completion
                except Exception:
                    pass
        events = _load_trace_events(trace_dir)
        pids = _device_pids(events)
        programs: dict = {}
        total = 0.0
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in pids:
                continue
            name = e.get("name", "")
            dur_s = float(e.get("dur", 0.0)) / 1e6  # trace durs are in us
            programs[name] = programs.get(name, 0.0) + dur_s
        for name, dur in programs.items():
            if match in name:
                total += dur
        return {"total_s": total, "programs": programs, "ok": bool(pids)}
    except Exception as exc:  # profiler unsupported on some backends
        return {"total_s": 0.0, "programs": {}, "ok": False, "error": repr(exc)}
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
