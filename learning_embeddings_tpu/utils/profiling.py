"""Real profiling utilities (the reference's `profiling.py` contains no
profiler — SURVEY.md §5; on TPU, op-level traces come nearly free).

``trace_steps`` wraps a step callable with `jax.profiler.trace` and
``summarize_trace`` aggregates the resulting trace.json.gz into per-op-class
device-time shares — the exact workflow used to attribute this framework's
ResNet-50 step costs (BASELINE.md)."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Callable, Dict, List, Tuple

import jax

__all__ = ["trace_steps", "summarize_trace"]


def trace_steps(step_fn: Callable, n_steps: int, trace_dir: str,
                sync: Callable = None) -> str:
    """Run `step_fn()` n times under a profiler trace; returns the dir.

    `sync`: callable forcing completion (e.g. lambda out: float(out[1])) —
    required on remote-execution backends where block_until_ready is not a
    real barrier."""
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(n_steps):
            out = step_fn()
        if sync is not None:
            sync(out)
        else:
            jax.block_until_ready(out)
    return trace_dir


def _find_trace_json(trace_dir: str) -> str:
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    return sorted(paths)[-1]


def summarize_trace(trace_dir: str, n_steps: int = 1,
                    top_k: int = 20) -> List[Tuple[str, float, float]]:
    """[(op_class, ms_per_step, share)] sorted by device time."""
    with gzip.open(_find_trace_json(trace_dir)) as f:
        data = json.load(f)
    events = data["traceEvents"]
    names = {
        e["pid"]: str(e.get("args", {}).get("name", ""))
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in names.items() if "TPU" in n}
    if not device_pids:  # CPU backend exposes one '/host:CPU' track
        device_pids = set(names)
    skip = re.compile(r"^(jit_|\d+$)")
    cat: Dict[str, float] = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and e.get("dur") and not skip.match(e["name"])):
            cat[re.sub(r"[.\d]+$", "", e["name"])] += e["dur"]
    total = sum(cat.values()) or 1
    return [(name, d / n_steps / 1e3, d / total)
            for name, d in collections.Counter(cat).most_common(top_k)]
