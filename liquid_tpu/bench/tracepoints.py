"""Benchmark tracepoints.

Reference behavior: USDT probes `liquid_benchmark:iteration_start` for
bpftrace (liquid-cache `benchmark/src/tracepoints.rs`, dev/README.md
eBPF section).  Python has no USDT without systemtap extensions; the
equivalent observable marker is a write to a well-known trace file
(uprobe-able) plus an in-process subscriber hook.
"""
from __future__ import annotations

import os
import time
from typing import Callable, List

_subscribers: List[Callable] = []
TRACE_PATH = os.environ.get("LIQUID_TPU_TRACEPOINT_FILE", "")


def subscribe(fn: Callable) -> None:
    _subscribers.append(fn)


def iteration_start(benchmark: str, query_index: int) -> None:
    """Marker fired at each benchmark iteration start
    (ref liquid_benchmark:iteration_start)."""
    for fn in _subscribers:
        fn(benchmark, query_index)
    if TRACE_PATH:
        with open(TRACE_PATH, "a") as f:
            f.write(f"{time.time_ns()} iteration_start "
                    f"{benchmark} {query_index}\n")
