"""Profiling and step-timing hooks.

The reference has no tracing (SURVEY.md section 5: ad-hoc time.time() prints
only).  This module provides: a step timer with EMA summaries, a context
manager around jax.profiler tracing (graceful when the backend lacks profiler
support, as the tunneled single-chip environment does), and a device-memory
snapshot helper.
"""

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax


class StepTimer:
    """Accumulates per-stage wall times; blocking is the caller's job

    (time around block_until_ready for honest numbers)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if name in self.times:
            self.times[name] = self.ema * self.times[name] + (1 - self.ema) * dt
        else:
            self.times[name] = dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: round(v * 1000, 2) for k, v in self.times.items()}  # ms


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler.trace when supported; silently a no-op otherwise."""
    if not trace_dir:
        yield
        return
    try:
        with jax.profiler.trace(trace_dir):
            yield
    except Exception:
        yield


def device_memory_stats() -> Dict[str, int]:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                out[str(d)] = {
                    k: v for k, v in stats.items()
                    if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                }
        except Exception:
            continue
    return out


def dump_timings(path: str, timer: StepTimer, extra: Optional[dict] = None):
    rec = {"timings_ms": timer.summary(), **(extra or {})}
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "a") as f:
        f.write(json.dumps(rec) + "\n")
