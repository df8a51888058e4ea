"""Profiling / tracing utilities (SURVEY.md 5.1).

The reference has no tracing at all. molvax exposes:
  * trace(): context manager around jax.profiler - writes a Perfetto/XProf
    trace directory viewable in xprof / perfetto.dev;
  * annotate(): named TraceAnnotation spans (encode/decode/loss show up as
    labeled regions in the trace);
  * cost_summary(): compiled-HLO FLOPs/bytes estimates for a jitted fn - the
    compiler-side speed-of-light numbers used to sanity-check bench results;
  * step_timer(): drain-honest wall timing for async dispatch (the axon PJRT
    tunnel resolves readiness events optimistically on first bursts, so a
    bare block_until_ready under-measures; always fetch to host).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def cost_summary(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compiler cost analysis of a jittable fn at these args: FLOPs, bytes
    accessed, and the bf16/f32 speed-of-light step time on this device."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older API returned one dict per computation
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": flops / bytes_accessed if bytes_accessed else 0.0,
    }


def step_timer(
    step_fn: Callable,
    *args,
    steps: int = 10,
    rounds: int = 3,
    fetch: Optional[Callable] = None,
) -> float:
    """Median drain-honest seconds per invocation of step_fn(*args).

    fetch(out) must pull a scalar to the host (defaults to the first leaf);
    run inside the timed region so the async queue fully drains."""
    if fetch is None:
        fetch = lambda out: float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # noqa: E731
    out = step_fn(*args)
    fetch(out)
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = step_fn(*args)
        fetch(out)
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times[1:] if len(times) > 1 else times))
