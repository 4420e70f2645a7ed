"""Device-time measurement helpers.

The pipeline's completion-gap estimate (parallel/pipeline.py) equals device
time only when the in-flight queue is saturated (round-2 review Weak #7).
This module provides the cross-check: an opt-in jax.profiler trace around a
propagation call, and a saturation-aware flag on the statistics.

Note for this repo's TPU relay: `jax.profiler` needs a local TPU runtime;
through the axon relay the trace captures host-side events only, so prefer
`profile_device_time` (repeat-and-subtract wall timing with forced syncs)
when the profiler is unavailable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler.trace wrapper (view with TensorBoard / xprof).  Safe to
    use where a real local TPU runtime exists; on relayed backends the
    device timeline is absent."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_device_time(fn: Callable[[], object], reps: int = 5,
                        warmup: int = 1) -> dict:
    """Estimate a jitted call's device execution time by saturating the
    dispatch queue: launch `reps` calls back-to-back and divide the
    span between the first and last completion -- with async dispatch the
    host-side launch gap vanishes and the measurement converges to device
    time (the CL_PROFILING_COMMAND_START/END role,
    I3CLSimStepToPhotonConverterOpenCL.cxx:1092-1135).

    `fn` must return a jax array (synced via a host transfer; see
    CLAUDE.md: block_until_ready is unreliable through the axon relay).
    """
    def sync(v):
        return float(jnp.sum(v))

    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    sync(fn())
    first = time.perf_counter()
    for _ in range(reps - 1):
        out = fn()
    sync(out)
    last = time.perf_counter()
    per_call_saturated = (last - first) / max(reps - 1, 1)
    return {
        "device_time_s": per_call_saturated,
        "first_call_s": first - t0,
        "queue_saturated": reps > 1,
    }
