"""Profiling helpers.

The reference exposes device-event timing (``AbstractEvent.time_since``,
profiled command queues — reference: abc.py:82-95, opencl.py:630-656) for
manual kernel timing, plus ``-lineinfo`` source mapping for vendor
profilers (cuda.py:48-51).  The TPU-native equivalents (SURVEY.md §5):

* :func:`time_fn` — wall-clock timing brackets around
  ``block_until_ready`` (the analogue of the tuning queues' event pairs);
* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard/Perfetto trace, where XLA/Pallas kernels appear with their
  Python source attribution (the ``#line`` analogue is built into JAX).
"""

import contextlib
import time
from typing import Callable

import jax


def time_fn(fn: Callable[[], object], iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call of `fn` (blocking on its result)."""
    import numpy as np

    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - start)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace under `log_dir` (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Name a region in the profiler timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
