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


def time_scan(fn: Callable, args, iters: int = 20, warmup: bool = True,
              reps: int = 3) -> float:
    """Seconds per call of `fn(*args)`, iterations serialized ON-CHIP.

    The only honest timing under this machine's remote-execution tunnel
    (see CLAUDE.md): a Python dispatch loop over the same (program, input)
    pays a full RPC round trip per iteration (measured 52 ms/iter for a
    4 ms computation), while distinct-input loops overlap round trips and
    under-report.  Here the loop is a ``lax.scan`` *inside one jit*: one
    dispatch, `iters` back-to-back executions on the chip, one scalar
    fetch.  A loop-carried, data-dependent zero (``sum(out) * 0.0``) is
    added to the first argument so XLA can neither hoist the body nor CSE
    iterations, while the computed values stay bit-identical.

    The output passes through ``lax.optimization_barrier`` before the
    scalar reduction: without it, the algebraic simplifier folds
    layout-only work into the reduction — ``sum(transpose(x))`` →
    ``sum(x)`` — and a pure data-movement benchmark measures nothing
    (bench.py config 3 read 0.000 ms this way).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    args = tuple(args)

    def make(length):
        # Complex dtypes: the axon backend has no complex COMPUTE, so the
        # carry injection and the output reduction go through a float32
        # bitcast view (bitcasts are free and always supported).
        def inject(x, carry):
            if jnp.issubdtype(x.dtype, jnp.complexfloating):
                as_f32 = lax.bitcast_convert_type(x, jnp.float32)
                return lax.bitcast_convert_type(as_f32 + carry, x.dtype)
            return x + carry

        def reduce_leaf(leaf):
            if jnp.issubdtype(leaf.dtype, jnp.complexfloating):
                leaf = lax.bitcast_convert_type(leaf, jnp.float32)
            return jnp.sum(leaf.astype(jnp.float32))

        @jax.jit
        def program(*a):
            def body(carry, _):
                first = inject(a[0], carry)  # carry == 0.0 always, but data-dependent
                out = lax.optimization_barrier(fn(first, *a[1:]))
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(reduce_leaf(leaf) for leaf in leaves)
                return s * 0.0, s
            _, ss = lax.scan(body, jnp.float32(0.0), None, length=length)
            return jnp.sum(ss)
        return program

    prog_n, prog_1 = make(iters), make(1)

    def run(prog):
        start = time.perf_counter()
        np.asarray(prog(*args))
        return time.perf_counter() - start

    if warmup:
        run(prog_1)  # compile both + absorb first-dispatch effects
        run(prog_n)
    # min-of-reps on both windows: a single (t1, tn) pair is dominated by
    # tunnel jitter for µs-scale bodies and can even go negative after the
    # subtraction (bench config 2's maskedsum once "measured" 0.000 ms).
    t1 = min(run(prog_1) for _ in range(reps))
    tn = min(run(prog_n) for _ in range(reps))
    # Subtracting the single-execution window removes the constant
    # dispatch/fetch overhead; the result is pure marginal per-iteration
    # on-chip time.
    return max(tn - t1, 1e-9) / (iters - 1)


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
