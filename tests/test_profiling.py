"""Profiling helper tests."""

import jax.numpy as jnp

from katsdpsigproc_tpu.utils import profiling


def test_time_fn():
    calls = []

    def fn():
        calls.append(1)
        return jnp.ones(16) * 2

    dt = profiling.time_fn(fn, iters=3, warmup=1)
    assert dt >= 0
    assert len(calls) == 4


def test_annotate():
    with profiling.annotate("test-region"):
        x = jnp.sum(jnp.ones(8))
    assert float(x) == 8.0
