"""Primitive accelerated operations (Pallas kernels + composable JAX functions)."""

from . import base, fill, maskedsum, percentile, rank, reduce, transpose, wgreduce  # noqa: F401

__all__ = [
    "base",
    "fill",
    "maskedsum",
    "percentile",
    "rank",
    "reduce",
    "transpose",
    "wgreduce",
]
