"""Primitive accelerated operations (Pallas kernels + composable JAX functions)."""

from . import base  # noqa: F401

__all__ = ["base"]
