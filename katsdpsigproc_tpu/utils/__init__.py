"""Framework utilities: tuning, async resource ordering, device discovery, shapes."""

from . import backend, profiling, resource, shapes, tune  # noqa: F401

__all__ = ["backend", "profiling", "resource", "shapes", "tune"]
