"""Framework utilities: tuning, async resource ordering, device discovery, shapes."""

from . import backend, resource, shapes, tune  # noqa: F401

__all__ = ["backend", "resource", "shapes", "tune"]
