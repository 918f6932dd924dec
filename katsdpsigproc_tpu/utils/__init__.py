"""Framework utilities: tuning, async resource ordering, device discovery, shapes."""

from . import backend, shapes, tune  # noqa: F401

__all__ = ["backend", "shapes", "tune"]
