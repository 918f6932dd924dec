"""Flagger model families (the reference's ``rfi/`` subsystem)."""

from . import rfi  # noqa: F401

__all__ = ["rfi"]
