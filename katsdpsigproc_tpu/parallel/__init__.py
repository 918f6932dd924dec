"""Device-mesh sharding and collective reductions (multi-chip capability)."""

from . import collectives, flagger, mesh  # noqa: F401

__all__ = ["collectives", "flagger", "mesh"]
