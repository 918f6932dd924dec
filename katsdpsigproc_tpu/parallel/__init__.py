"""Device-mesh sharding and collective reductions (multi-chip capability)."""

__all__: list = []
