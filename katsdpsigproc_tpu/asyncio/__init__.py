"""Deprecated alias package (reference: src/katsdpsigproc/asyncio/__init__.py)."""
