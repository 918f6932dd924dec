"""Public test utilities for downstream packages.

Reference: src/katsdpsigproc/test/__init__.py (the reference ships its
legacy test helpers as an importable public module so that downstream
packages can decorate their own device tests).
"""
