"""Deprecated alias for :mod:`katsdpsigproc_tpu.utils.resource`.

The reference ships the same shim for downstream packages that import the
pre-rename path (reference: src/katsdpsigproc/asyncio/resource.py:19-26).
"""

import warnings

from ..utils.resource import *  # noqa: F401,F403
from ..utils.resource import __all__  # noqa: F401

warnings.warn(
    "katsdpsigproc_tpu.asyncio.resource is deprecated; "
    "use katsdpsigproc_tpu.utils.resource",
    DeprecationWarning,
    stacklevel=2,
)
