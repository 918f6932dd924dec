"""Deprecated shim test (reference: asyncio/resource.py:19-26)."""

import warnings


def test_shim_warns_and_reexports():
    import importlib

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        import katsdpsigproc_tpu.asyncio.resource as shim

        importlib.reload(shim)
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    from katsdpsigproc_tpu.utils import resource

    assert shim.Resource is resource.Resource
    assert shim.JobQueue is resource.JobQueue
