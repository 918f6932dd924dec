"""The driver entry points must compile and run on the CPU mesh."""

import jax
import numpy as np
import pytest


def test_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 128)
    assert np.asarray(out).dtype == np.uint8


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
