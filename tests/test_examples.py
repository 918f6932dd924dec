"""Doc examples must run (reference: doc/user/examples/test_triple.py)."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "doc" / "examples"


def test_triple_kernel():
    sys.path.insert(0, str(EXAMPLES))
    try:
        import triple  # noqa: PLC0415

        import jax.numpy as jnp

        host = np.random.RandomState(1).uniform(size=(8, 128)).astype(np.float32)
        out = triple.multiply(jnp.asarray(host), 3.0, interpret=True)
        np.testing.assert_allclose(np.asarray(out), host * 3, rtol=1e-6)
    finally:
        sys.path.pop(0)


def test_triple_op(patch_autotune):
    sys.path.insert(0, str(EXAMPLES))
    try:
        import triple_op  # noqa: PLC0415

        import jax.numpy as jnp
        from katsdpsigproc_tpu.utils import backend

        ctx = backend.create_some_context()
        template = triple_op.TripleTemplate(ctx)
        assert template.block == 128  # the stubbed test config
        op = template.instantiate(None, (50,))
        host = np.random.RandomState(1).uniform(size=50).astype(np.float32)
        out = op(src=jnp.asarray(host))["dest"]
        np.testing.assert_allclose(np.asarray(out), host * 3, rtol=1e-6)
        assert op.parameters() == {"block": 128}
    finally:
        sys.path.pop(0)
