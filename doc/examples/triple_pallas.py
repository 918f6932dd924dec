#!/usr/bin/env python
"""Triple an array with a hand-written Pallas kernel.

TPU-native analogue of the reference's custom-kernel tutorial
(reference: doc/user/examples/triple.py, sum.py — Mako-templated
CUDA-C/OpenCL-C compiled at runtime): the kernel is Python traced by
Pallas; the grid/BlockSpec play the role of the reference's
global_size/local_size work decomposition.  Runs in interpret mode off
TPU so the example works everywhere.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from katsdpsigproc_tpu.utils import backend

backend.apply_platform_env()

BLOCK = 256  # the analogue of the reference kernel's work-group size


def triple_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 3.0


@jax.jit
def triple(x):
    (n,) = x.shape
    return pl.pallas_call(
        triple_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec((BLOCK,), lambda i: (i,))],
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,)),
        interpret=jax.devices()[0].platform != "tpu",
    )(x)


host = np.random.uniform(size=4 * BLOCK).astype(np.float32)
out = np.asarray(triple(jnp.asarray(host)))
np.testing.assert_allclose(out, host * 3)
print(out[:5])
