"""Hello-world: a custom Pallas kernel scaling an array in place.

The TPU-native counterpart of the reference's first example
(reference: doc/user/examples/triple.py — an OpenCL-C kernel compiled at
runtime): here the "kernel source" is a Python function lowered by Pallas,
specialized when traced.  Run on any backend with ``interpret=True`` or on
TPU compiled.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from katsdpsigproc_tpu.utils import backend

backend.apply_platform_env()

try:
    from jax.experimental.pallas import tpu as pltpu

    VMEM = pltpu.VMEM
except ImportError:  # pragma: nocover
    VMEM = None


def multiply_kernel(scale_ref, data_ref, out_ref):
    out_ref[...] = data_ref[...] * scale_ref[0]


def multiply(data, scale, interpret=False):
    return pl.pallas_call(
        multiply_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=getattr(pltpu, "SMEM", None) if not interpret else None),
            pl.BlockSpec(memory_space=VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=VMEM),
        out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
        interpret=interpret,
    )(jnp.asarray([scale], jnp.float32), data)


if __name__ == "__main__":
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    host = np.random.uniform(size=(8, 128)).astype(np.float32)
    out = multiply(jnp.asarray(host), 3.0, interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), host * 3.0, rtol=1e-6)
    print(np.asarray(out))
