"""A custom operation with slots, a template, and autotuning.

TPU-native counterpart of the reference's triple_op/triple_tune examples
(reference: doc/user/examples/triple_op_template.py, triple_tune.py): a
``Triple`` operation wrapped in the Template/Operation convention with a
tunable block size, usable functionally or bind-then-call.
"""

import jax.numpy as jnp
import numpy as np

from katsdpsigproc_tpu.ops import base
from katsdpsigproc_tpu.utils import backend, tune


class TripleTemplate:
    autotune_version = 0

    def __init__(self, context, tuning=None):
        self.context = context
        if tuning is None:
            tuning = self.autotune(context)
        self.block = tuning["block"]

    @classmethod
    @tune.autotuner(test={"block": 128})
    def autotune(cls, context):
        data = jnp.ones((4096, 4096), jnp.float32)

        def generate(block):
            op = cls(context, tuning={"block": block}).instantiate(None, data.shape)
            return tune.make_measure(lambda: op(src=data)["dest"])

        return tune.autotune(generate, block=[128, 256, 512])

    def instantiate(self, command_queue=None, shape=()):
        return Triple(self, shape)


class Triple(base.Operation):
    """.. rubric:: Slots

    **src** : input float32
    **dest** : output float32 (3 × src)
    """

    def __init__(self, template, shape):
        super().__init__()
        self.template = template
        self.slots["src"] = base.Slot(shape, jnp.float32, base.Direction.IN)
        self.slots["dest"] = base.Slot(shape, jnp.float32, base.Direction.OUT)

    def _run(self, src):
        return {"dest": src * 3.0}

    def parameters(self):
        return {"block": self.template.block}


if __name__ == "__main__":
    ctx = backend.create_some_context()
    template = TripleTemplate(ctx, tuning={"block": 128})
    op = template.instantiate(None, (50,))
    host = np.random.uniform(size=50).astype(np.float32)
    out = op(src=jnp.asarray(host))["dest"]
    np.testing.assert_allclose(np.asarray(out), host * 3, rtol=1e-6)
    print(np.asarray(out))
