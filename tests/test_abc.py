"""The framework's own classes must satisfy the public protocols."""

import numpy as np

from katsdpsigproc_tpu import abc as fw_abc
from katsdpsigproc_tpu.ops import fill, transpose
from katsdpsigproc_tpu.utils import backend


def test_templates_and_ops_satisfy_protocols(patch_autotune):
    ctx = backend.create_some_context()
    template = fill.FillTemplate(ctx, np.float32)
    assert isinstance(template, fw_abc.AbstractTemplate)
    op = template.instantiate(None, (8, 8))
    assert isinstance(op, fw_abc.AbstractOperation)
    t2 = transpose.TransposeTemplate(ctx, np.float32)
    assert isinstance(t2, fw_abc.AbstractTemplate)
    assert isinstance(t2.instantiate(None, (8, 8)), fw_abc.AbstractOperation)


def test_event_protocol():
    class Ev:
        def wait(self):
            return None

    assert isinstance(Ev(), fw_abc.AbstractEventLike)
