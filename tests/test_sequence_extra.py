"""Deeper OperationSequence coverage (reference: test/test_accel.py:574-793
slot/sequence logic, adapted to the pure-function design)."""

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.ops import base


class _Add(base.Operation):
    def __init__(self, shape, const):
        super().__init__()
        self.const = const
        self.slots["src"] = base.Slot(shape, jnp.float32, base.Direction.IN)
        self.slots["dest"] = base.Slot(shape, jnp.float32, base.Direction.OUT)

    def _run(self, src):
        return {"dest": src + self.const}


class _Join(base.Operation):
    def __init__(self, shape):
        super().__init__()
        self.slots["a"] = base.Slot(shape, jnp.float32, base.Direction.IN)
        self.slots["b"] = base.Slot(shape, jnp.float32, base.Direction.IN)
        self.slots["dest"] = base.Slot(shape, jnp.float32, base.Direction.OUT)

    def _run(self, a, b):
        return {"dest": a * b}


def test_diamond_dataflow():
    """One producer feeding two consumers feeding a join."""
    shape = (8, 16)
    seq = base.OperationSequence(
        [
            ("src_op", _Add(shape, 1.0)),
            ("left", _Add(shape, 10.0)),
            ("right", _Add(shape, 100.0)),
            ("join", _Join(shape)),
        ],
        compounds={
            "x": ["src_op:src"],
            "mid": ["src_op:dest", "left:src", "right:src"],
            "l": ["left:dest", "join:a"],
            "r": ["right:dest", "join:b"],
            "out": ["join:dest"],
        },
    )
    x = jnp.zeros(shape, jnp.float32)
    out = seq(x=x)["out"]
    np.testing.assert_allclose(np.asarray(out), 11.0 * 101.0)


def test_bound_style_sequence():
    shape = (4, 4)
    seq = base.OperationSequence(
        [("a", _Add(shape, 2.0)), ("b", _Add(shape, 3.0))],
        compounds={"x": ["a:src"], "m": ["a:dest", "b:src"], "y": ["b:dest"]},
    )
    seq.bind(x=jnp.ones(shape, jnp.float32))
    seq()
    np.testing.assert_allclose(np.asarray(seq.buffer("y")), 6.0)
    # intermediates retrievable too (reference buffer() semantics)
    np.testing.assert_allclose(np.asarray(seq.buffer("m")), 3.0)


def test_duplicate_child_names_rejected():
    shape = (4, 4)
    with pytest.raises(ValueError):
        base.OperationSequence([("a", _Add(shape, 1.0)), ("a", _Add(shape, 2.0))])


def test_unknown_compound_members_rejected():
    shape = (4, 4)
    with pytest.raises(KeyError):
        base.OperationSequence([("a", _Add(shape, 1.0))], compounds={"x": ["b:src"]})
    with pytest.raises(KeyError):
        base.OperationSequence([("a", _Add(shape, 1.0))], compounds={"x": ["a:nosuch"]})


def test_required_bytes_accounts_all_slots():
    shape = (8, 128)
    seq = base.OperationSequence(
        [("a", _Add(shape, 1.0)), ("b", _Add(shape, 2.0))],
        compounds={"x": ["a:src"], "m": ["a:dest", "b:src"], "y": ["b:dest"]},
    )
    assert seq.required_bytes() == 3 * 8 * 128 * 4
