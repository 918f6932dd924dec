"""Tests for the operation framework (reference: test/test_accel.py slot/sequence logic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.ops import base
from katsdpsigproc_tpu.utils import shapes


class _Scale(base.Operation):
    def __init__(self, shape, factor):
        super().__init__()
        self.factor = factor
        self.slots["src"] = base.Slot(shape, jnp.float32, base.Direction.IN)
        self.slots["dest"] = base.Slot(shape, jnp.float32, base.Direction.OUT)

    def _run(self, src):
        return {"dest": src * self.factor}

    def parameters(self):
        return {"factor": self.factor}


class _AddOne(base.Operation):
    def __init__(self, shape):
        super().__init__()
        self.slots["src"] = base.Slot(shape, jnp.float32, base.Direction.IN)
        self.slots["dest"] = base.Slot(shape, jnp.float32, base.Direction.OUT)

    def _run(self, src):
        return {"dest": src + 1.0}


class TestOperation:
    def test_functional_call(self):
        op = _Scale((4, 8), 2.0)
        x = jnp.arange(32, dtype=jnp.float32).reshape(4, 8)
        out = op(src=x)
        np.testing.assert_allclose(out["dest"], np.asarray(x) * 2)

    def test_bound_call(self):
        op = _Scale((4, 8), 3.0)
        x = jnp.ones((4, 8), jnp.float32)
        op.bind(src=x)
        op()
        np.testing.assert_allclose(op.buffer("dest"), 3.0)

    def test_ensure_all_bound(self):
        op = _Scale((4, 8), 3.0)
        op.ensure_all_bound()
        op()
        np.testing.assert_allclose(op.buffer("dest"), 0.0)

    def test_ensure_all_bound_allocates_outputs(self):
        # The reference allocates EVERY unbound slot (accel.py:1692-1696):
        # buffer() on an output slot works before the first call.
        op = _Scale((4, 8), 3.0)
        op.ensure_all_bound()
        dest = op.buffer("dest")
        assert dest.shape == (4, 8)
        np.testing.assert_allclose(np.asarray(dest), 0.0)
        # Calling replaces the placeholder with the computed value.
        op.bind(src=jnp.ones((4, 8), jnp.float32))
        op()
        np.testing.assert_allclose(np.asarray(op.buffer("dest")), 3.0)

    def test_validation(self):
        op = _Scale((4, 8), 2.0)
        with pytest.raises(ValueError):
            op.bind(src=jnp.ones((4, 9), jnp.float32))
        with pytest.raises(TypeError):
            op.bind(src=jnp.ones((4, 8), jnp.int32))
        with pytest.raises(KeyError):
            op.bind(nosuch=jnp.ones((4, 8), jnp.float32))

    def test_required_bytes(self):
        op = _Scale((4, 8), 2.0)
        # two float32 slots, padded to the (8, 128) float32 tile
        assert op.required_bytes() == 2 * 8 * 128 * 4


class TestOperationSequence:
    def _make(self):
        scale = _Scale((4, 8), 2.0)
        add = _AddOne((4, 8))
        return base.OperationSequence(
            [("scale", scale), ("add", add)],
            compounds={
                "src": ["scale:src"],
                "mid": ["scale:dest", "add:src"],
                "dest": ["add:dest"],
            },
        )

    def test_chain(self):
        seq = self._make()
        x = jnp.full((4, 8), 5.0, jnp.float32)
        out = seq(src=x)
        np.testing.assert_allclose(out["dest"], 11.0)

    def test_slot_names(self):
        seq = self._make()
        assert set(seq.slots) == {"src", "mid", "dest"}
        assert seq.slots["src"].direction == base.Direction.IN
        assert seq.slots["dest"].direction == base.Direction.OUT

    def test_unwired_slots_get_prefixed_names(self):
        scale = _Scale((4, 8), 2.0)
        seq = base.OperationSequence([("s", scale)])
        assert set(seq.slots) == {"s:src", "s:dest"}

    def test_child_invalidation_propagates(self):
        """Mutating a child's baked-in state (Fill.set_value) re-traces the
        parent sequence, not just the child."""
        from katsdpsigproc_tpu.ops import fill, reduce as reduce_op
        from katsdpsigproc_tpu.utils import tune as tune_mod

        f = fill.Fill(fill.FillTemplate(None, np.float32, tuning={}), (3, 4))
        r = reduce_op.HReduceTemplate(None, np.float32, op="plus", tuning={}).instantiate(
            shape=(3, 4)
        )
        seq = base.OperationSequence(
            [("fill", f), ("hreduce", r)],
            compounds={"src": ["fill:data", "hreduce:src"], "dest": ["hreduce:dest"]},
        )
        f.set_value(2.0)
        seq()
        np.testing.assert_allclose(np.asarray(seq.buffer("dest")), 8.0)
        f.set_value(5.0)
        seq()
        np.testing.assert_allclose(np.asarray(seq.buffer("dest")), 20.0)

    def test_compound_shape_mismatch(self):
        scale = _Scale((4, 8), 2.0)
        add = _AddOne((8, 4))
        with pytest.raises(ValueError):
            base.OperationSequence(
                [("scale", scale), ("add", add)],
                compounds={"mid": ["scale:dest", "add:src"], "src": ["scale:src"]},
            )
        # scale:dest is produced before add:src consumes it, so building the
        # sequence in execution order raises on the IN side against OUT shape.

    def test_parameters(self):
        seq = self._make()
        assert seq.parameters()["scale"] == {"factor": 2.0}

    def test_visualize(self):
        seq = self._make()
        dot = base.visualize_operation(seq)
        assert "digraph" in dot
        assert '"slot:mid"' in dot
        assert '"scale"' in dot


class TestShapes:
    def test_padded_shape(self):
        assert shapes.padded_shape((100, 100), jnp.float32) == (104, 128)
        assert shapes.padded_shape((3, 100, 100), jnp.bfloat16) == (3, 112, 128)
        assert shapes.padded_shape((5,), jnp.float32) == (128,)

    def test_pad_crop_roundtrip(self):
        x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
        padded = shapes.pad_tiles(x, pad_value=-1)
        assert padded.shape == (8, 128)
        assert padded[0, 4] == -1
        np.testing.assert_array_equal(shapes.crop_to(padded, (3, 4)), np.asarray(x))

    def test_divup_roundup(self):
        assert shapes.divup(7, 3) == 3
        assert shapes.roundup(7, 3) == 9
        assert shapes.roundup(6, 3) == 6


def test_pad_to_and_crop_roundtrip():
    x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    padded = shapes.pad_to(x, (5, 6), pad_value=jnp.nan)
    assert padded.shape == (5, 6)
    assert bool(jnp.isnan(padded[3:, :]).all()) and bool(jnp.isnan(padded[:, 4:]).all())
    np.testing.assert_array_equal(np.asarray(shapes.crop_to(padded, (3, 4))), np.asarray(x))
    assert shapes.pad_to(x, (3, 4)) is x  # no-op returns the same array


def test_as_output():
    from katsdpsigproc_tpu.ops import base as ops_base

    arr = jnp.zeros(3)
    assert ops_base.as_output("dest", arr) == {"dest": arr}
