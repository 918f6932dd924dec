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


class TestDimension:
    """Reference Dimension contract (accel.py:1115-1294) — requirement
    declaration, union-find linking, conflict detection, freeze-on-bind."""

    def test_required_padded_size(self):
        d = base.Dimension(100, min_padded_round=32)
        assert d.required_padded_size() == 128
        d2 = base.Dimension(100, min_padded_size=130, alignment=8)
        assert d2.required_padded_size() == 136
        assert d2.valid(136) and d2.valid(144) and not d2.valid(130)

    def test_exact(self):
        d = base.Dimension(96, exact=True)
        assert d.valid(96) and not d.valid(128)

    def test_validation(self):
        with pytest.raises(ValueError, match="power of 2"):
            base.Dimension(8, alignment=3)
        with pytest.raises(ValueError, match="less than size"):
            base.Dimension(8, min_padded_size=4)

    def test_link_merges_requirements(self):
        a = base.Dimension(100, min_padded_size=120)
        b = base.Dimension(100, alignment=16)
        a.link(b)
        # Both now expose the union of the requirements.
        assert a.required_padded_size() == 128  # 120 rounded to 16
        assert b.required_padded_size() == 128
        # Transitive linking through the union-find roots
        c = base.Dimension(100, min_padded_size=200)
        b.link(c)
        assert a.required_padded_size() == 208

    def test_link_size_mismatch(self):
        with pytest.raises(ValueError, match="incompatible"):
            base.Dimension(100).link(base.Dimension(101))

    def test_link_exact_conflict(self):
        exact = base.Dimension(96, exact=True)
        needs_pad = base.Dimension(96, min_padded_size=128)
        with pytest.raises(ValueError, match="unsatisfiable"):
            exact.link(needs_pad)

    def test_freeze_blocks_linking(self):
        a = base.Dimension(64)
        a.freeze()
        with pytest.raises(ValueError, match="frozen"):
            a.link(base.Dimension(64))

    def test_slot_padded_shape_honours_dimensions(self):
        dims = [base.Dimension(4, min_padded_size=32),
                base.Dimension(8, min_padded_size=500)]
        slot = base.Slot((4, 8), jnp.float32, base.Direction.IN, dimensions=dims)
        # tile contract gives (8, 128); dimensions raise that to (32, 500→...)
        assert slot.padded_shape == (32, 500)
        plain = base.Slot((4, 8), jnp.float32, base.Direction.IN)
        assert plain.padded_shape == (8, 128)

    def test_sequence_links_compound_dimensions(self):
        """Composition merges padding requirements across children and
        rejects unsatisfiable combinations at construction time."""
        class _WithDims(base.Operation):
            def __init__(self, direction, **dim_kw):
                super().__init__()
                dims = [base.Dimension(4), base.Dimension(8, **dim_kw)]
                self.slots["x"] = base.Slot((4, 8), jnp.float32, direction,
                                            dimensions=dims)

            def _run(self, **inputs):
                if "x" in inputs:
                    return {}
                return {"x": jnp.zeros((4, 8), jnp.float32)}

        prod = _WithDims(base.Direction.OUT, min_padded_size=192)
        cons = _WithDims(base.Direction.IN, alignment=128)
        seq = base.OperationSequence(
            [("p", prod), ("c", cons)], compounds={"x": ["p:x", "c:x"]})
        # 192 rounded up to alignment 128 → 256 on the shared axis
        assert seq.slots["x"].padded_shape[1] == 256

        exact = _WithDims(base.Direction.IN, exact=True)
        with pytest.raises(ValueError, match="axis 1"):
            base.OperationSequence(
                [("p", _WithDims(base.Direction.OUT, min_padded_size=192)),
                 ("c", exact)],
                compounds={"x": ["p:x", "c:x"]})

    def test_bind_freezes_dimensions(self):
        op = _Scale((4, 8), 2.0)
        op.bind(src=jnp.ones((4, 8), jnp.float32))
        with pytest.raises(ValueError, match="frozen"):
            op.slots["src"].dimensions[0].link(base.Dimension(4))
