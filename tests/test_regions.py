"""Region-copy API tests (reference test/test_accel.py:161-335)."""

import numpy as np
import pytest

import jax.numpy as jnp

from katsdpsigproc_tpu.utils import regions


def _roundtrip(src_shape, dest_shape, src_region, dest_region):
    """Mirror the reference's _test_copy_region: exercise all three calls."""
    rs = np.random.RandomState(seed=42)
    h_src = rs.uniform(size=src_shape).astype(np.float32)
    h_dest = rs.uniform(size=dest_shape).astype(np.float32)

    # copy_region (device -> device)
    out = regions.copy_region(jnp.asarray(h_src), jnp.asarray(h_dest),
                              src_region, dest_region)
    expected = h_dest.copy()
    src_index, _ = regions.canonical_region(src_region, src_shape)
    dest_index, _ = regions.canonical_region(dest_region, dest_shape)
    expected[dest_index] = h_src[src_index].reshape(expected[dest_index].shape)
    np.testing.assert_array_equal(expected, np.asarray(out))

    # set_region (host -> device)
    out = regions.set_region(jnp.asarray(h_dest), h_src, dest_region, src_region)
    np.testing.assert_array_equal(expected, np.asarray(out))

    # get_region (device -> host)
    h_out = h_dest.copy()
    regions.get_region(jnp.asarray(h_src), h_out, src_region, dest_region)
    np.testing.assert_array_equal(expected, h_out)


def test_copy_region_4d():
    _roundtrip((10, 12, 14, 16), (5, 6, 7, 8),
               np.s_[2:7, 3:9, 4:11, 5:13], np.s_[0:5, 0:6, 0:7, 0:8])


def test_copy_region_0d():
    _roundtrip((), (), (), ())


def test_copy_region_1d():
    _roundtrip((10,), (10,), np.s_[2:6], np.s_[4:8])


def test_copy_region_2d():
    _roundtrip((10, 12), (12, 10), np.s_[2:6, 3:9], np.s_[4:8, 1:7])


def test_copy_region_missing_axes():
    # Fewer indices than axes selects the whole trailing axes.
    _roundtrip((10, 12), (10, 12), np.s_[2:3], np.s_[4:5])


def test_copy_region_int_collapse():
    _roundtrip((10, 12), (12,), np.s_[3], np.s_[:])


def test_copy_region_newaxis():
    _roundtrip((10,), (3, 10), np.s_[np.newaxis, 2:8], np.s_[1:2, 0:6])


def test_copy_region_negative_index():
    _roundtrip((10, 12), (12,), np.s_[-1], np.s_[:])


def test_copy_region_strided():
    # Reference length formula (stop - start) // stride (accel.py:633).
    index, sel = regions.canonical_region(np.s_[0:10:3], (10,))
    assert sel == (3,)
    assert index == (slice(0, 9, 3),)
    _roundtrip((10,), (3,), np.s_[0:9:3], np.s_[:])


def test_copy_region_errors():
    with pytest.raises(IndexError):  # too many axes
        _roundtrip((10,), (10,), np.s_[3, 4], np.s_[5, 6])
    with pytest.raises(IndexError):  # out-of-range single index
        _roundtrip((10,), (10,), np.s_[5], np.s_[10])
    with pytest.raises(IndexError):  # out-of-range slice clamps to empty
        _roundtrip((10,), (10,), np.s_[10:12], np.s_[8:10])
    with pytest.raises(IndexError):  # empty slice
        _roundtrip((10,), (10,), np.s_[2:2], np.s_[3:3])
    with pytest.raises(IndexError):  # negative stride
        _roundtrip((10,), (10,), np.s_[3:0:-1], np.s_[4:1:-1])
    with pytest.raises(ValueError):  # shape mismatch between regions
        _roundtrip((10,), (10,), np.s_[0:4], np.s_[0:5])
    with pytest.raises(TypeError):  # invalid index type
        regions.canonical_region(np.s_[0:4, "x"], (10, 10))
    with pytest.raises(TypeError):  # dtype mismatch
        regions.copy_region(jnp.zeros(4, jnp.float32), jnp.zeros(4, jnp.int32),
                            np.s_[:], np.s_[:])
