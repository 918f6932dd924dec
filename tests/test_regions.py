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


@pytest.mark.slow
def test_fuzz_vs_numpy_semantics():
    """100 random region pairs: copy_region == numpy slice assignment.

    Slices are generated with (stop - start) % stride == 0 so the
    reference's truncating length formula (accel.py:633) coincides with
    numpy's; ints, newaxis, and implied trailing axes are mixed in.
    """
    rs = np.random.RandomState(seed=11)

    def random_region(shape, sel_shape_out):
        region = []
        for dim in shape:
            kind = rs.choice(["slice", "int", "full", "stop"])
            if kind == "int":
                region.append(int(rs.randint(dim)))
            elif kind == "full":
                region.append(np.s_[:])
                sel_shape_out.append(dim)
            elif kind == "stop":
                n = int(rs.randint(1, dim + 1))
                start = int(rs.randint(0, dim - n + 1))
                region.append(slice(start, start + n))
                sel_shape_out.append(n)
            else:
                stride = int(rs.randint(1, min(3, dim) + 1))
                n = int(rs.randint(1, dim // stride + 1))
                start = int(rs.randint(0, dim - n * stride + 1))
                region.append(slice(start, start + n * stride, stride))
                sel_shape_out.append(n)
        if rs.rand() < 0.3 and region and isinstance(region[-1], slice):
            region.pop()  # implied trailing axis selects the whole axis
            sel_shape_out[-1] = shape[-1]
        return tuple(region)

    for trial in range(100):
        ndim = int(rs.randint(1, 4))
        src_shape = tuple(int(rs.randint(1, 9)) for _ in range(ndim))
        sel = []
        src_region = random_region(src_shape, sel)
        # destination: same selection shape, fresh layout
        dest_shape = tuple(s + int(rs.randint(0, 3)) for s in sel) or (1,)
        dest_region = tuple(slice(0, s) for s in sel) or (slice(0, 1),)
        if not sel:
            dest_shape, dest_region = (), ()
        h_src = rs.uniform(size=src_shape).astype(np.float32)
        h_dest = rs.uniform(size=dest_shape).astype(np.float32)
        out = regions.copy_region(jnp.asarray(h_src), jnp.asarray(h_dest),
                                  src_region, dest_region)
        expected = h_dest.copy()
        expected[dest_region] = h_src[src_region].reshape(
            expected[dest_region].shape)
        np.testing.assert_array_equal(expected, np.asarray(out),
                                      err_msg=f"trial {trial}: {src_region} -> {dest_region}")


def test_copy_region_donated_matches_eager():
    rs = np.random.RandomState(seed=3)
    h_src = rs.uniform(size=(10, 12)).astype(np.float32)
    h_dest = rs.uniform(size=(12, 10)).astype(np.float32)
    sr, dr = np.s_[2:6, 3:9], np.s_[4:8, 1:7]
    eager = regions.copy_region(jnp.asarray(h_src), jnp.asarray(h_dest), sr, dr)
    donated = regions.copy_region_donated(jnp.asarray(h_src), jnp.asarray(h_dest), sr, dr)
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(donated))


def test_copy_region_donated_caches_and_loops():
    # Steady-state loop: the jitted program is compiled once per signature
    # and the destination is donated each iteration.
    regions._DONATED_CACHE.clear()
    dest = jnp.zeros((16, 16), jnp.float32)
    for i in range(4):
        src = jnp.full((8, 8), float(i + 1), jnp.float32)
        dest = regions.copy_region_donated(src, dest, np.s_[0:8, 0:8],
                                           np.s_[4:12, 4:12])
    assert len(regions._DONATED_CACHE) == 1
    out = np.asarray(dest)
    np.testing.assert_allclose(out[4:12, 4:12], 4.0)
    np.testing.assert_allclose(out[:4], 0.0)


def test_copy_region_donated_validates():
    with pytest.raises(ValueError):
        regions.copy_region_donated(jnp.zeros((4, 4)), jnp.zeros((4, 4)),
                                    np.s_[0:2, 0:2], np.s_[0:3, 0:3])
