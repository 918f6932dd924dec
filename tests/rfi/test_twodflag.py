"""Tests for the 2-D SumThreshold flagger.

Mirrors the reference's test suite structure and tolerances
(reference: test/rfi/test_twodflag.py) — scipy references for the Gaussian
machinery, hand-computed vectors for placement semantics, and statistical
planted-RFI recovery for the full flagger.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.models.rfi import twodflag


def _np(x):
    return np.asarray(x)


class TestAverageFreq:
    def setup_method(self):
        # 2 times × 6 freq × 2 baselines
        self.data = np.arange(24, dtype=np.float32).reshape(2, 6, 2) + 1.0
        self.flags = np.zeros(self.data.shape, np.uint8)

    def test_one(self):
        avg_data, avg_flags = twodflag._average_freq(self.data, self.flags, 1)
        assert _np(avg_data).dtype == np.float32
        np.testing.assert_array_equal(np.moveaxis(self.data, -1, 0), _np(avg_data))
        assert not _np(avg_flags).any()

    def test_divides(self):
        avg_data, avg_flags = twodflag._average_freq(self.data, self.flags, 2)
        expected = 0.5 * (self.data[:, 0::2] + self.data[:, 1::2])
        np.testing.assert_array_equal(np.moveaxis(expected, -1, 0), _np(avg_data))

    def test_uneven(self):
        data = self.data[:, :5]
        flags = self.flags[:, :5]
        avg_data, avg_flags = twodflag._average_freq(data, flags, 2)
        assert _np(avg_data).shape == (2, 2, 3)
        # Last bin has a single channel
        np.testing.assert_array_equal(_np(avg_data)[:, :, 2], np.moveaxis(data[:, 4], -1, 0))

    def test_flagged_and_nan(self):
        self.flags[0, 0, 0] = 1
        self.data[0, 1, 0] = np.nan
        avg_data, avg_flags = twodflag._average_freq(self.data, self.flags, 2)
        # First bin of baseline 0, time 0 is fully excluded → 0 + flag
        assert _np(avg_data)[0, 0, 0] == 0
        assert _np(avg_flags)[0, 0, 0]
        assert not _np(avg_flags)[1, 0, 0]


def test_time_median():
    data = np.array(
        [[1.0, 2.0, 3.0], [2.0, 4.0, 8.0], [3.0, 6.0, 9.0], [4.0, 8.0, 12.0]], np.float32
    )
    flags = np.zeros(data.shape, bool)
    flags[:, 2] = True
    flags[1, 1] = True
    out_data, out_flags = twodflag._time_median(jnp.asarray(data), jnp.asarray(flags))
    np.testing.assert_array_equal(_np(out_data), [[2.5, 6.0, 0.0]])
    np.testing.assert_array_equal(_np(out_flags), [[False, False, True]])


class TestMedianAbs:
    def setup_method(self):
        self.data = np.array([[-2.0, -4.0], [4.5, 4.5]], np.float32)
        self.flags = np.array([[0, 0], [0, 1]], bool)

    def test(self):
        assert float(twodflag._median_abs(jnp.asarray(self.data), jnp.asarray(self.flags))) == 4.0

    def test_all_flagged(self):
        flags = np.ones_like(self.flags)
        assert np.isnan(float(twodflag._median_abs(jnp.asarray(self.data), jnp.asarray(flags))))

    def test_axis0(self):
        out = twodflag._median_abs_axis0(jnp.asarray(self.data), jnp.asarray(self.flags))
        np.testing.assert_array_equal(_np(out), [[3.25, 4.0]])


class TestLinearlyInterpolateNans:
    def test_basic(self):
        y = np.array([np.nan, 1.0, np.nan, np.nan, 4.0, np.nan, 5.5, np.nan], np.float32)
        expected = np.array([1.0, 1.0, 2.0, 3.0, 4.0, 4.75, 5.5, 5.5], np.float32)
        out = twodflag._linearly_interpolate_nans1d(jnp.asarray(y))
        np.testing.assert_allclose(expected, _np(out), rtol=1e-6)

    def test_all_nans(self):
        y = np.full(5, np.nan, np.float32)
        np.testing.assert_array_equal(_np(twodflag._linearly_interpolate_nans1d(jnp.asarray(y))), 0)

    def test_2d(self):
        y = np.array([[np.nan, 2.0, np.nan, 4.0], [1.0, np.nan, np.nan, np.nan]], np.float32)
        expected = np.array([[2.0, 2.0, 3.0, 4.0], [1.0, 1.0, 1.0, 1.0]], np.float32)
        out = twodflag._linearly_interpolate_nans(jnp.asarray(y))
        np.testing.assert_allclose(expected, _np(out), rtol=1e-6)


class TestBoxGaussianFilter:
    def test_one_pass_placement(self):
        """Box placement must match the reference exactly
        (test/rfi/test_twodflag.py:241-246)."""
        a = np.array([[50.0, 10.0, 60.0, -70.0, 30.0, 20.0, -15.0]], np.float32)
        out = twodflag._box_sum_axis(jnp.asarray(a), 2, 1) / 5.0
        np.testing.assert_allclose(
            np.array([[24.0, 10.0, 16.0, 10.0, 5.0, -7.0, 7.0]], np.float32), _np(out), rtol=1e-6
        )

    def test_width(self):
        a = np.zeros((1, 200), np.float32)
        a[:, 100] = 1.0
        out = _np(twodflag._box_gaussian_filter(jnp.asarray(a), np.array([0.0, 10.0])))
        x = np.arange(200) - 100
        np.testing.assert_allclose(1.0, out.sum(), rtol=1e-5)
        np.testing.assert_allclose(0.0, (x * out).sum(), atol=1e-5)
        np.testing.assert_allclose(np.sqrt((x * x * out).sum()), 10.0, atol=1)

    def test_2d_vs_scipy(self):
        scipy_ndimage = pytest.importorskip("scipy.ndimage")
        rs = np.random.RandomState(seed=1)
        data = rs.uniform(size=(77, 53)).astype(np.float32)
        sigma = np.array([8, 2.3])
        expected = scipy_ndimage.gaussian_filter(data, sigma, mode="constant")
        out = _np(twodflag._box_gaussian_filter(jnp.asarray(data), sigma))
        np.testing.assert_allclose(expected, out, rtol=1e-1)

    def test_bad_sigma_dim(self):
        with pytest.raises(ValueError):
            twodflag._box_gaussian_filter(jnp.zeros((50, 50)), np.array([3.0]))

    def test_edge(self):
        rs = np.random.RandomState(seed=1)
        data = np.zeros((1, 200), np.float32)
        data[:, 80:120] = rs.uniform(size=(1, 40))
        fdata = _np(twodflag._box_gaussian_filter(jnp.asarray(data), np.array([0.0, 3.0])))
        fcore = _np(
            twodflag._box_gaussian_filter(jnp.asarray(data[:, 80:120]), np.array([0.0, 3.0]))
        )
        np.testing.assert_allclose(fdata[:, 80:120], fcore, rtol=1e-4, atol=1e-7)


class TestMaskedGaussianFilter:
    def test_basic_vs_scipy(self):
        scipy_ndimage = pytest.importorskip("scipy.ndimage")
        rs = np.random.RandomState(seed=1)
        data = rs.uniform(size=(77, 53)).astype(np.float32)
        flags = rs.uniform(size=data.shape) >= 0.5
        weight = (~flags).astype(np.float32)
        expected_num = scipy_ndimage.gaussian_filter(data * weight, [3, 2.3], mode="constant")
        expected_den = scipy_ndimage.gaussian_filter(weight, [3, 2.3], mode="constant")
        expected = expected_num / expected_den
        out = _np(
            twodflag.masked_gaussian_filter(jnp.asarray(data), jnp.asarray(flags), np.array([3, 2.3]))
        )
        # Slightly looser than the box-filter test: the box approximation
        # error enters both numerator and denominator of the ratio.
        np.testing.assert_allclose(expected, out, rtol=0.15)

    def test_fully_masked_region_is_nan(self):
        data = np.ones((40, 40), np.float32)
        flags = np.zeros_like(data, bool)
        flags[:, :] = False
        flags[10:30, 10:30] = True
        out = _np(
            twodflag.masked_gaussian_filter(jnp.asarray(data), jnp.asarray(flags), np.array([1.0, 1.0]))
        )
        assert np.isnan(out[19:21, 19:21]).all()
        assert np.isfinite(out[0, 0])


class TestGetBackground2D:
    """Reference test/rfi/test_twodflag.py:345-434."""

    def setup_method(self):
        self.shape = (95, 86)
        self.data = np.ones(self.shape, np.float32) * 7.5
        self.flags = np.zeros(self.shape, bool)
        self.chunks = np.array([0, 86])

    @pytest.mark.slow
    def test_no_flags(self):
        background = _np(
            twodflag._get_background2d(
                jnp.asarray(self.data), jnp.asarray(self.flags), 1, np.array([2.5, 2.5]), 2.0,
                self.chunks,
            )
        )
        assert background.dtype == np.float32
        # A constant field is its own background
        np.testing.assert_allclose(self.data, background, rtol=1e-5)

    def test_all_flagged(self):
        flags = np.ones(self.shape, bool)
        background = _np(
            twodflag._get_background2d(
                jnp.asarray(self.data), jnp.asarray(flags), 1, np.array([2.5, 2.5]), 2.0,
                self.chunks,
            )
        )
        np.testing.assert_array_equal(np.zeros(self.shape, np.float32), background)

    def test_rejects_spike(self):
        data = self.data.copy()
        data[40, 40] += 500.0
        background = _np(
            twodflag._get_background2d(
                jnp.asarray(data), jnp.asarray(self.flags), 3, np.array([2.5, 2.5]), 2.0,
                self.chunks,
            )
        )
        # The iterative masking must reject the spike from the background
        np.testing.assert_allclose(self.data, background, rtol=1e-2)


class TestSumThreshold:
    """Reference test/rfi/test_twodflag.py:437-516."""

    def setup_method(self):
        self.outlier_nsigma = 4.5
        self.rho = 1.3
        self.windows = np.array([1, 2, 4, 8])

    def test_all_flagged(self):
        data = jnp.asarray(np.arange(30, dtype=np.float32).reshape(5, 6))
        flags = jnp.ones((5, 6), bool)
        out = twodflag._sum_threshold(data, flags, 0, np.array([1, 2, 4]), 4.5, 1.3)
        assert not _np(out).any()

    @pytest.mark.parametrize("axis", [0, 1])
    def test_basic(self, axis):
        rs = np.random.RandomState(seed=1)
        data = rs.standard_normal((100, 90)).astype(np.float32) * 3.0
        rfi = np.zeros_like(data)
        rfi[10, 20] = 100.0
        rfi[80, 80] = -100.0
        rfi[:, 40] = rs.uniform(80.0, 120.0, size=(100,))
        rfi[:, 2] = -rfi[:, 40]
        rfi[:, 60:67] = rs.uniform(15.0, 20.0, size=(100, 7))
        rfi[:, 10:17] = -rfi[:, 60:67]
        in_flags = np.zeros(data.shape, bool)
        expected = rfi != 0
        data = data + rfi
        if axis == 0:
            rfi, data, in_flags, expected = rfi.T, data.T.copy(), in_flags.T, expected.T
        out = _np(
            twodflag._sum_threshold(
                jnp.asarray(data), jnp.asarray(in_flags), axis, self.windows,
                self.outlier_nsigma, self.rho,
            )
        )
        if axis == 0:
            out, expected = out.T, expected.T
        errors = np.sum(expected != out)
        assert errors / data.size < 0.01
        for region in (np.s_[8:13, 18:23], np.s_[78:83, 78:83]):
            np.testing.assert_equal(expected[region], out[region])

    def test_existing(self):
        rs = np.random.RandomState(seed=1)
        data = rs.standard_normal((100, 90)).astype(np.float32) * 3.0
        in_flags = np.zeros(data.shape, bool)
        data[:48] += 1000.0
        in_flags[:48] = True
        data[70, 0] = 12.5
        data[70, 1] = -12.5
        data[70, 2] = 20.0
        data[70, 3] = -20.0
        out = _np(
            twodflag._sum_threshold(
                jnp.asarray(data), jnp.asarray(in_flags), 0, self.windows, 5, self.rho
            )
        )
        np.testing.assert_array_equal([False, False, True, True], out[70, :4])


@pytest.mark.slow
class TestSumThresholdFlagger:
    """Statistical planted-RFI recovery (reference
    test/rfi/test_twodflag.py:518-673)."""

    def _make_background(self, shape, rs):
        scipy_interp = pytest.importorskip("scipy.interpolate")
        ntime, nfreq, n_bl = shape
        nx = 10
        x = np.linspace(0.0, nfreq, nx)
        y = np.ones((ntime, nx, n_bl)) * 2.34
        y[:, 0, :] = 0.1
        y[:, -1, :] = 0.1
        y[:] += rs.uniform(0.0, 0.1, y.shape)
        f = scipy_interp.interp1d(x, y, axis=1, kind="cubic", assume_sorted=True)
        return f(np.arange(nfreq))

    def _make_data(self, flagger, rs, shape=(234, 345, 1)):
        assert shape[1] >= 300, "planted RFI layout needs >= 300 channels"
        background = self._make_background(shape, rs).astype(np.float32)
        data = background + (rs.standard_normal(shape) * 0.1).astype(np.float32)
        rfi = np.zeros(shape, np.float32)
        rfi[12, :] = 1
        rfi[20:25, :] = 1
        rfi[:, 17] = 1
        rfi[:, 200:220] = 1
        rfi[30, :300] = 1
        rfi[50:, 80] = 1
        rfi[60:65, 100:170] = 1
        rfi[150:200, 150:153] = 1
        expected = rfi.astype(np.bool_)
        expected[30, :] = True
        expected[:, 80] = True
        data += rfi * rs.standard_normal(shape) * 3.0
        data[:, 260] += 0.2 * flagger.average_freq
        expected[:, 260] = True
        data[225, 225] = np.nan
        expected[225, 225] = True
        in_flags = np.zeros(shape, np.bool_)
        in_flags[:, 185:190] = True
        data[:, 185:190] = np.nan
        return np.abs(data), in_flags, expected

    def _check(self, flagger):
        rs = np.random.RandomState(seed=1)
        data, in_flags, expected = self._make_data(flagger, rs)
        orig = data.copy()
        out_flags = flagger.get_flags(data, in_flags)
        np.testing.assert_equal(orig, data)  # inputs untouched
        allowed = expected | in_flags
        allowed[:-1] |= allowed[1:]
        allowed[1:] |= allowed[:-1]
        allowed[:, :-1] |= allowed[:, 1:]
        allowed[:, 1:] |= allowed[:, :-1]
        allowed[:, :40] = True
        allowed[:, -40:] = True
        missing = expected & ~out_flags
        extra = out_flags & ~allowed
        assert missing.sum() == 0
        assert extra.sum() / data.size < 0.03

    def test_get_flags(self):
        self._check(twodflag.SumThresholdFlagger())

    def test_get_flags_single_chunk(self):
        self._check(twodflag.SumThresholdFlagger(freq_chunks=1))

    def test_get_flags_many_chunks(self):
        self._check(twodflag.SumThresholdFlagger(freq_chunks=15))

    def test_get_flags_average_freq(self):
        self._check(twodflag.SumThresholdFlagger(average_freq=2))

    def test_all_flagged(self):
        flagger = twodflag.SumThresholdFlagger()
        data = np.zeros((100, 80, 4), np.float32)
        in_flags = np.ones(data.shape, np.bool_)
        out = flagger.get_flags(data, in_flags)
        np.testing.assert_array_equal(np.zeros_like(in_flags), out)

    def test_variable_noise(self):
        rs = np.random.RandomState(seed=1)
        shape = (234, 345, 1)
        background = np.ones(shape, np.float32) * 11
        noise = rs.standard_normal(shape)
        noise *= np.arange(shape[1])[np.newaxis, :, np.newaxis] / shape[1]
        noise = noise.astype(np.float32)
        noise[100, 17] = 1.0
        noise[200, 170] = 1.0
        data = np.abs(background + noise)
        out = twodflag.SumThresholdFlagger().get_flags(data, np.zeros(shape, bool))
        assert out[100, 17, 0]
        assert not out[200, 170, 0]

    def test_chunked_matches_unchunked(self):
        """Baseline chunking must not change results (replaces the
        reference's thread/process-pool equivalence tests)."""
        rs = np.random.RandomState(seed=1)
        flagger = twodflag.SumThresholdFlagger()
        data, in_flags, _ = self._make_data(flagger, rs, shape=(234, 345, 4))
        out1 = flagger.get_flags(data, in_flags, chunk_size=4)
        out2 = flagger.get_flags(data, in_flags, chunk_size=2)
        np.testing.assert_array_equal(out1, out2)

    def test_pool_accepted(self):
        """The reference pool API is accepted (and ignored)."""
        import concurrent.futures

        flagger = twodflag.SumThresholdFlagger()
        data = np.abs(np.random.RandomState(1).standard_normal((30, 64, 2))).astype(np.float32)
        flags = np.zeros(data.shape, bool)
        with concurrent.futures.ThreadPoolExecutor(2) as pool:
            out = flagger.get_flags(data, flags, pool=pool)
        np.testing.assert_array_equal(out, flagger.get_flags(data, flags))
