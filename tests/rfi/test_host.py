"""Tests for the numpy host oracle.

The hand-computed expectations follow the reference's background test
vectors (reference: test/rfi/test_background.py:36-60) and the synthetic
spike-recovery contract of the flagger test
(test/rfi/test_flagger.py:57-71); pandas (when available) cross-checks the
rolling-median semantics against the reference's own implementation choice
(src/katsdpsigproc/rfi/host.py:148).
"""

import numpy as np
import pytest

from katsdpsigproc_tpu.models.rfi import MAD_NORMAL, host

from ..helpers import complex_normal, rfi_test_data

_vis = np.array([[1.25, 1.5j, 1.0, 2.0, -1.75, 2.0]]).T.astype(np.complex64)
_flags = np.array([0, 0, 1, 0, 0, 4]).T.astype(np.uint8)


class TestBackgroundMedianFilterHost:
    def test_basic(self):
        background = host.BackgroundMedianFilterHost(3)
        out = background(_vis)
        ref = np.array([[-0.125, 0.25, -0.5, 0.25, -0.25, 0.125]]).T
        np.testing.assert_allclose(ref, out, atol=1e-6)

    def test_flags(self):
        background = host.BackgroundMedianFilterHost(3)
        out = background(_vis, _flags)
        ref = np.array([[-0.125, 0.125, 0.0, 0.125, -0.125, 0.0]]).T
        np.testing.assert_allclose(ref, out, atol=1e-6)

    def test_amplitudes(self):
        background = host.BackgroundMedianFilterHost(3, amplitudes=True)
        out = background(np.abs(_vis))
        ref = np.array([[-0.125, 0.25, -0.5, 0.25, -0.25, 0.125]]).T
        np.testing.assert_allclose(ref, out, atol=1e-6)

    @pytest.mark.parametrize("width", [3, 5, 13])
    @pytest.mark.parametrize("use_flags", [None, "channel", "full"])
    def test_vs_pandas(self, width, use_flags):
        pd = pytest.importorskip("pandas")
        shape = (417, 13)
        rs = np.random.RandomState(seed=1)
        vis = complex_normal(rs, size=shape).astype(np.complex64)
        flags = (rs.random_sample(shape) < 0.1).astype(np.uint8)
        flags[100:110, 0:10] = 4  # fully-flagged windows
        if use_flags == "channel":
            flags = flags[:, 0]
        elif use_flags is None:
            flags = None

        # The reference host implementation, verbatim semantics via pandas
        amp = pd.DataFrame(np.abs(vis))
        if flags is not None:
            f = flags.astype(np.bool_)
            if f.ndim < 2:
                f = f[:, np.newaxis]
            amp = amp.mask(np.broadcast_to(f, vis.shape))
        med = amp.rolling(width, center=True, min_periods=1).median()
        expected = (amp - med).fillna(0).values

        out = host.BackgroundMedianFilterHost(width)(vis, flags)
        np.testing.assert_allclose(expected, out, atol=1e-6)


class TestNoiseEstMADHost:
    def test_simple(self):
        deviations = np.array([[0.0, 1.0], [2.0, -3.0], [4.0, 0.0], [0.0, 5.0]])
        out = host.NoiseEstMADHost()(deviations)
        np.testing.assert_allclose(out, np.array([3.0, 3.0]) * MAD_NORMAL)

    def test_even_count(self):
        deviations = np.array([[1.0], [2.0], [3.0], [4.0]])
        out = host.NoiseEstMADHost()(deviations)
        np.testing.assert_allclose(out, np.array([2.5]) * MAD_NORMAL)


class TestThresholdSimpleHost:
    def test(self):
        deviations = np.array([[0.0, 5.0], [1.0, 1.0]], np.float32)
        noise = np.array([1.0, 2.0], np.float32)
        out = host.ThresholdSimpleHost(2.0, flag_value=4)(deviations, noise)
        np.testing.assert_equal(out, np.array([[0, 4], [0, 0]], np.uint8))


class TestThresholdSumHost:
    def test_single_spike(self):
        n = 64
        deviations = np.zeros((n, 1), np.float32)
        deviations[20, 0] = 10.0
        noise = np.array([1.0], np.float32)
        out = host.ThresholdSumHost(4.0)(deviations, noise)
        expected = np.zeros((n, 1), np.uint8)
        expected[20, 0] = 1
        np.testing.assert_equal(out, expected)

    def test_broad_weak_spike(self):
        # A wide weak excursion that only the larger windows catch.
        n = 128
        deviations = np.zeros((n, 1), np.float32)
        deviations[40:56, 0] = 2.5  # below 4-sigma individually
        noise = np.array([1.0], np.float32)
        out = host.ThresholdSumHost(4.0)(deviations, noise)
        assert out[40:56, 0].all()
        assert not out[:32, 0].any()
        assert not out[70:, 0].any()

    def test_windows(self):
        t = host.ThresholdSumHost(4.0, n_windows=3, threshold_falloff=1.5)
        assert t.windows == [1, 2, 4]
        np.testing.assert_allclose(t.threshold_scales, [1.0, 1 / 1.5, 1 / 2.25])


class TestFlaggerHost:
    def test_spike_recovery(self):
        vis, spikes, input_flags = rfi_test_data()
        flagger = host.FlaggerHost(
            host.BackgroundMedianFilterHost(13),
            host.NoiseEstMADHost(),
            host.ThresholdSimpleHost(11.0),
        )
        flags = flagger(vis)
        np.testing.assert_equal(spikes, flags)
        # Channel flags
        flags = flagger(vis, input_flags[:, 0])
        expected = np.where(np.broadcast_to(input_flags[:, 0:1], vis.shape), 0, spikes)
        np.testing.assert_equal(expected, flags)
        # Full input flags
        flags = flagger(vis, input_flags)
        np.testing.assert_equal(np.where(input_flags, 0, spikes), flags)

    def test_spike_recovery_sum_threshold(self):
        vis, spikes, _ = rfi_test_data()
        flagger = host.FlaggerHost(
            host.BackgroundMedianFilterHost(13),
            host.NoiseEstMADHost(),
            host.ThresholdSumHost(11.0),
        )
        flags = flagger(vis)
        # SumThreshold smears flags; every spike must be found.
        assert (flags[spikes.astype(bool)] == 1).all()


def test_threshold_sum_f32_threshold_chain():
    """Thresholds must follow the f32 chain fl32(fl32(n_sigma*noise)*scale)
    used by the reference host and every device path.  A float64 product
    rounded once differs by 1 ulp on ~1/3 of noise values, and a window
    sum landing exactly on the device threshold then flips the mask
    (found by review; repro: noise=0.4001572, two equal deviations)."""
    import jax.numpy as jnp

    from katsdpsigproc_tpu.models.rfi import device as rfi_device

    noise = np.float32(0.4001572)
    n_sigma = 11.0
    th = host.ThresholdSumHost(n_sigma, n_windows=2)
    # Device threshold for window 2 (f32 chain)
    t_dev = np.float32(np.float32(np.float32(n_sigma) * noise) * np.float32(1.2 ** -1))
    deviations = np.zeros((8, 1), np.float32)
    deviations[3:5, 0] = t_dev  # mean of window 2 exactly at the threshold
    got_host = th(deviations, np.asarray([noise], np.float32))
    got_dev = np.asarray(rfi_device.threshold_sum(
        jnp.asarray(deviations.T), jnp.asarray([noise]), n_sigma, 2))
    np.testing.assert_array_equal(got_host, got_dev.T)
