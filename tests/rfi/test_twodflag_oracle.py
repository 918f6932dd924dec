"""End-to-end mask parity: JAX 2-D flagger vs the independent numpy oracle.

VERDICT.md round-1 item 3: the 1-D pipeline has bit-exact host-oracle
parity everywhere, but the 2-D flagger was only tested piecewise.  This
module checks ``SumThresholdFlagger.get_flags`` mask-for-mask against the
tests-only re-derivation in :mod:`tests.rfi.twodflag_oracle` (written
directly from the reference, ``/root/reference/src/katsdpsigproc/rfi/
twodflag.py:634-1027``), on planted-RFI and random cubes including
``average_freq > 1``, NaN inputs, fully-flagged chunks, and
``freq_chunks`` edge cases.  All assertions are exact equality.
"""

import numpy as np
import pytest

from katsdpsigproc_tpu.models.rfi.twodflag import SumThresholdFlagger

from . import twodflag_oracle as oracle


def _assert_parity(data, flags, **params):
    expected = oracle.get_flags(data, flags, **params)
    got = SumThresholdFlagger(**params).get_flags(data, flags)
    mismatch = int((expected != got).sum())
    assert mismatch == 0, (
        f"{mismatch} / {expected.size} flags differ from the independent oracle"
    )
    return got


def _synthetic(rs, shape, complex_data=True, rfi_frac=0.02, rfi_amp=30.0):
    """Noise cube with planted RFI spikes (time, freq, bl)."""
    if complex_data:
        data = (rs.standard_normal(shape) + 1j * rs.standard_normal(shape)).astype(
            np.complex64
        )
    else:
        data = np.abs(rs.standard_normal(shape)).astype(np.float32)
    spikes = rs.random_sample(shape) < rfi_frac
    data = data + spikes * (rfi_amp + 5.0 * rs.random_sample(shape))
    if complex_data:
        data = data.astype(np.complex64)
    else:
        data = data.astype(np.float32)
    return data, spikes


SMALL = dict(
    windows_time=[1, 2, 4], windows_freq=[1, 2, 4], spike_width_time=3.5,
    spike_width_freq=4.0, freq_chunks=3,
)


class TestOracleParity:
    def test_planted_rfi(self):
        rs = np.random.RandomState(7)
        data, spikes = _synthetic(rs, (40, 128, 3))
        flags = np.zeros(data.shape, bool)
        got = _assert_parity(data, flags, **SMALL)
        # sanity: the flagger actually catches most planted spikes
        assert (got & spikes).sum() > 0.8 * spikes.sum()

    @pytest.mark.slow
    def test_input_flags(self):
        rs = np.random.RandomState(8)
        data, _ = _synthetic(rs, (32, 96, 2))
        flags = rs.random_sample(data.shape) < 0.1
        _assert_parity(data, flags, **SMALL)

    @pytest.mark.slow
    def test_average_freq(self):
        rs = np.random.RandomState(9)
        data, _ = _synthetic(rs, (32, 100, 2))
        flags = rs.random_sample(data.shape) < 0.05
        params = dict(SMALL, average_freq=4)
        _assert_parity(data, flags, **params)

    def test_average_freq_uneven(self):
        # 98 channels / average_freq 4 → ragged final bin
        rs = np.random.RandomState(10)
        data, _ = _synthetic(rs, (24, 98, 2))
        flags = np.zeros(data.shape, bool)
        _assert_parity(data, flags, **dict(SMALL, average_freq=4))

    def test_nan_inputs(self):
        rs = np.random.RandomState(11)
        data, _ = _synthetic(rs, (32, 96, 2))
        nan_mask = rs.random_sample(data.shape) < 0.05
        data = np.where(nan_mask, np.complex64(np.nan), data)
        flags = np.zeros(data.shape, bool)
        got = _assert_parity(data, flags, **SMALL)
        assert got[nan_mask].all()  # NaNs always flagged

    def test_all_flagged_chunk(self):
        # One frequency chunk entirely pre-flagged: its noise estimates
        # are empty (NaN medians → inf thresholds).
        rs = np.random.RandomState(12)
        data, _ = _synthetic(rs, (32, 96, 2))
        flags = np.zeros(data.shape, bool)
        flags[:, 0:32, :] = True  # chunk 0 of 3
        _assert_parity(data, flags, **SMALL)

    @pytest.mark.slow
    def test_all_flagged_everything(self):
        rs = np.random.RandomState(13)
        data, _ = _synthetic(rs, (16, 48, 2))
        flags = np.ones(data.shape, bool)
        got = _assert_parity(data, flags, **SMALL)
        assert got.shape == data.shape

    @pytest.mark.slow
    def test_freq_chunks_exceed_channels(self):
        # linspace produces zero-length chunks when freq_chunks > channels.
        rs = np.random.RandomState(14)
        data, _ = _synthetic(rs, (16, 6, 2))
        flags = np.zeros(data.shape, bool)
        _assert_parity(
            data, flags, windows_time=[1, 2], windows_freq=[1, 2],
            spike_width_time=2.0, spike_width_freq=2.0, freq_chunks=10,
        )

    def test_single_chunk(self):
        rs = np.random.RandomState(15)
        data, _ = _synthetic(rs, (24, 64, 2))
        flags = np.zeros(data.shape, bool)
        _assert_parity(data, flags, **dict(SMALL, freq_chunks=1))

    @pytest.mark.slow
    def test_window_larger_than_chunk(self):
        # Chunks of ~5 channels with windows up to 8: exercises the
        # window-skip and chunk-overlap padding paths.
        rs = np.random.RandomState(16)
        data, _ = _synthetic(rs, (24, 16, 2))
        flags = np.zeros(data.shape, bool)
        _assert_parity(
            data, flags, windows_time=[1, 2, 4, 8], windows_freq=[1, 2, 4, 8],
            spike_width_time=2.0, spike_width_freq=2.0, freq_chunks=3,
        )

    @pytest.mark.slow
    def test_magnitude_input(self):
        rs = np.random.RandomState(17)
        data, _ = _synthetic(rs, (32, 96, 2), complex_data=False)
        flags = np.zeros(data.shape, bool)
        _assert_parity(data, flags, **SMALL)

    @pytest.mark.slow
    def test_default_parameters(self):
        # The production defaults (MeerKAT windows, 10 chunks, wide
        # Gaussians) on a cube large enough for them to engage.
        rs = np.random.RandomState(18)
        data, _ = _synthetic(rs, (48, 220, 2))
        flags = np.zeros(data.shape, bool)
        _assert_parity(data, flags)

    @pytest.mark.parametrize("seed", range(5))
    @pytest.mark.slow
    def test_fuzz(self, seed):
        """Seeded fuzz sweep: random shapes, flag densities, parameters."""
        rs = np.random.RandomState(100 + seed)
        n_time = int(rs.randint(8, 48))
        n_freq = int(rs.randint(24, 140))
        n_bl = int(rs.randint(1, 4))
        data, _ = _synthetic(
            rs, (n_time, n_freq, n_bl),
            complex_data=bool(rs.randint(2)),
            rfi_frac=float(rs.uniform(0.0, 0.05)),
        )
        if rs.randint(2):
            nan_mask = rs.random_sample(data.shape) < 0.02
            data = np.where(nan_mask, data.dtype.type(np.nan), data)
        flags = rs.random_sample(data.shape) < rs.uniform(0.0, 0.2)
        params = dict(
            windows_time=[1, 2, 4, 8][: int(rs.randint(1, 5))],
            windows_freq=[1, 2, 4, 8][: int(rs.randint(1, 5))],
            spike_width_time=float(rs.uniform(1.0, 6.0)),
            spike_width_freq=float(rs.uniform(1.0, 8.0)),
            freq_chunks=int(rs.randint(1, 6)),
            average_freq=int(rs.choice([1, 1, 2, 4])),
            outlier_nsigma=float(rs.uniform(3.0, 6.0)),
            background_iterations=int(rs.randint(1, 3)),
            rho=float(rs.uniform(1.1, 1.6)),
        )
        _assert_parity(data, flags, **params)


def test_reduce_window_matches_ordered_adds():
    """The oracle's f32 convention 1 presumes CPU XLA's ``reduce_window``
    sums windows as ordered ascending adds; verify bitwise."""
    import jax.numpy as jnp
    from jax import lax

    rs = np.random.RandomState(0)
    x = rs.uniform(0.1, 100.0, (50, 260)).astype(np.float32)
    r = 7
    d = 2 * r + 1
    rw = np.asarray(
        lax.reduce_window(jnp.asarray(x), 0.0, lax.add, (1, d), (1, 1),
                          ((0, 0), (r, r)))
    )
    acc = oracle._box_sum_ordered(np.pad(x, ((0, 0), (r, r))), r, 1, x.shape[1])
    np.testing.assert_array_equal(rw, acc)
