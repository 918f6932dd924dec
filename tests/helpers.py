"""Shared test helpers."""

import numpy as np


def complex_normal(rs: np.random.RandomState, loc=0.0j, scale=1.0, size=None) -> np.ndarray:
    """Circularly-symmetric complex Gaussian samples (reference: test/__init__.py)."""
    return rs.normal(np.real(loc), scale, size) + 1j * rs.normal(np.imag(loc), scale, size)


def rfi_test_data(shape=(117, 131), seed=1, spike_frac=1.0 / 16.0):
    """Synthetic visibilities with planted RFI spikes.

    Reproduces the reference's flagger test setup
    (test/rfi/test_flagger.py:36-52): complex noise with 1/16 of samples
    boosted to amplitude 50-70 at random phase, so an 11-sigma simple
    threshold recovers exactly the planted spike mask.
    """
    rs = np.random.RandomState(seed=seed)
    vis = complex_normal(rs, size=shape)
    spikes = (rs.random_sample(shape) < spike_frac).astype(np.uint8)
    rfi_amp = rs.random_sample(shape) * 20.0 + 50.0
    rfi_phase = rs.random_sample(shape) * (2j * np.pi)
    vis += spikes * (rfi_amp * np.exp(rfi_phase))
    input_flags = (rs.random_sample(shape) < 1.0 / 16.0).astype(np.uint8) * 2
    return vis.astype(np.complex64), spikes, input_flags
