"""Extra flagger coverage: visualization, flags through the fused path,
FFT composability."""

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.models.rfi import device, host
from katsdpsigproc_tpu.ops import base, fft

from ..helpers import rfi_test_data


@pytest.fixture
def ctx(patch_autotune):
    from katsdpsigproc_tpu.utils import backend

    return backend.create_some_context()


def test_flagger_visualization(ctx):
    flagger = device.FlaggerDeviceTemplate(
        device.BackgroundMedianFilterDeviceTemplate(ctx, 13),
        device.NoiseEstMADTDeviceTemplate(ctx, 1024),
        device.ThresholdSumDeviceTemplate(ctx),
    ).instantiate(None, 128, 16, threshold_args=dict(n_sigma=11.0))
    dot = base.visualize_operation(flagger)
    # The compound-slot structure of the reference pipeline
    # (rfi/device.py:1139-1150) must be visible in the graph.
    for name in ["vis", "deviations", "deviations_t", "noise", "flags", "flags_t"]:
        assert f'"slot:{name}"' in dot
    for op_name in ["background", "transpose_deviations", "noise_est", "threshold",
                    "transpose_flags"]:
        assert f'"{op_name}"' in dot


def test_flagger_parameters_and_bytes(ctx):
    flagger = device.FlaggerDeviceTemplate(
        device.BackgroundMedianFilterDeviceTemplate(ctx, 13),
        device.NoiseEstMADTDeviceTemplate(ctx, 1024),
        device.ThresholdSumDeviceTemplate(ctx),
    ).instantiate(None, 128, 16, threshold_args=dict(n_sigma=11.0))
    params = flagger.parameters()
    assert params["channels"] == 128
    assert flagger.required_bytes() > 0


@pytest.mark.parametrize("use_flags", [device.BackgroundFlags.CHANNEL, device.BackgroundFlags.FULL])
def test_make_flagger_fn_with_flags(ctx, use_flags):
    vis, spikes, input_flags = rfi_test_data(shape=(229, 33), seed=11)
    fn = device.make_flagger_fn(13, 11.0, use_flags=use_flags, threshold="simple")
    host_flagger = host.FlaggerHost(
        host.BackgroundMedianFilterHost(13),
        host.NoiseEstMADHost(),
        host.ThresholdSimpleHost(11.0),
    )
    if use_flags == device.BackgroundFlags.CHANNEL:
        arg = input_flags[:, 0]
    else:
        arg = input_flags
    out = np.asarray(fn(jnp.asarray(vis), jnp.asarray(arg)))
    np.testing.assert_equal(out, host_flagger(vis, arg))


def test_fft_composes_in_sequence(ctx):
    """FFT ops participate in OperationSequence like any other op."""
    shape = (4, 32)
    template = fft.FftTemplate(ctx, 1, shape, np.complex64, np.complex64)
    fwd = template.instantiate(None, fft.FftMode.FORWARD)
    inv = template.instantiate(None, fft.FftMode.INVERSE)
    seq = base.OperationSequence(
        [("fwd", fwd), ("inv", inv)],
        compounds={"x": ["fwd:src"], "spectrum": ["fwd:dest", "inv:src"], "y": ["inv:dest"]},
    )
    rs = np.random.RandomState(1)
    x = (rs.standard_normal(shape) + 1j * rs.standard_normal(shape)).astype(np.complex64)
    out = np.asarray(seq(x=jnp.asarray(x))["y"])
    np.testing.assert_allclose(out, x * 32, rtol=1e-4, atol=1e-3)
