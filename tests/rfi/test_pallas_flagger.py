"""Fused Pallas flagger vs the host oracle (interpret mode on CPU;
the compiled path runs in the TPU benchmark)."""

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.models.rfi import device as rfi_device, host as rfi_host, pallas_flagger

from ..helpers import rfi_test_data


@pytest.mark.parametrize("channels,baselines", [(128, 16), (300, 8)])
def test_matches_host_oracle(channels, baselines):
    vis, spikes, _ = rfi_test_data(shape=(channels, baselines), seed=3)
    vis_t = np.moveaxis(rfi_device.to_planar(vis), 0, 1)  # (B, C, 2)
    out_t = np.asarray(
        pallas_flagger.flag_transposed(
            jnp.asarray(vis_t), width=13, n_sigma=11.0, bb=baselines, interpret=True
        )
    )
    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(13),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0),
    )
    expected = host_flagger(vis)
    np.testing.assert_equal(out_t.T, expected)


def test_grid_over_baseline_blocks():
    vis, _, _ = rfi_test_data(shape=(96, 32), seed=4)
    vis_t = np.moveaxis(rfi_device.to_planar(vis), 0, 1)
    full = np.asarray(
        pallas_flagger.flag_transposed(jnp.asarray(vis_t), bb=32, interpret=True)
    )
    blocked = np.asarray(
        pallas_flagger.flag_transposed(jnp.asarray(vis_t), bb=8, interpret=True)
    )
    np.testing.assert_equal(full, blocked)


def test_folded_channel_axis_matches_host():
    """Multi-row folds exercise the cross-row shift logic."""
    vis, _, _ = rfi_test_data(shape=(384, 8), seed=5)
    vis_t = np.moveaxis(rfi_device.to_planar(vis), 0, 1)
    out = np.asarray(
        pallas_flagger.flag_transposed(jnp.asarray(vis_t), bb=8, fold=128, interpret=True)
    )
    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(13),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0),
    )
    np.testing.assert_equal(out.T, host_flagger(vis))
    # A fold that does not divide the channel count (pad + crop path)
    out160 = np.asarray(
        pallas_flagger.flag_transposed(jnp.asarray(vis_t), bb=8, fold=256, interpret=True)
    )
    np.testing.assert_equal(out160, out)


@pytest.mark.parametrize("mode", ["full", "channel"])
def test_input_flags_match_host(mode):
    """Prior flags exclude samples exactly as the host oracle does."""
    vis, spikes, input_flags = rfi_test_data(shape=(256, 8), seed=6)
    if mode == "channel":
        flags_2d = np.broadcast_to(input_flags[:, :1], vis.shape).copy()
        host_arg = input_flags[:, 0]
    else:
        flags_2d = input_flags
        host_arg = input_flags
    vis_t = np.moveaxis(rfi_device.to_planar(vis), 0, 1)
    out = np.asarray(
        pallas_flagger.flag_transposed(
            jnp.asarray(vis_t), jnp.asarray(flags_2d.T.astype(np.uint8)),
            bb=8, fold=128, interpret=True,
        )
    )
    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(13),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0),
    )
    np.testing.assert_equal(out.T, host_flagger(vis, host_arg))


def test_flag_dump_with_flags():
    vis, _, input_flags = rfi_test_data(shape=(128, 24), seed=7)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1).copy())
    f_t = jnp.asarray(input_flags.T.astype(np.uint8))
    full = np.asarray(
        pallas_flagger.flag_transposed(vis_t, f_t, bb=8, interpret=True)
    )
    dumped = np.asarray(
        pallas_flagger.flag_dump(vis_t, f_t, slab=8, bb=8, interpret=True)
    )
    np.testing.assert_equal(full, dumped)


def test_bad_bb():
    with pytest.raises(ValueError):
        pallas_flagger.flag_transposed(jnp.zeros((10, 64, 2), jnp.float32), bb=4, interpret=True)
