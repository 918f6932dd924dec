"""Randomized config-sweep parity for the fused Pallas flagger.

The fixed parity tests pin specific shapes; this sweep drives the grid
and DMA engines through a seeded random sample of the full configuration
space — width, window count, fold/band geometry, block count, input-flag
mode, ingest, layout — and checks every draw bit-for-bit against the
host oracle (the reference's oracle pattern, SURVEY.md §4) and against
the other engine.  Catches shape-edge interactions (band tails, odd
channel counts, multi-block DMA streams, flag padding) that enumerated
cases miss.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from katsdpsigproc_tpu.models.rfi import host as rfi_host, pallas_flagger  # noqa: E402


def _draw_configs(n):
    rs = np.random.RandomState(20260820)
    configs = []
    for i in range(n):
        width = int(rs.choice([5, 9, 13, 17]))
        n_windows = int(rs.choice([3, 4, 5]))
        fold = int(rs.choice([128, 256, 512]))
        channels = int(rs.randint(width + 8, 600))
        bb = 8  # bb*hh is then always a sublane multiple
        blocks = int(rs.randint(1, 4))
        mode = rs.choice(["none", "channel", "full"])
        ingest = rs.choice(["planar", "amp"]) if mode == "none" else "planar"
        layout = rs.choice(["trailing", "leading"]) if mode == "none" else "trailing"
        configs.append((i, width, n_windows, fold, channels, bb, blocks,
                        str(mode), str(ingest), str(layout)))
    return configs


@pytest.mark.slow
@pytest.mark.parametrize(
    "i,width,n_windows,fold,channels,bb,blocks,mode,ingest,layout",
    _draw_configs(12))
def test_fuzz_config(i, width, n_windows, fold, channels, bb, blocks, mode,
                     ingest, layout):
    rs = np.random.RandomState(1000 + i)
    baselines = bb * blocks
    vis = (rs.standard_normal((channels, baselines))
           + 1j * rs.standard_normal((channels, baselines))).astype(np.complex64)
    spikes = rs.random_sample(vis.shape) < 1 / 48.0
    vis += spikes * (rs.random_sample(vis.shape) * 20.0 + 40.0)

    planar_t = np.stack([vis.real.T, vis.imag.T], axis=-1).astype(np.float32)
    if layout == "leading":
        vis_in = jnp.asarray(np.moveaxis(planar_t, -1, 0).copy())
    else:
        vis_in = jnp.asarray(planar_t)

    kw = dict(width=width, n_sigma=11.0, n_windows=n_windows, fold=fold,
              bb=bb, interpret=True, layout=layout, ingest=ingest)
    host_flags = None
    if mode == "channel":
        cf = (rs.random_sample(channels) < 0.04).astype(np.uint8)
        kw["channel_flags"] = jnp.asarray(cf)
        host_flags = np.tile(cf[:, None], (1, baselines))
    elif mode == "full":
        iff = (rs.random_sample((baselines, channels)) < 0.04).astype(np.uint8)
        kw["input_flags"] = jnp.asarray(iff)
        host_flags = iff.T.copy()

    grid = np.asarray(pallas_flagger.flag_transposed(vis_in, **kw))
    dma = np.asarray(pallas_flagger.flag_transposed_dma(vis_in, **kw))
    np.testing.assert_array_equal(grid, dma)

    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(width),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0, n_windows=n_windows),
    )
    expected = host_flagger(vis, host_flags)
    np.testing.assert_array_equal(grid.T, expected)
    assert expected.any(), "planted spikes produced no flags"
