"""Randomized config sweep for the sharded flagger on the 8-device mesh.

Seeded draws over mesh factorization, channel/baseline counts, window
width, threshold flavor, and input-flag mode, each checked bit-for-bit
against the host oracle.  The channel-sharded draws drive the
``EDGE_SIZE = 2**w - w - 1`` halo exchange and the collective rank
search at irregular shard widths — the places where off-by-ones live.
"""

import jax
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from katsdpsigproc_tpu.models.rfi import (  # noqa: E402
    device as rfi_device,
    host as rfi_host,
)
from katsdpsigproc_tpu.parallel import flagger as pflagger, mesh as pmesh  # noqa: E402

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _draw_configs(n):
    rs = np.random.RandomState(20260821)
    configs = []
    for i in range(n):
        nb, nc = [(8, 1), (4, 2), (2, 4), (1, 8)][int(rs.randint(4))]
        width = int(rs.choice([9, 13, 17]))
        # channels: a multiple of the channel shards, wide enough per shard
        # for the window halos at this width
        per_shard = int(rs.randint(width * 4, 160))
        channels = nc * per_shard
        baselines = nb * int(rs.randint(2, 9))
        threshold = str(rs.choice(["simple", "sum"]))
        mode = str(rs.choice(["none", "channel", "full"]))
        configs.append((i, nb, nc, width, channels, baselines, threshold, mode))
    return configs


@pytest.mark.parametrize("i,nb,nc,width,channels,baselines,threshold,mode",
                         _draw_configs(10))
def test_sharded_fuzz(i, nb, nc, width, channels, baselines, threshold, mode):
    mesh = pmesh.make_mesh((nb, nc), (pmesh.BASELINE_AXIS, pmesh.CHANNEL_AXIS))
    rs = np.random.RandomState(2000 + i)
    vis = (rs.standard_normal((channels, baselines))
           + 1j * rs.standard_normal((channels, baselines))).astype(np.complex64)
    spikes = rs.random_sample(vis.shape) < 1 / 48.0
    vis += spikes * (rs.random_sample(vis.shape) * 20.0 + 40.0)

    use_flags = {"none": rfi_device.BackgroundFlags.NONE,
                 "channel": rfi_device.BackgroundFlags.CHANNEL,
                 "full": rfi_device.BackgroundFlags.FULL}[mode]
    host_flags = None
    if mode == "channel":
        host_flags = (rs.random_sample(channels) < 0.04).astype(np.uint8)
    elif mode == "full":
        host_flags = (rs.random_sample(vis.shape) < 0.04).astype(np.uint8)

    fn = pflagger.make_sharded_flagger(mesh, width=width, n_sigma=11.0,
                                       threshold=threshold, use_flags=use_flags)
    args = (jnp.asarray(vis),) if host_flags is None else (
        jnp.asarray(vis), jnp.asarray(host_flags))
    out = np.asarray(fn(*args))

    host_threshold = (rfi_host.ThresholdSimpleHost(11.0) if threshold == "simple"
                      else rfi_host.ThresholdSumHost(11.0))
    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(width),
        rfi_host.NoiseEstMADHost(), host_threshold)
    expected = host_flagger(vis, host_flags)
    np.testing.assert_array_equal(out, expected)
    assert expected.any(), "planted spikes produced no flags"
