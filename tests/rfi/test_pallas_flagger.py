"""Fused Pallas flagger vs the host oracle (interpret mode on CPU;
the compiled path runs in the TPU benchmark)."""

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.models.rfi import device as rfi_device, host as rfi_host, pallas_flagger

from ..helpers import rfi_test_data


@pytest.mark.parametrize("channels,baselines", [(128, 16), (300, 8), (99, 8), (257, 8)])
def test_matches_host_oracle(channels, baselines):
    # 99/257 channels: odd counts flip the right-edge fill parity of the
    # fast path (_median_parity_fill's (d + channels - 1) & 1 term).
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


def test_large_windows_cross_band_dilation():
    """n_windows=6 (window 32) with a 128-lane fold: the unmasked
    Kogge-Stone dilation's cross-band pulls must all land in the
    sf-zeroed tail (the 2*done-1 <= window-1 reach-back proof)."""
    vis, _, _ = rfi_test_data(shape=(384, 8), seed=11)
    vis_t = np.moveaxis(rfi_device.to_planar(vis), 0, 1)
    out = np.asarray(
        pallas_flagger.flag_transposed(
            jnp.asarray(vis_t), bb=8, fold=128, n_windows=6, interpret=True
        )
    )
    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(13),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0, n_windows=6),
    )
    np.testing.assert_equal(out.T, host_flagger(vis))


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
    if mode == "channel":
        # Native CHANNEL path: one (channels,) vector, folded block with a
        # constant index map — must match the broadcast-to-FULL result.
        native = np.asarray(
            pallas_flagger.flag_transposed(
                jnp.asarray(vis_t),
                channel_flags=jnp.asarray(host_arg.astype(np.uint8)),
                bb=8, fold=128, interpret=True,
            )
        )
        np.testing.assert_equal(native, out)


def test_channel_flags_dump_and_validation():
    vis, _, input_flags = rfi_test_data(shape=(300, 24), seed=9)
    cf = input_flags[:, 0].astype(np.uint8)  # (channels,)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1).copy())
    full = np.asarray(
        pallas_flagger.flag_transposed(
            vis_t, channel_flags=jnp.asarray(cf), bb=8, fold=128, interpret=True
        )
    )
    dumped = np.asarray(
        pallas_flagger.flag_dump(
            vis_t, channel_flags=jnp.asarray(cf), slab=8, bb=8, fold=128, interpret=True
        )
    )
    np.testing.assert_equal(full, dumped)
    with pytest.raises(ValueError, match="not both"):
        pallas_flagger.flag_transposed(
            vis_t,
            jnp.zeros((24, 300), jnp.uint8),
            channel_flags=jnp.asarray(cf),
            bb=8, fold=128, interpret=True,
        )


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


@pytest.mark.parametrize("mode", ["none", "full", "channel"])
@pytest.mark.slow
def test_nref_multi_block(mode):
    """nref>1 (multiple refs per grid step) matches the single-ref kernel."""
    vis, _, input_flags = rfi_test_data(shape=(256, 32), seed=11)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1).copy())
    kw = {}
    if mode == "full":
        kw["input_flags"] = jnp.asarray(input_flags.T.astype(np.uint8))
    elif mode == "channel":
        kw["channel_flags"] = jnp.asarray(input_flags[:, 0].astype(np.uint8))
    base = np.asarray(
        pallas_flagger.flag_transposed(vis_t, bb=8, fold=128, interpret=True, **kw)
    )
    for nref in (2, 4):
        multi = np.asarray(
            pallas_flagger.flag_transposed(
                vis_t, bb=8, fold=128, interpret=True, nref=nref, **kw
            )
        )
        np.testing.assert_equal(multi, base)


@pytest.mark.parametrize("nref", [1, 2])
def test_madnz_threshold_matches_xla(nref):
    """Hybrid kernel == madnz + threshold_sum composed (same deviations)."""
    rs = np.random.RandomState(13)
    dev_t = jnp.asarray(rs.standard_normal((16, 256)).astype(np.float32))
    expected = rfi_device.threshold_sum(dev_t, rfi_device.madnz(dev_t), 11.0)
    got = pallas_flagger.madnz_threshold(
        dev_t, n_sigma=11.0, bb=4, fold=128, interpret=True, nref=nref
    )
    np.testing.assert_equal(np.asarray(got), np.asarray(expected))


def test_hybrid_engine_matches_host():
    vis, _, _ = rfi_test_data(shape=(256, 16), seed=15)
    planar = rfi_device.to_planar(vis)
    fn = rfi_device.make_flagger_fn(
        13, 11.0, engine="hybrid",
        pallas_kw=dict(bb=4, fold=128, interpret=True),
    )
    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(13),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0),
    )
    np.testing.assert_equal(np.asarray(fn(jnp.asarray(planar))), host_flagger(vis))


def test_fused_template_tuning_override():
    """Template honors explicit tuning (bb, nref) without running a search."""
    vis, _, _ = rfi_test_data(shape=(256, 16), seed=17)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1).copy())
    tmpl = pallas_flagger.FusedFlaggerTemplate(None, tuning={"bb": 8, "nref": 2})
    assert tmpl.bb == 8 and tmpl.nref == 2
    base = pallas_flagger.flag_transposed(vis_t, bb=8, fold=128, interpret=True)
    got = tmpl(vis_t, interpret=True)
    np.testing.assert_equal(np.asarray(got), np.asarray(base))


def test_bad_bb():
    with pytest.raises(ValueError):
        pallas_flagger.flag_transposed(jnp.zeros((10, 64, 2), jnp.float32), bb=4, interpret=True)


class TestDmaPipeline:
    """In-kernel DMA block loop (flag_transposed_dma) vs the grid engine."""

    def _vis(self, b=16, c=300):
        rs = np.random.RandomState(3)
        vis = rs.standard_normal((b, c, 2)).astype(np.float32)
        vis[:, 120, :] *= 40.0
        return jnp.asarray(vis)

    def test_matches_grid_engine(self):
        vt = self._vis()
        ref = np.asarray(pallas_flagger.flag_transposed(vt, bb=8, interpret=True))
        got = np.asarray(pallas_flagger.flag_transposed_dma(vt, bb=8, interpret=True))
        assert ref.any()
        np.testing.assert_array_equal(ref, got)

    def test_single_block(self):
        vt = self._vis(b=8)
        ref = np.asarray(pallas_flagger.flag_transposed(vt, bb=8, interpret=True))
        got = np.asarray(pallas_flagger.flag_transposed_dma(vt, bb=8, interpret=True))
        np.testing.assert_array_equal(ref, got)

    def test_channel_flags(self):
        vt = self._vis()
        cf = np.zeros(vt.shape[1], np.uint8)
        cf[5] = 1
        ref = np.asarray(pallas_flagger.flag_transposed(
            vt, bb=8, interpret=True, channel_flags=jnp.asarray(cf)))
        got = np.asarray(pallas_flagger.flag_transposed_dma(
            vt, bb=8, interpret=True, channel_flags=jnp.asarray(cf)))
        np.testing.assert_array_equal(ref, got)

    def test_madnz_threshold_dma(self):
        rs = np.random.RandomState(5)
        dev = rs.standard_normal((16, 300)).astype(np.float32)
        dev[:, 80] += 30.0
        dt = jnp.asarray(dev)
        ref = np.asarray(pallas_flagger.madnz_threshold(dt, bb=8, interpret=True))
        got = np.asarray(pallas_flagger.madnz_threshold(
            dt, bb=8, interpret=True, pipeline="dma"))
        assert ref.any()
        np.testing.assert_array_equal(ref, got)

    def test_full_flags(self):
        vt = self._vis()
        rs = np.random.RandomState(9)
        iff = (rs.rand(vt.shape[0], vt.shape[1]) < 0.05).astype(np.uint8)
        ref = np.asarray(pallas_flagger.flag_transposed(
            vt, jnp.asarray(iff), bb=8, interpret=True))
        got = np.asarray(pallas_flagger.flag_transposed_dma(
            vt, jnp.asarray(iff), bb=8, interpret=True))
        np.testing.assert_array_equal(ref, got)


def test_fold_setup_contract():
    """The shared fold/tiling derivation all three engines use."""
    # 32k channels: fold 1024, 32 bands, bb=1 tiles (32 rows % 8 == 0).
    assert pallas_flagger._fold_setup(32768, 1, 1024, 252) == (1024, 32, 32768)
    # Small channel counts round the fold up to a lane multiple.
    assert pallas_flagger._fold_setup(300, 8, 1024, 16) == (384, 1, 384)
    with pytest.raises(ValueError):  # sublane violation: bb*H = 2*3 = 6
        pallas_flagger._fold_setup(2100, 2, 1024, 64)
    with pytest.raises(ValueError):  # baselines not divisible by bb*nref
        pallas_flagger._fold_setup(1024, 8, 1024, 12, nref=2)


def test_flag_dump_dma_pipeline_slabs():
    """flag_dump(pipeline='dma') over multiple slabs matches the grid path."""
    rs = np.random.RandomState(6)
    vis = rs.standard_normal((24, 300, 2)).astype(np.float32)
    vis[:, 77, :] *= 40.0
    vt = jnp.asarray(vis)
    ref = np.asarray(pallas_flagger.flag_dump(vt, slab=8, bb=8, interpret=True))
    got = np.asarray(pallas_flagger.flag_dump(vt, slab=8, bb=8, interpret=True,
                                              pipeline="dma"))
    assert ref.any()
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("radix", [2, 3, 4])
@pytest.mark.slow
def test_rank_radix_matches_binary(radix):
    """The in-kernel multi-bit rank search (rank_radix > 1) is bit-identical
    to the 31-round binary search, including NaN padding and ties."""
    vis, _, _ = rfi_test_data(shape=(300, 16), seed=9)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1))
    base = np.asarray(pallas_flagger.flag_transposed(
        vis_t, width=13, n_sigma=11.0, bb=8, interpret=True))
    out = np.asarray(pallas_flagger.flag_transposed(
        vis_t, width=13, n_sigma=11.0, bb=8, interpret=True, rank_radix=radix))
    np.testing.assert_equal(out, base)
    dev = jnp.asarray(np.abs(np.asarray(vis)).T.astype(np.float32))
    base_m = np.asarray(pallas_flagger.madnz_threshold(dev, bb=8, interpret=True))
    out_m = np.asarray(pallas_flagger.madnz_threshold(
        dev, bb=8, interpret=True, rank_radix=radix))
    np.testing.assert_equal(out_m, base_m)


def test_rank_radix_validation():
    vis, _, _ = rfi_test_data(shape=(128, 8), seed=10)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1))
    with pytest.raises(ValueError, match="rank_radix"):
        pallas_flagger.flag_transposed(vis_t, bb=8, interpret=True, rank_radix=8)


@pytest.mark.slow
def test_leading_layout_matches_trailing():
    """layout="leading" ((2, B, C) planar-leading input, free band-fold
    reshape) produces bit-identical flags through flag_transposed, the
    DMA engine, and the slab-scanned flag_dump."""
    vis, _, _ = rfi_test_data(shape=(300, 24), seed=12)
    planar_t = np.moveaxis(rfi_device.to_planar(vis), 0, 1)  # (B, C, 2)
    planar_l = rfi_device.to_planar(vis.T, leading=True)  # (2, B, C)
    np.testing.assert_array_equal(np.moveaxis(planar_t, -1, 0), planar_l)
    vt = jnp.asarray(planar_t)
    vl = jnp.asarray(planar_l)
    kw = dict(width=13, n_sigma=11.0, bb=8, interpret=True)
    base = np.asarray(pallas_flagger.flag_transposed(vt, **kw))
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_transposed(vl, layout="leading", **kw)), base)
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_transposed_dma(vl, layout="leading", **kw)), base)
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_dump(vl, slab=8, layout="leading", **kw)), base)
    # non-divisible slab: the leading-layout tail slice path
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_dump(vl, slab=16, layout="leading", **kw)), base)
    # FULL-mode input flags ride (baselines, channels) in either layout
    iflags = (np.random.RandomState(13).random_sample((24, 300)) < 0.02).astype(np.uint8)
    base_f = np.asarray(pallas_flagger.flag_transposed(vt, jnp.asarray(iflags), **kw))
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_dump(vl, jnp.asarray(iflags), slab=8,
                                            layout="leading", **kw)), base_f)
    with pytest.raises(ValueError, match="layout"):
        pallas_flagger.flag_transposed(vt, layout="planar", interpret=True)


def test_rank_pair_matches_binary():
    """The speculative paired rank search (two bits per step from three
    independent counts) is bit-identical to the binary search, including
    zeros, ties (halfway averaging) and NaN fold padding.  _madnz_band is
    pure jnp, so this exercises exactly the kernel code path."""
    from katsdpsigproc_tpu.models.rfi.pallas_flagger import _band_matrix, _madnz_band

    rs = np.random.RandomState(11)
    h, w, bands = 4, 256, 3
    channels = h * w - 40  # non-exact fold: NaN padding in play
    rows = h * bands
    absdev = np.abs(rs.standard_normal((rows, w))).astype(np.float32)
    absdev[rs.random_sample(absdev.shape) < 0.05] = 0.0  # zeros counted out
    col = (np.arange(rows)[:, None] % h) * w + np.arange(w)[None, :]
    absdev[col >= channels] = np.nan  # fold padding is absent
    x = jnp.asarray(absdev)
    g = _band_matrix(rows, h)
    base = np.asarray(_madnz_band(x, g, h, channels, True))
    paired = np.asarray(_madnz_band(x, g, h, channels, True, rank_pair=True))
    np.testing.assert_array_equal(paired, base)
    with pytest.raises(ValueError, match="rank_pair"):
        _madnz_band(x, g, h, channels, True, rank_radix=2, rank_pair=True)
    # the 16-bit count pack is SIGNED-int32-exact only below 32768 lanes:
    # c_both can equal the lane width, and 32768 << 16 wraps negative
    wide = jnp.zeros((8, 1 << 15), jnp.float32)
    with pytest.raises(ValueError, match="32768"):
        _madnz_band(wide, _band_matrix(8, 8), 8, 1 << 18, True, rank_pair=True)


@pytest.mark.slow
def test_amp_ingest_matches_planar():
    """ingest='amp' (XLA amplitude + free band-fold reshape, the DMA
    engine streaming 4 B/vis) is bit-identical to the planar pipeline in
    every flags mode and through the slab scan."""
    vis, _, input_flags = rfi_test_data(shape=(96, 16), seed=9)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1))
    kw = dict(bb=8, interpret=True)
    base = np.asarray(pallas_flagger.flag_transposed_dma(vis_t, **kw))
    amp = np.asarray(pallas_flagger.flag_transposed_dma(vis_t, ingest="amp", **kw))
    np.testing.assert_array_equal(amp, base)
    f_t = jnp.asarray(input_flags.T.astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_transposed_dma(vis_t, f_t, ingest="amp", **kw)),
        np.asarray(pallas_flagger.flag_transposed_dma(vis_t, f_t, **kw)))
    cf = jnp.asarray(input_flags[:, 0].astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_transposed_dma(
            vis_t, channel_flags=cf, ingest="amp", **kw)),
        np.asarray(pallas_flagger.flag_transposed_dma(vis_t, channel_flags=cf, **kw)))
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_dump(
            vis_t, slab=8, pipeline="dma", ingest="amp", **kw)),
        base)
    # The grid engine supports amp ingest too (nref=1 only).
    np.testing.assert_array_equal(
        np.asarray(pallas_flagger.flag_transposed(vis_t, ingest="amp", **kw)),
        np.asarray(pallas_flagger.flag_transposed(vis_t, **kw)))
    with pytest.raises(ValueError, match="ingest"):
        pallas_flagger.flag_transposed(vis_t, ingest="bogus", interpret=True)
    with pytest.raises(ValueError, match="nref"):
        pallas_flagger.flag_transposed(vis_t, ingest="amp", nref=2, bb=4,
                                       interpret=True)


def test_rank_variants_match_binary():
    """The f32-packed pair search and the zeros-folded first round are
    bit-identical to the plain binary search (zeros, halfway ties, NaN
    fold padding all in play)."""
    from katsdpsigproc_tpu.models.rfi.pallas_flagger import _band_matrix, _madnz_band

    rs = np.random.RandomState(12)
    h, w, bands = 4, 256, 3
    rows = h * bands
    col = (np.arange(rows)[:, None] % h) * w + np.arange(w)[None, :]
    g = _band_matrix(rows, h)
    for channels in (h * w - 40, h * w - 41):  # even + odd valid counts
        absdev = np.abs(rs.standard_normal((rows, w))).astype(np.float32)
        absdev[rs.random_sample(absdev.shape) < 0.05] = 0.0
        absdev[col >= channels] = np.nan
        x = jnp.asarray(absdev)
        base = np.asarray(_madnz_band(x, g, h, channels, True))
        np.testing.assert_array_equal(
            np.asarray(_madnz_band(x, g, h, channels, True, rank_pair="f32")), base)
        np.testing.assert_array_equal(
            np.asarray(_madnz_band(x, g, h, channels, True, zeros_fold=True)), base)
    with pytest.raises(ValueError, match="zeros_fold"):
        _madnz_band(x, g, h, channels, True, zeros_fold=True, rank_radix=2)


def test_wide_fold_h1_matches_multiband():
    """The h=1 regime (fold covers all channels — the shipped headline
    configuration) must produce flags bit-identical to a multi-band fold
    of the SAME dump: h=1 specializes every channel shift to a single
    lane roll and deletes the band matmuls (_shift_channels h==1,
    _band_matrix -> None), so this pins the specialized code paths
    against the general ones AND against the host oracle."""
    channels, baselines = 1024, 8
    vis, _, _ = rfi_test_data(shape=(channels, baselines), seed=7)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1))
    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(13),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0),
    )
    expected = host_flagger(vis)
    # multi-band (h=8) and wide-fold (h=1), grid and DMA pipelines
    multi = np.asarray(pallas_flagger.flag_transposed(
        vis_t, bb=8, fold=128, interpret=True))
    wide = np.asarray(pallas_flagger.flag_transposed(
        vis_t, bb=8, fold=1024, interpret=True))
    wide_dma = np.asarray(pallas_flagger.flag_transposed_dma(
        vis_t, bb=8, fold=1024, interpret=True))
    np.testing.assert_equal(multi.T, expected)
    np.testing.assert_equal(wide, multi)
    np.testing.assert_equal(wide_dma, multi)


def test_flag_dump_dma_never_scans():
    """flag_dump(pipeline='dma') runs the whole dump as ONE kernel (the
    in-kernel DMA loop replaces the slab scan — the remote AOT service
    rejects scan-wrapped 32768-lane pallas calls).  Flags must still be
    identical to the slab-scanned grid path."""
    channels, baselines = 256, 32
    vis, _, _ = rfi_test_data(shape=(channels, baselines), seed=11)
    vis_t = jnp.asarray(np.moveaxis(rfi_device.to_planar(vis), 0, 1))
    via_scan = np.asarray(pallas_flagger.flag_dump(
        vis_t, slab=8, bb=8, fold=128, interpret=True))  # grid: scans 4 slabs
    via_dma = np.asarray(pallas_flagger.flag_dump(
        vis_t, slab=8, bb=8, fold=128, pipeline="dma", interpret=True))
    np.testing.assert_equal(via_dma, via_scan)
