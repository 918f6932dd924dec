"""Device-vs-host parity tests for the RFI pipeline.

Follows the reference's oracle pattern exactly: the host classes are the
oracles for the device classes, via the *HostFromDevice wrappers
(reference: test/rfi/test_background.py:63-107, test_noise_est.py:46-79,
test_threshold.py:44-93, test_flagger.py:55-130)."""

import numpy as np
import pytest

from katsdpsigproc_tpu.models.rfi import device, host

from ..helpers import complex_normal, rfi_test_data


@pytest.fixture
def ctx(patch_autotune):
    from katsdpsigproc_tpu.utils import backend

    return backend.create_some_context()


@pytest.fixture(scope="module")
def big_data():
    shape = (417, 313)
    rs = np.random.RandomState(seed=1)
    vis = complex_normal(rs, size=shape).astype(np.complex64)
    flags = (rs.random_sample(shape) < 0.1).astype(np.uint8)
    flags[100:110, 0:100] = 4  # entire windows flagged; non-0/1 flag values
    return vis, flags


class TestBackgroundDevice:
    @pytest.mark.parametrize("amplitudes", [False, True])
    @pytest.mark.parametrize(
        "use_flags",
        [device.BackgroundFlags.NONE, device.BackgroundFlags.CHANNEL, device.BackgroundFlags.FULL],
    )
    def test_vs_host(self, ctx, big_data, amplitudes, use_flags):
        width = 5
        vis, flags = big_data
        template = device.BackgroundMedianFilterDeviceTemplate(ctx, width, amplitudes, use_flags)
        bg_host = template.host_class(width, amplitudes)
        bg_device = device.BackgroundHostFromDevice(template)
        if amplitudes:
            vis = np.abs(vis)
        if use_flags:
            f = flags if use_flags == device.BackgroundFlags.FULL else flags[:, 0]
            out_host = bg_host(vis, f)
            out_device = bg_device(vis, f)
        else:
            out_host = bg_host(vis)
            out_device = bg_device(vis)
        np.testing.assert_allclose(out_host, out_device, atol=1e-6)

    def test_use_flags_validation(self, ctx):
        with pytest.raises(TypeError):
            device.BackgroundMedianFilterDeviceTemplate(ctx, 5, use_flags="yes")
        t = device.BackgroundMedianFilterDeviceTemplate(ctx, 5, use_flags=True)
        assert t.use_flags == device.BackgroundFlags.CHANNEL
        t = device.BackgroundMedianFilterDeviceTemplate(ctx, 5, use_flags=False)
        assert t.use_flags == device.BackgroundFlags.NONE

    def test_flag_mismatch_raises(self, ctx):
        template = device.BackgroundMedianFilterDeviceTemplate(ctx, 5)
        wrapper = device.BackgroundHostFromDevice(template)
        with pytest.raises(TypeError):
            wrapper(np.zeros((8, 4), np.complex64), np.zeros(8, np.uint8))

    @pytest.mark.parametrize("width", [3, 5, 13])
    def test_median_engines_agree(self, width):
        """Batcher-network and compare-count selection are bit-identical,
        including ties, NaN-masked members, and all-NaN windows."""
        rs = np.random.RandomState(seed=3)
        amp = rs.choice([0.25, 0.5, 1.0, 2.0, 4.0], size=(97, 17)).astype(np.float32)
        amp[rs.random_sample(amp.shape) < 0.3] = np.nan
        amp[40:60, 5] = np.nan  # windows with zero valid members
        med_net, n_net = device.masked_median_filter(amp, width, engine="network")
        med_cnt, n_cnt = device.masked_median_filter(amp, width, engine="count")
        np.testing.assert_array_equal(np.asarray(n_net), np.asarray(n_cnt))
        np.testing.assert_array_equal(np.asarray(med_net), np.asarray(med_cnt))
        with pytest.raises(ValueError):
            device.masked_median_filter(amp, width, engine="quantum")

    @pytest.mark.parametrize("width", [3, 5, 13])
    @pytest.mark.parametrize("channels", [13, 14, 97, 128, 99])
    def test_edges_only_fast_path(self, width, channels):
        """The ±inf edge-fill fast path selects the same elements as the
        general NaN-masked path on NaN-free input — bit-identical medians
        and valid counts, at every edge column and both n parities."""
        if channels < width:
            pytest.skip("fast path requires channels >= width")
        rs = np.random.RandomState(seed=7)
        amp = rs.choice([0.25, 0.5, 1.0, 2.0, 4.0], size=(channels, 9)).astype(np.float32)
        med_fast, n_fast = device.masked_median_filter(amp, width, edges_only=True)
        med_gen, n_gen = device.masked_median_filter(amp, width)
        np.testing.assert_array_equal(np.asarray(n_fast), np.asarray(n_gen))
        np.testing.assert_array_equal(np.asarray(med_fast), np.asarray(med_gen))


class TestNoiseEstDevice:
    @pytest.mark.parametrize("transposed", [False, True])
    def test_vs_host(self, ctx, transposed):
        shape = (367, 93)
        rs = np.random.RandomState(seed=2)
        deviations = np.abs(rs.standard_normal(shape)).astype(np.float32)
        # plant some exact zeros (excluded from the median)
        deviations[rs.random_sample(shape) < 0.05] = 0.0
        if transposed:
            template = device.NoiseEstMADTDeviceTemplate(ctx, 1024)
        else:
            template = device.NoiseEstMADDeviceTemplate(ctx)
        out_host = template.host_class()(deviations)
        out_device = device.NoiseEstHostFromDevice(template)(deviations)
        np.testing.assert_allclose(out_host, out_device, rtol=1e-5)

    def test_max_channels(self, ctx):
        template = device.NoiseEstMADTDeviceTemplate(ctx, 64)
        with pytest.raises(ValueError):
            template.instantiate(None, 128, 4)


class TestThresholdDevice:
    @pytest.mark.parametrize("transposed", [False, True])
    def test_simple_vs_host(self, ctx, transposed):
        shape = (223, 131)
        rs = np.random.RandomState(seed=3)
        deviations = np.abs(rs.standard_normal(shape)).astype(np.float32)
        noise = (rs.uniform(0.5, 1.5, shape[1])).astype(np.float32)
        template = device.ThresholdSimpleDeviceTemplate(ctx, transposed, flag_value=4)
        out_host = template.host_class(3.0, flag_value=4)(deviations, noise)
        out_device = device.ThresholdHostFromDevice(template, n_sigma=3.0)(deviations, noise)
        np.testing.assert_equal(out_host, out_device)

    @pytest.mark.parametrize("n_windows", [1, 2, 4])
    def test_sum_vs_host(self, ctx, n_windows):
        shape = (500, 37)
        rs = np.random.RandomState(seed=4)
        deviations = rs.standard_normal(shape).astype(np.float32)
        # plant spikes (isolated and runs) to exercise every window size
        deviations[100, :] += 50.0
        deviations[200:204, 5:9] += 20.0
        deviations[300:316, 11] += 8.0
        noise = np.full(shape[1], 1.0, np.float32)
        template = device.ThresholdSumDeviceTemplate(ctx, n_windows, flag_value=2)
        out_host = template.host_class(4.5, n_windows, flag_value=2)(deviations, noise)
        out_device = device.ThresholdHostFromDevice(template, n_sigma=4.5)(deviations, noise)
        np.testing.assert_equal(out_host, out_device)


class TestFlaggerDevice:
    @pytest.mark.parametrize(
        "use_flags",
        [device.BackgroundFlags.NONE, device.BackgroundFlags.CHANNEL, device.BackgroundFlags.FULL],
    )
    @pytest.mark.parametrize("transpose_noise_est", [False, True])
    @pytest.mark.parametrize("threshold_kind", ["simple", "simple_t", "sum"])
    def test_spike_recovery(self, ctx, use_flags, transpose_noise_est, threshold_kind):
        vis, spikes, input_flags = rfi_test_data()
        background = device.BackgroundMedianFilterDeviceTemplate(ctx, 13, use_flags=use_flags)
        if transpose_noise_est:
            noise_est = device.NoiseEstMADTDeviceTemplate(ctx, 1024)
        else:
            noise_est = device.NoiseEstMADDeviceTemplate(ctx)
        if threshold_kind == "sum":
            threshold = device.ThresholdSumDeviceTemplate(ctx)
        else:
            threshold = device.ThresholdSimpleDeviceTemplate(
                ctx, transposed=threshold_kind == "simple_t"
            )
        flagger_template = device.FlaggerDeviceTemplate(background, noise_est, threshold)
        flagger = device.FlaggerHostFromDevice(
            flagger_template, threshold_args=dict(n_sigma=11.0)
        )
        if use_flags == device.BackgroundFlags.CHANNEL:
            flags = flagger(vis, input_flags[:, 0])
            bcast = np.broadcast_to(input_flags[:, 0:1], vis.shape)
            expected = np.where(bcast, 0, spikes)
        elif use_flags == device.BackgroundFlags.FULL:
            flags = flagger(vis, input_flags)
            expected = np.where(input_flags, 0, spikes)
        else:
            flags = flagger(vis)
            expected = spikes
        if threshold_kind == "sum":
            # SumThreshold smears flags: every expected spike must be found
            assert (flags[expected.astype(bool)] != 0).all()
        else:
            np.testing.assert_equal(expected, flags)

    def test_planar_layout_matches_complex(self, ctx):
        """The TPU split-complex layout must give identical flags."""
        vis, _, _ = rfi_test_data(shape=(229, 57), seed=9)
        import jax.numpy as jnp

        fn = device.make_flagger_fn(13, 11.0, threshold="sum")
        out_c = np.asarray(fn(jnp.asarray(vis)))
        out_p = np.asarray(fn(jnp.asarray(device.to_planar(vis))))
        np.testing.assert_equal(out_c, out_p)

    def test_make_flagger_fn_baseline_block(self, ctx):
        vis, _, _ = rfi_test_data(shape=(128, 48), seed=10)
        import jax.numpy as jnp

        full = device.make_flagger_fn(13, 11.0)
        blocked = device.make_flagger_fn(13, 11.0, baseline_block=16)
        np.testing.assert_equal(
            np.asarray(full(jnp.asarray(vis))), np.asarray(blocked(jnp.asarray(vis)))
        )
        # Planar input with a non-dividing tail
        blocked20 = device.make_flagger_fn(13, 11.0, baseline_block=20)
        np.testing.assert_equal(
            np.asarray(full(jnp.asarray(vis))),
            np.asarray(blocked20(jnp.asarray(device.to_planar(vis)))),
        )

    @pytest.mark.parametrize("block_impl", ["slice", "scan", "unroll", "pad"])
    @pytest.mark.parametrize(
        "use_flags", [device.BackgroundFlags.CHANNEL, device.BackgroundFlags.FULL]
    )
    def test_blocked_input_flags(self, ctx, use_flags, block_impl):
        """Blocked flagging forwards CHANNEL/FULL input flags to every slab
        (including the non-dividing tail) for both blocking impls."""
        vis, _, _ = rfi_test_data(shape=(128, 50), seed=12)
        import jax.numpy as jnp

        rs = np.random.RandomState(seed=12)
        if use_flags == device.BackgroundFlags.CHANNEL:
            flags = (rs.random_sample(128) < 0.1).astype(np.uint8)
        else:
            flags = (rs.random_sample((128, 50)) < 0.1).astype(np.uint8)
        full = device.make_flagger_fn(13, 11.0, use_flags=use_flags)
        blocked = device.make_flagger_fn(
            13, 11.0, use_flags=use_flags, baseline_block=16, block_impl=block_impl
        )
        np.testing.assert_equal(
            np.asarray(full(jnp.asarray(vis), jnp.asarray(flags))),
            np.asarray(blocked(jnp.asarray(vis), jnp.asarray(flags))),
        )

    @pytest.mark.parametrize("threshold", ["sum", "simple"])
    def test_make_flagger_fn_straight_layout(self, ctx, threshold):
        """Channel-major (straight) engine is bit-identical to the
        transposed engine — the reference's madnz vs madnz_t pairing."""
        vis, _, _ = rfi_test_data(shape=(128, 48), seed=11)
        import jax.numpy as jnp

        t = device.make_flagger_fn(13, 11.0, threshold=threshold)
        s = device.make_flagger_fn(13, 11.0, threshold=threshold, layout="straight")
        np.testing.assert_equal(np.asarray(t(jnp.asarray(vis))), np.asarray(s(jnp.asarray(vis))))
        # Blocked + straight, with a non-dividing tail
        sb = device.make_flagger_fn(
            13, 11.0, threshold=threshold, layout="straight", baseline_block=20
        )
        np.testing.assert_equal(np.asarray(t(jnp.asarray(vis))), np.asarray(sb(jnp.asarray(vis))))
        with pytest.raises(ValueError):
            device.make_flagger_fn(13, 11.0, layout="diagonal")

    def test_vs_full_host_flagger(self, ctx):
        """Device pipeline vs host pipeline, stage-identical configuration."""
        vis, _, _ = rfi_test_data(shape=(229, 57), seed=7)
        host_flagger = host.FlaggerHost(
            host.BackgroundMedianFilterHost(13),
            host.NoiseEstMADHost(),
            host.ThresholdSumHost(11.0),
        )
        device_flagger = device.FlaggerHostFromDevice(
            device.FlaggerDeviceTemplate(
                device.BackgroundMedianFilterDeviceTemplate(ctx, 13),
                device.NoiseEstMADTDeviceTemplate(ctx, 1024),
                device.ThresholdSumDeviceTemplate(ctx),
            ),
            threshold_args=dict(n_sigma=11.0),
        )
        np.testing.assert_equal(host_flagger(vis), device_flagger(vis))


def test_instance_abcs():
    """Instance-level stage ABCs exist and concrete ops derive from them
    (reference rfi/device.py:49-95)."""
    from katsdpsigproc_tpu.models.rfi import device as d

    assert issubclass(d.BackgroundMedianFilterDevice, d.AbstractBackgroundDevice)
    assert issubclass(d.NoiseEstMADDevice, d.AbstractNoiseEstDevice)
    assert issubclass(d.NoiseEstMADTDevice, d.AbstractNoiseEstDevice)
    assert issubclass(d.ThresholdSimpleDevice, d.AbstractThresholdDevice)
    assert issubclass(d.ThresholdSumDevice, d.AbstractThresholdDevice)


class TestTuningKnobsConsumed:
    """Every tuning key a template stores must be consumed by its compute
    path (VERDICT r1 #4: no write-only tuning.get results)."""

    def test_background_engine_knob(self, ctx, big_data):
        vis, _ = big_data
        bogus = device.BackgroundMedianFilterDeviceTemplate(
            ctx, 5, tuning={"engine": "bogus"})
        assert bogus.engine == "bogus"
        with pytest.raises(ValueError, match="unknown engine"):
            device.BackgroundHostFromDevice(bogus)(vis)
        # Both real engines are consumed and bit-identical.
        outs = [
            device.BackgroundHostFromDevice(
                device.BackgroundMedianFilterDeviceTemplate(
                    ctx, 5, tuning={"engine": engine}))(vis)
            for engine in ("network", "count")
        ]
        np.testing.assert_array_equal(outs[0], outs[1])

    @pytest.mark.parametrize("template_cls", [
        device.NoiseEstMADTDeviceTemplate, device.NoiseEstMADDeviceTemplate])
    def test_noise_est_radix_knob(self, ctx, template_cls, monkeypatch):
        from katsdpsigproc_tpu.ops import rank as rank_ops

        seen = []
        orig = rank_ops.median_non_zero

        def spy(values, n=None, *args, **kwargs):
            seen.append(kwargs.get("radix_bits"))
            return orig(values, n, *args, **kwargs)

        monkeypatch.setattr(device.rank_ops, "median_non_zero", spy)
        template = template_cls(ctx, tuning={"radix_bits": 2})
        assert template.radix_bits == 2
        est = device.NoiseEstHostFromDevice(template)
        rs = np.random.RandomState(seed=3)
        dev = np.abs(rs.standard_normal((64, 32))).astype(np.float32)
        noise = est(dev)
        assert seen == [2]
        # Exactness is radix-independent.
        np.testing.assert_array_equal(
            noise, device.NoiseEstHostFromDevice(
                template_cls(ctx, tuning={"radix_bits": 8}))(dev))
