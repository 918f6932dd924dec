"""FFT op tests (reference: test/test_fft.py oracle pattern vs numpy.fft)."""

import jax.numpy as jnp
import numpy as np
import pytest

from katsdpsigproc_tpu.ops import fft

from .helpers import complex_normal


@pytest.fixture
def ctx(patch_autotune):
    from katsdpsigproc_tpu.utils import backend

    return backend.create_some_context()


class TestFft:
    @pytest.mark.parametrize("batch", [(), (3,)])
    @pytest.mark.parametrize("n", [1, 2])
    def test_c2c_forward(self, ctx, batch, n):
        shape = batch + (16, 48)[-n:] if n > 1 or not batch else batch + (48,)
        shape = batch + ((16, 48) if n == 2 else (48,))
        rs = np.random.RandomState(1)
        src = complex_normal(rs, size=shape).astype(np.complex64)
        template = fft.FftTemplate(ctx, n, shape, np.complex64, np.complex64)
        op = template.instantiate(None, fft.FftMode.FORWARD)
        out = np.asarray(op(src=jnp.asarray(src))["dest"])
        expected = np.fft.fftn(src, axes=tuple(range(len(shape) - n, len(shape))))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_c2c_roundtrip_unnormalised(self, ctx):
        """forward ∘ inverse must scale by the number of elements (cuFFT
        convention, reference fft.py:228-230)."""
        shape = (8, 32)
        rs = np.random.RandomState(2)
        src = complex_normal(rs, size=shape).astype(np.complex64)
        template = fft.FftTemplate(ctx, 2, shape, np.complex64, np.complex64)
        fwd = template.instantiate(None, fft.FftMode.FORWARD)
        inv = template.instantiate(None, fft.FftMode.INVERSE)
        mid = fwd(src=jnp.asarray(src))["dest"]
        out = np.asarray(inv(src=mid)["dest"])
        np.testing.assert_allclose(out, src * (8 * 32), rtol=1e-4, atol=1e-2)

    def test_r2c(self, ctx):
        shape = (4, 35)
        rs = np.random.RandomState(3)
        src = rs.standard_normal(shape).astype(np.float32)
        template = fft.FftTemplate(ctx, 1, shape, np.float32, np.complex64)
        assert template.shape_dest == (4, 18)
        op = template.instantiate(None, fft.FftMode.FORWARD)
        out = np.asarray(op(src=jnp.asarray(src))["dest"])
        np.testing.assert_allclose(out, np.fft.rfft(src, axis=-1), rtol=1e-4, atol=1e-3)

    def test_c2r_unnormalised(self, ctx):
        shape = (4, 35)  # odd final dimension exercises the s= handling
        rs = np.random.RandomState(4)
        real = rs.standard_normal(shape).astype(np.float32)
        spectrum = np.fft.rfft(real, axis=-1).astype(np.complex64)
        template = fft.FftTemplate(ctx, 1, shape, np.complex64, np.float32)
        op = template.instantiate(None, fft.FftMode.INVERSE)
        out = np.asarray(op(src=jnp.asarray(spectrum))["dest"])
        np.testing.assert_allclose(out, real * 35, rtol=1e-3, atol=1e-3)

    def test_mode_validation(self, ctx):
        template = fft.FftTemplate(ctx, 1, (16,), np.float32, np.complex64)
        with pytest.raises(ValueError):
            template.instantiate(None, fft.FftMode.INVERSE)
        template = fft.FftTemplate(ctx, 1, (16,), np.complex64, np.float32)
        with pytest.raises(ValueError):
            template.instantiate(None, fft.FftMode.FORWARD)
        with pytest.raises(ValueError):
            fft.FftTemplate(ctx, 1, (16,), np.float32, np.float32)

    def test_batch_padding_rejected(self, ctx):
        with pytest.raises(ValueError):
            fft.FftTemplate(
                ctx, 1, (4, 16), np.complex64, np.complex64,
                padded_shape_src=(5, 16), padded_shape_dest=(4, 16),
            )


class TestFftPaddedEmbedding:
    def test_padded_transform_axis_accepted(self, ctx):
        """Padded embeddings on the transform axes are a layout concern under
        XLA (reference fft.py:262-266 embeds via cufftMakePlanMany64); the
        template records them and the op still transforms the logical
        region exactly."""
        shape = (4, 48)
        rs = np.random.RandomState(3)
        src = complex_normal(rs, size=shape).astype(np.complex64)
        template = fft.FftTemplate(
            ctx, 1, shape, np.complex64, np.complex64,
            padded_shape_src=(4, 64), padded_shape_dest=(4, 56),
        )
        assert template.padded_shape_src == (4, 64)
        assert template.padded_shape_dest == (4, 56)
        op = template.instantiate(None, fft.FftMode.FORWARD)
        out = np.asarray(op(src=jnp.asarray(src))["dest"])
        np.testing.assert_allclose(out, np.fft.fft(src, axis=-1), rtol=1e-4, atol=1e-3)

    def test_r2c_dest_padding(self, ctx):
        shape = (4, 48)
        rs = np.random.RandomState(4)
        src = rs.standard_normal(shape).astype(np.float32)
        template = fft.FftTemplate(
            ctx, 1, shape, np.float32, np.complex64,
            padded_shape_dest=(4, 32),
        )
        op = template.instantiate(None, fft.FftMode.FORWARD)
        out = np.asarray(op(src=jnp.asarray(src))["dest"])
        assert out.shape == (4, 25)  # logical (N//2 + 1), not the padded shape
        np.testing.assert_allclose(out, np.fft.rfft(src, axis=-1), rtol=1e-4, atol=1e-3)
