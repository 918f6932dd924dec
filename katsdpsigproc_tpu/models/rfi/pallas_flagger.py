"""Fused single-kernel RFI flagger (Pallas).

The performance path for the headline benchmark (BASELINE.md): the whole
pipeline — amplitude, masked windowed-median background, MAD noise
estimate, SumThreshold — runs in **one Pallas kernel** per block of
baselines, with every intermediate resident in VMEM.  HBM traffic is the
pipeline's information-theoretic minimum: one read of the visibilities
(8 B/vis) plus one write of the flags (1 B/vis).

Contrast with the reference, which launches five kernels with every
intermediate round-tripping through global memory
(rfi/device.py:1135-1164), and with the XLA path
(:func:`katsdpsigproc_tpu.models.rfi.device.make_flagger_fn`), where the
background filter and rank reductions compile to separate fusions with
HBM-materialized deviations.

Data layout — **baseline-major, folded channels, split-complex**:
``vis_t`` is (baselines, channels, 2) float32 (TPU backends have no
complex dtype); inside the kernel the channel axis is folded to
(H, FOLD=1024) so no vector op exceeds 1024 lanes (the Mosaic AOT
compiler cannot digest 32k-lane ops).  A shift along the logical channel
axis is a lane rotation plus a sublane-row rotation with a lane-index
select (:func:`_shift_channels`); out-of-band positions are handled by
global-channel iota masks, never by padding values (Mosaic rejects
unaligned pads/concats).

Algorithms (identical semantics to the host oracle / jnp path):

* background median: compare-count selection over the ``width`` window
  members held in a VMEM scratch, absent members +inf with a positional
  valid count (background_median_filter.mako:96-145 semantics); the rank
  loops are ``fori_loop``s over the scratch so the kernel IR stays compact;
* MAD noise: the reference's bitwise IEEE-754 binary search
  (rank.mako:186-231, madnz_t.mako:72-87), NaN-masking the fold padding;
* SumThreshold: full-window shifted sums + dilation with **float32 0/1
  flag state** (host.py ThresholdSumHost semantics; cf.
  threshold_sum.mako:49-132).

Mosaic hardware notes baked in: loop-carried i1 vectors allocate
pathological scoped VMEM (carry flags as f32 0/1); lane rotates need
32-bit elements and non-negative shifts; f32→u8 casts go via i32.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: nocover
    pltpu = None
    _VMEM = None

from ...utils import tune as _tune
from . import MAD_NORMAL

_INF = np.float32(np.inf)  # python scalar: a kernel literal, not a captured const
_NAN = np.float32(np.nan)


def _roll(x, shift: int, axis: int, interpret: bool):
    """Static roll: pltpu.roll on hardware, jnp.roll in interpret mode."""
    if shift % x.shape[axis] == 0:
        return x
    if interpret or pltpu is None:
        return jnp.roll(x, shift, axis)
    # pltpu.roll requires a non-negative shift; rolling by -j == rolling
    # forward by size - j.
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _shift_channels(x, d: int, interpret: bool):
    """out[..., h, w] = x at logical channel (h*W + w + d), wrap garbage.

    `x` is (bb, H, W) with the logical channel axis folded row-major into
    (H, W).  The result is exact for all positions whose source channel is
    in range; positions whose source wraps carry garbage and MUST be
    masked by the caller (all callers mask on the global channel iota).
    """
    if d == 0:
        return x
    w = x.shape[-1]
    if abs(d) >= w:
        raise ValueError("shift exceeds fold width")
    lane = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rl = _roll(x, -d, x.ndim - 1, interpret)
    if d > 0:
        # source lane w+d; lanes >= W-d spill into the next sublane row
        rs = _roll(rl, -1, x.ndim - 2, interpret)
        return jnp.where(lane < w - d, rl, rs)
    # d < 0: source lane w+d; lanes < -d come from the previous row
    rs = _roll(rl, 1, x.ndim - 2, interpret)
    return jnp.where(lane >= -d, rl, rs)


def _masked_median_rows(members_ref, n, width: int):
    """Compare-count masked median over the `width` members in scratch.

    ``members_ref`` is a (width, bb, H, W) VMEM scratch of window members
    (+inf = absent); `n` the (bb, H, W) valid count.  Stable ranks (ties
    to the earlier member) make each valid member's rank unique, so the
    two middle elements are selected by rank equality and summed
    (averaged — the reference's even-count semantics).
    """
    lo_rank = (n - 1) // 2
    hi_rank = n // 2
    shape = n.shape

    def body_j(j, carry):
        v_lo, v_hi = carry
        mj = members_ref[j]

        def body_k(k, r):
            mk = members_ref[k]
            lt = (mk < mj) | ((mk == mj) & (k < j))
            return r + lt.astype(jnp.int32)

        r = lax.fori_loop(0, width, body_k, jnp.zeros(shape, jnp.int32))
        vj = jnp.where(mj == _INF, 0.0, mj)
        v_lo = v_lo + jnp.where(r == lo_rank, vj, 0.0)
        v_hi = v_hi + jnp.where(r == hi_rank, vj, 0.0)
        return v_lo, v_hi

    v_lo, v_hi = lax.fori_loop(
        0, width, body_j, (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    )
    return (v_lo + v_hi) * jnp.float32(0.5)


def _madnz_rows(absdev, channels: int):
    """MAD of non-zero |deviations| per baseline of (bb, H, W).

    NaN entries (fold padding) are absent: they count in neither the rank
    nor the zero count, exactly like the reference's NaN padding
    (madnz_t.mako:50, rank.mako:47-58).
    """
    zeros = jnp.sum((absdev == 0).astype(jnp.int32), axis=(1, 2), keepdims=True)
    rank2 = channels + zeros
    target = rank2 // 2
    halfway = (rank2 & 1) == 0

    def body(i, cur):
        test = cur | (jnp.int32(1) << (30 - i))
        cand = lax.bitcast_convert_type(test, jnp.float32)
        r = jnp.sum((absdev < cand).astype(jnp.int32), axis=(1, 2), keepdims=True)
        return jnp.where(r <= target, test, cur)

    cur = lax.fori_loop(0, 31, body, jnp.zeros(target.shape, jnp.int32))
    result = lax.bitcast_convert_type(cur, jnp.float32)
    r = jnp.sum((absdev < result).astype(jnp.int32), axis=(1, 2), keepdims=True)
    prev = jnp.max(jnp.where(absdev < result, absdev, 0.0), axis=(1, 2), keepdims=True)
    med = jnp.where(halfway & (r == target), (result + prev) * 0.5, result)
    return jnp.float32(MAD_NORMAL) * med  # (bb, 1, 1)


def _threshold_sum_rows(dev, noise, col, channels: int, n_sigma, n_windows: int, falloff,
                        interpret: bool = False):
    """SumThreshold along folded channels of (bb, H, W); float32 0/1 flags.

    `col` is the global-channel iota; `dev` must be 0 on fold padding.
    """
    flags = jnp.zeros(dev.shape, jnp.float32)  # 0.0 / 1.0
    base_threshold = (jnp.float32(n_sigma) * noise).astype(jnp.float32)  # (bb, 1, 1)
    for w in range(n_windows):
        window = 1 << w
        if window > channels:
            break
        threshold = base_threshold * jnp.float32(falloff**-w)
        clamped = flags * threshold + (1.0 - flags) * dev
        # sums[c] = sum(clamped[c : c + window]); valid for c <= C - window
        sums = clamped
        for j in range(1, window):
            sums = sums + _shift_channels(clamped, j, interpret)
        sf = ((sums > threshold * window) & (col <= channels - window)).astype(jnp.float32)
        acc = sf
        for j in range(1, window):
            # garbage from wraps comes from c > C - window: masked 0 in sf
            acc = acc + _shift_channels(sf, -j, interpret)
        flags = jnp.maximum(flags, jnp.minimum(acc, 1.0))
    return flags


def _flagger_kernel(vis_ref, flags_ref, members_ref, *, width: int, n_sigma: float,
                    n_windows: int, falloff: float, flag_value: int, channels: int,
                    interpret: bool = False):
    re = vis_ref[:, :, :, 0]
    im = vis_ref[:, :, :, 1]
    amp = jnp.sqrt(re * re + im * im)  # (bb, H, W)
    bb, hh, ww = amp.shape
    col = (
        lax.broadcasted_iota(jnp.int32, amp.shape, 1) * ww
        + lax.broadcasted_iota(jnp.int32, amp.shape, 2)
    )
    in_band = col < channels

    # Window members via folded-channel shifts, absent members +inf.
    h = width // 2
    n = jnp.zeros(amp.shape, jnp.int32)
    for d in range(-h, h + 1):
        shifted = _shift_channels(amp, d, interpret)
        valid = (col + d >= 0) & (col + d < channels)
        members_ref[d + h] = jnp.where(valid, shifted, _INF)
        n = n + valid.astype(jnp.int32)

    med = _masked_median_rows(members_ref, n, width)
    dev = amp - med  # garbage on padding; masked below

    absdev = jnp.where(in_band, jnp.abs(dev), _NAN)
    noise = _madnz_rows(absdev, channels)
    dev0 = jnp.where(in_band, dev, 0.0)
    flags = _threshold_sum_rows(dev0, noise, col, channels, n_sigma, n_windows, falloff,
                                interpret)
    # flags are float32 0/1; scale and cast via int32 (Mosaic has no direct
    # f32→u8 cast, and i1 relayouts to 8-bit tiling are unsupported).
    flags_ref[:, :, :] = (flags * flag_value).astype(jnp.int32).astype(jnp.uint8)


class FusedFlaggerTemplate:
    """Template wrapper for :func:`flag_transposed` with the Template/tuning
    convention (reference: rfi/device.py template classes).

    Tuning knob ``bb`` is the baselines-per-grid-step (VMEM budget /
    pipelining tradeoff) — the fused kernel's analogue of the reference's
    ``wgs``/``csplit`` searches.
    """

    autotune_version = 2

    def __init__(self, context, width: int = 13, n_windows: int = 4,
                 threshold_falloff: float = 1.2, flag_value: int = 1, tuning=None):
        self.context = context
        self.width = width
        self.n_windows = n_windows
        self.threshold_falloff = threshold_falloff
        self.flag_value = flag_value
        if tuning is None:
            tuning = self.autotune(context, width, n_windows)
        self.bb = tuning.get("bb", 8)

    @classmethod
    @_tune.autotuner(test={"bb": 8})
    def autotune(cls, context, width, n_windows):
        channels, baselines = 32768, 128
        rs = np.random.RandomState(seed=1)
        vis_t = jnp.asarray(rs.standard_normal((baselines, channels, 2)).astype(np.float32))

        def generate(bb):
            def call():
                return flag_transposed(vis_t, width=width, n_windows=n_windows, bb=bb)

            return _tune.make_measure(call)

        return _tune.autotune(generate, bb=[8, 16, 32])

    def __call__(self, vis_t, n_sigma: float = 11.0, interpret: bool = False):
        return flag_transposed(
            vis_t,
            width=self.width,
            n_sigma=n_sigma,
            n_windows=self.n_windows,
            falloff=self.threshold_falloff,
            flag_value=self.flag_value,
            bb=self.bb,
            interpret=interpret,
        )


@functools.partial(
    jax.jit,
    static_argnames=("width", "n_sigma", "n_windows", "falloff", "flag_value", "bb", "fold",
                     "interpret"),
)
def flag_transposed(vis_t, width: int = 13, n_sigma: float = 11.0, n_windows: int = 4,
                    falloff: float = 1.2, flag_value: int = 1, bb: int = 8,
                    fold: int = 1024, interpret: bool = False):
    """Fused flagger on baseline-major planar visibilities.

    Parameters
    ----------
    vis_t
        (baselines, channels, 2) float32 split-complex visibilities.
    bb
        Baselines per grid step (VMEM budget knob; the tuning dimension).
    fold
        Lane width of the folded channel axis (≤ 1024; must be a multiple
        of 128 unless it covers all channels).

    Returns
    -------
    (baselines, channels) uint8 flags.
    """
    baselines, channels = vis_t.shape[0], vis_t.shape[1]
    if baselines % bb:
        raise ValueError(f"baselines ({baselines}) must divide by bb ({bb})")
    fold = min(fold, max(128, -(-channels // 128) * 128)) if channels > 128 else channels
    hh = -(-channels // fold)
    padded_c = hh * fold
    if padded_c != channels:
        vis_t = jnp.pad(vis_t, ((0, 0), (0, padded_c - channels), (0, 0)))
    folded = vis_t.reshape(baselines, hh, fold, 2)

    kernel = functools.partial(
        _flagger_kernel,
        width=width,
        n_sigma=n_sigma,
        n_windows=n_windows,
        falloff=falloff,
        flag_value=flag_value,
        channels=channels,
        interpret=interpret,
    )
    kwargs = {}
    if not interpret and pltpu is not None:
        # The default scoped-VMEM limit is 16 MiB; v5e has 128 MiB physical.
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(baselines // bb,),
        in_specs=[pl.BlockSpec((bb, hh, fold, 2), lambda i: (i, 0, 0, 0), memory_space=_VMEM)],
        out_specs=pl.BlockSpec((bb, hh, fold), lambda i: (i, 0, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((baselines, hh, fold), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((width, bb, hh, fold), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(folded)
    return out.reshape(baselines, padded_c)[:, :channels]
