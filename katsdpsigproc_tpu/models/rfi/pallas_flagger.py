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
per-baseline noise reduction and the background filter compile to separate
fusions with HBM-materialized deviations.

Layout: **baseline-major planar** — ``vis_t`` is (baselines, channels, 2)
float32 (split-complex; TPU backends have no complex dtype) and flags
come back (baselines, channels) uint8.  Baseline-major puts the channel
axis on vector lanes, which is what every stage wants: the median window
is a lane rotation, the rank searches reduce along lanes, and
SumThreshold's window sums are lane rotations.  (The reference reaches the
same conclusion for its noise/threshold stages — the "transposed"
variants, rfi/device.py:366,482-488.)

Algorithms (identical semantics to the host oracle / jnp path):

* background median: compare-count selection over the ``width`` window
  members held in a VMEM scratch, out-of-band members +inf with a
  positional valid count (background_median_filter.mako:96-145
  semantics); the rank loops are ``fori_loop``s over the scratch so the
  kernel IR stays compact at 32k channels;
* MAD noise: the reference's bitwise IEEE-754 binary search
  (rank.mako:186-231, madnz_t.mako:72-87) along lanes;
* SumThreshold: full-window rotated sums + dilation with **float32 0/1
  flag state** (host.py ThresholdSumHost semantics; cf.
  threshold_sum.mako:49-132).  Mosaic hardware notes baked in: loop-
  carried i1 vectors allocate pathological scoped VMEM, lane rotates need
  32-bit elements, and f32→u8 casts must go via i32.
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

from . import MAD_NORMAL

_INF = np.float32(np.inf)  # python scalar: a kernel literal, not a captured const


def _roll(x, shift: int, axis: int, interpret: bool):
    """Lane roll: pltpu.roll on hardware, jnp.roll in interpret mode."""
    if interpret or pltpu is None:
        return jnp.roll(x, shift, axis)
    # pltpu.roll requires a non-negative shift; rolling by -j == rolling
    # forward by size - j.
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _masked_median_rows(members_ref, n, width: int):
    """Compare-count masked median over the `width` members in scratch.

    ``members_ref`` is a (width, bb, C) VMEM scratch of window members
    (+inf = absent); `n` the (bb, C) valid count.  Stable ranks (ties to
    the earlier member) make each valid member's rank unique, so the two
    middle elements are selected by rank equality and summed.
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
    """MAD of non-zero |deviations| per row of (bb, C) — bitwise rank search."""
    zeros = jnp.sum((absdev == 0).astype(jnp.int32), axis=1, keepdims=True)
    rank2 = channels + zeros
    target = rank2 // 2
    halfway = (rank2 & 1) == 0

    def body(i, cur):
        test = cur | (jnp.int32(1) << (30 - i))
        cand = lax.bitcast_convert_type(test, jnp.float32)
        r = jnp.sum((absdev < cand).astype(jnp.int32), axis=1, keepdims=True)
        return jnp.where(r <= target, test, cur)

    cur = lax.fori_loop(0, 31, body, jnp.zeros(target.shape, jnp.int32))
    result = lax.bitcast_convert_type(cur, jnp.float32)
    r = jnp.sum((absdev < result).astype(jnp.int32), axis=1, keepdims=True)
    prev = jnp.max(jnp.where(absdev < result, absdev, 0.0), axis=1, keepdims=True)
    med = jnp.where(halfway & (r == target), (result + prev) * 0.5, result)
    return jnp.float32(MAD_NORMAL) * med  # (bb, 1)


def _threshold_sum_rows(dev, noise, channels: int, n_sigma, n_windows: int, falloff,
                        interpret: bool = False):
    """SumThreshold along lanes of (bb, C); returns float32 0/1 flags.

    The flag state is carried as float32 0/1, not bool: Mosaic allocates
    pathological scoped VMEM for loop-carried i1 vectors (measured: 17 MiB
    for an (8, 512) block), and lane rotates need 32-bit elements anyway.
    """
    col = lax.broadcasted_iota(jnp.int32, dev.shape, 1)
    flags = jnp.zeros(dev.shape, jnp.float32)  # 0.0 / 1.0
    base_threshold = (jnp.float32(n_sigma) * noise).astype(jnp.float32)  # (bb, 1)
    for w in range(n_windows):
        window = 1 << w
        if window > channels:
            break
        threshold = base_threshold * jnp.float32(falloff**-w)
        clamped = flags * threshold + (1.0 - flags) * dev
        # sums[k] = sum(clamped[k : k + window]); valid for k <= C - window
        sums = clamped
        for j in range(1, window):
            sums = sums + _roll(clamped, -j, 1, interpret)
        sf = ((sums > threshold * window) & (col <= channels - window)).astype(jnp.float32)
        acc = sf
        for j in range(1, window):
            # wrapped entries come from k > C - window, already masked 0
            acc = acc + _roll(sf, j, 1, interpret)
        flags = jnp.maximum(flags, jnp.minimum(acc, 1.0))
    return flags


def _flagger_kernel(vis_ref, flags_ref, members_ref, *, width: int, n_sigma: float,
                    n_windows: int, falloff: float, flag_value: int, channels: int,
                    interpret: bool = False):
    re = vis_ref[:, :, 0]
    im = vis_ref[:, :, 1]
    amp = jnp.sqrt(re * re + im * im)  # (bb, C)
    bb = amp.shape[0]

    # Window members as full-row lane rotations, stored to the VMEM
    # scratch; out-of-band lanes +inf.
    h = width // 2
    col = lax.broadcasted_iota(jnp.int32, (bb, channels), 1)
    n = jnp.zeros((bb, channels), jnp.int32)
    for d in range(-h, h + 1):
        rolled = _roll(amp, -d, 1, interpret)
        valid = (col + d >= 0) & (col + d < channels)
        members_ref[d + h] = jnp.where(valid, rolled, _INF)
        n = n + valid.astype(jnp.int32)

    med = _masked_median_rows(members_ref, n, width)
    dev = amp - med

    noise = _madnz_rows(jnp.abs(dev), channels)
    flags = _threshold_sum_rows(dev, noise, channels, n_sigma, n_windows, falloff, interpret)
    # flags are float32 0/1; scale and cast via int32 (Mosaic has no direct
    # f32→u8 cast, and i1 relayouts to 8-bit tiling are unsupported).
    flags_ref[:, :] = (flags * flag_value).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("width", "n_sigma", "n_windows", "falloff", "flag_value", "bb", "tile",
                     "interpret"),
)
def flag_transposed(vis_t, width: int = 13, n_sigma: float = 11.0, n_windows: int = 4,
                    falloff: float = 1.2, flag_value: int = 1, bb: int = 8,
                    tile: int = 0, interpret: bool = False):
    """Fused flagger on baseline-major planar visibilities.

    Parameters
    ----------
    vis_t
        (baselines, channels, 2) float32 split-complex visibilities.
    bb
        Baselines per grid step (VMEM budget knob; the tuning dimension).
    tile
        Unused (kept for tuning-table compatibility).

    Returns
    -------
    (baselines, channels) uint8 flags.
    """
    baselines, channels = vis_t.shape[0], vis_t.shape[1]
    if baselines % bb:
        raise ValueError(f"baselines ({baselines}) must divide by bb ({bb})")
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
    return pl.pallas_call(
        kernel,
        grid=(baselines // bb,),
        in_specs=[pl.BlockSpec((bb, channels, 2), lambda i: (i, 0, 0), memory_space=_VMEM)],
        out_specs=pl.BlockSpec((bb, channels), lambda i: (i, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((baselines, channels), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((width, bb, channels), jnp.float32) if pltpu is not None else None
        ],
        interpret=interpret,
        **kwargs,
    )(vis_t)
