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

Data layout — **band-folded 2-D, split-complex**.  ``vis_t`` is
(baselines, channels, 2) float32 (TPU backends have no complex dtype).
Inside the kernel each baseline's channel axis is folded row-major into an
``H × W`` band (W ≤ 1024 lanes), and a block of ``bb`` baselines forms a
plain 2-D ``(bb·H, W)`` array — the only shape class the Mosaic AOT
compiler digests reliably (3-D ops, multi-axis reductions, and ≥16k-lane
vectors all crash it; see CLAUDE.md).  The building blocks:

* a shift along the logical channel axis = lane rotation + a single
  sublane rotation selected on a lane-index mask
  (:func:`_shift_channels`).  Rows that cross a band boundary pull
  garbage only at positions whose global channel index is out of range,
  so every consumer masks on the channel iota — never on padding values;
* per-baseline reductions = per-row lane reductions followed by a
  **block-diagonal matmul** (``G @ x``, G built from iota in-kernel),
  which sums each band's rows and broadcasts the result back to every
  row in one MXU op; rank counts stay exact in f32 (≤ 2²⁴);
* per-baseline max (for the median halfway correction) = masked
  suffix-max over rows by log-step sublane rotations, then a first-row
  pick broadcast through G.

Algorithms (identical semantics to the host oracle / jnp path):

* background median: compare-count selection over the ``width`` window
  members held in a VMEM scratch, absent members +inf with a positional
  valid count (background_median_filter.mako:96-145 semantics);
  ``fori_loop`` rank loops keep the IR compact;
* MAD noise: the reference's bitwise IEEE-754 binary search
  (rank.mako:186-231, madnz_t.mako:72-87), NaN-masking the fold padding;
* SumThreshold: full-window shifted sums + dilation with **float32 0/1
  flag state** (host.py ThresholdSumHost semantics; cf.
  threshold_sum.mako:49-132).

Mosaic notes baked in: loop-carried i1 vectors allocate pathological
scoped VMEM (flags are f32 0/1); lane rotates need 32-bit elements and
non-negative shifts; f32→u8 casts go via i32.
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

from ...ops import rank as _rank_ops
from ...utils import tune as _tune
from . import MAD_NORMAL

_INF = np.float32(np.inf)  # python scalars: kernel literals, not captured consts
_NAN = np.float32(np.nan)


def _fold_setup(channels: int, bb: int, fold: int, baselines: int, nref: int = 1):
    """Shared band-fold derivation and tiling validation.

    The one place the fold/tiling rules live (flag_transposed,
    madnz_threshold, and flag_transposed_dma all fold identically; a rule
    change must not let the engines drift).  Returns (fold, hh, padded_c).
    """
    if baselines % (bb * nref):
        raise ValueError(f"baselines ({baselines}) must divide by bb*nref ({bb}*{nref})")
    fold = min(fold, max(128, -(-channels // 128) * 128)) if channels > 128 else channels
    hh = -(-channels // fold)
    if (bb * hh) % 8 and bb != baselines:
        raise ValueError(
            f"block rows bb*H = {bb}*{hh} must be a multiple of 8 (TPU sublane "
            f"tiling) — raise bb or lower fold"
        )
    return fold, hh, hh * fold


def _vis_dims(vis_t, layout: str):
    """(baselines, channels) of a planar visibility array in `layout`.

    ``"trailing"``: (baselines, channels, 2) — the planar image of
    interleaved complex64 (the reference's buffer layout).
    ``"leading"``: (2, baselines, channels) — the kernel-native layout;
    band-folding it is a FREE reshape (row-major contiguity), so no
    corner-turn copy precedes the kernel.
    """
    if layout == "trailing":
        if vis_t.ndim != 3 or vis_t.shape[-1] != 2:
            raise ValueError(
                f"layout='trailing' expects (baselines, channels, 2), got {vis_t.shape}"
            )
        return vis_t.shape[0], vis_t.shape[1]
    if layout == "leading":
        if vis_t.ndim != 3 or vis_t.shape[0] != 2:
            raise ValueError(
                f"layout='leading' expects (2, baselines, channels), got {vis_t.shape}"
            )
        return vis_t.shape[1], vis_t.shape[2]
    raise ValueError("layout must be 'trailing' or 'leading'")


def _fold_vis(vis_t, layout: str, baselines: int, hh: int, fold: int, padded_c: int,
              channels: int):
    """Band-fold planar visibilities to the kernel's (2, B*hh, fold).

    The trailing layout pays one transposition copy (XLA fuses it into
    the operand copy — measured +1.6 ms on a 2016×32k dump); the leading
    layout is a pure reshape.
    """
    if layout == "trailing":
        if padded_c != channels:
            vis_t = jnp.pad(vis_t, ((0, 0), (0, padded_c - channels), (0, 0)))
        return jnp.moveaxis(vis_t.reshape(baselines * hh, fold, 2), -1, 0)
    if padded_c != channels:
        vis_t = jnp.pad(vis_t, ((0, 0), (0, 0), (0, padded_c - channels)))
    return vis_t.reshape(2, baselines * hh, fold)


def _fold_amp(vis_t, layout: str, baselines: int, hh: int, fold: int, padded_c: int,
              channels: int):
    """``ingest="amp"`` preamble: XLA amplitude + free band-fold reshape.

    Streams 4 B/vis into the kernel instead of the 8 B planar pair; the
    fold is a pure reshape in either layout (no corner turn).  Padding
    columns never enter valid window members (the kernel's column masks),
    so zero-fill is safe.  Shared by ``flag_transposed``,
    ``flag_transposed_dma``, and the skeleton A/B harness so the
    engines cannot drift.
    """
    if layout == "trailing":
        re, im = vis_t[..., 0], vis_t[..., 1]
    else:
        re, im = vis_t[0], vis_t[1]
    amp2d = jnp.sqrt(re * re + im * im)  # (B, C)
    if padded_c != channels:
        amp2d = jnp.pad(amp2d, ((0, 0), (0, padded_c - channels)))
    return amp2d.reshape(baselines * hh, fold)


def _roll(x, shift: int, axis: int, interpret: bool):
    """Static roll: pltpu.roll on hardware, jnp.roll in interpret mode."""
    if shift % x.shape[axis] == 0:
        return x
    if interpret or pltpu is None:
        return jnp.roll(x, shift, axis)
    # pltpu.roll requires a non-negative shift; rolling by -j == rolling
    # forward by size - j.
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _shift_channels(x, d: int, interpret: bool, lane=None, h: int = 0):
    """out[r, w] = x at logical channel position (r, w+d) in band-folded rows.

    `x` is (R, W) where each consecutive group of H rows is one baseline's
    channel axis folded row-major.  Positions whose source crosses a band
    boundary out of the valid channel range carry garbage and MUST be
    masked by the caller on the global channel iota (all callers do).
    `lane` lets callers pass a precomputed lane iota (hoisted out of hot
    shift chains).

    ``h=1`` (the whole channel axis on one row, e.g. the fold=32768
    headline layout) collapses the shift to ONE lane roll: the cross-band
    correction moves values between ROWS, but with one band per row every
    row-crossing source is an out-of-range channel the caller masks
    anyway, so the sublane roll and the lane-mask select vanish —
    3 vector ops → 1.  This is the single biggest win of the wide-fold
    layout (round 5): 12 median members + 12 threshold ladder/dilation
    shifts each drop 2 full-block ops, and every rank round's band
    matmul disappears (see ``_band_matrix``).
    """
    if d == 0:
        return x
    w = x.shape[-1]
    if abs(d) >= w:
        raise ValueError("shift exceeds fold width")
    rl = _roll(x, -d, 1, interpret)
    if h == 1:
        return rl
    if lane is None:
        lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if d > 0:
        rs = _roll(rl, -1, 0, interpret)  # lanes >= W-d spill into the next row
        return jnp.where(lane < w - d, rl, rs)
    rs = _roll(rl, 1, 0, interpret)  # lanes < -d come from the previous row
    return jnp.where(lane >= -d, rl, rs)


def _band_matrix(rows: int, h: int):
    """G[i, j] = 1.0 where rows i and j belong to the same band (baseline).

    Built from iota inside the kernel (a captured constant would be
    rejected by pallas_call).  ``G @ x`` both sums each band's rows and
    broadcasts the total back to every row of the band.

    ``h == 1`` makes G the identity: callers pass ``g=None`` instead and
    :func:`_band_sum` / :func:`_band_max` become passthroughs — the 32
    per-rank-round MXU matmuls leave the serial
    reduce→matmul→select dependency chain entirely.
    """
    if h == 1:
        return None
    ri = lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // h
    rj = lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // h
    return (ri == rj).astype(jnp.float32)


def _band_sum(g, x_rows):
    """Per-band total of per-row values (R, 1), broadcast back to rows."""
    if g is None:  # one band per row (h == 1)
        return x_rows
    return jnp.dot(g, x_rows, preferred_element_type=jnp.float32)


def _band_max(m_rows, h: int, interpret: bool, g=None):
    """Per-band max of per-row values (R, 1), broadcast back to rows.

    Masked suffix-max by log-step sublane rotations, then the band's
    first row (which holds the full-band max) is broadcast through G
    (sum-broadcast works: one non-zero contribution per band).
    """
    if h == 1:
        return m_rows
    rows = m_rows.shape[0]
    r_iota = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    h_pos = r_iota % h
    m = m_rows
    step = 1
    while step < h:
        cand = _roll(m, -step, 0, interpret)
        valid = h_pos + step < h
        m = jnp.maximum(m, jnp.where(valid, cand, -_INF))
        step *= 2
    first = jnp.where(h_pos == 0, m, 0.0)
    if g is None:
        g = _band_matrix(rows, h)
    return _band_sum(g, first)




def _masked_median_rows(members, n, width: int):
    """Masked median over the `width` window members via a sorting network.

    ``members`` is a list of (R, W) window member values (+inf = absent);
    `n` the (R, W) valid count.  After the network sorts each element's
    window ascending (absent members at the top), the two middle valid
    entries sit at ranks ``(n-1)//2`` and ``n//2`` and are gathered by
    rank-indexed selects (averaged — the reference's even-count
    semantics).  All straight-line vector min/max — no loops, no dynamic
    indexing (a ``fori`` over VMEM scratch serializes on Mosaic).

    A selected position is +inf only when ``n == 0`` (rank k is chosen
    only if k < n, so the k-th smallest is a valid member) — and n == 0
    requires the window *centre* to be flagged, in which case the caller
    forces the deviation to 0 and the (infinite) median never leaks.  So
    no inf-masking of the selected values is needed.
    """
    arrs = list(members)
    # The selection below only reads sorted positions 0..width//2 (the
    # valid count n never exceeds width, so n//2 ≤ width//2): run the
    # network pruned to that lower half (78 ops vs 96 at width 13).
    _rank_ops.apply_selection_network(
        arrs, _rank_ops.selection_network(width, range(width // 2 + 1)))
    lo_rank = (n - 1) // 2
    hi_rank = n // 2
    v_lo = jnp.zeros(n.shape, jnp.float32)
    v_hi = jnp.zeros(n.shape, jnp.float32)
    for k in range(width // 2 + 1):
        v_lo = v_lo + jnp.where(lo_rank == k, arrs[k], 0.0)
        v_hi = v_hi + jnp.where(hi_rank == k, arrs[k], 0.0)
    return (v_lo + v_hi) * jnp.float32(0.5)


def _median_parity_fill(amp, col, width: int, channels: int, interpret: bool,
                        h: int = 0):
    """Windowed masked median, edge truncation via ±inf parity fills.

    The fast path for the no-input-flags pipeline (the headline
    configuration): members are absent only at the channel edges, where
    the window truncates.  Filling the ``k`` absent members of a window
    with ``ceil(k/2)`` copies of −inf and ``floor(k/2)`` of +inf pins the
    truncated-window median at **fixed sorted ranks** ``width//2`` and
    ``width//2 + 1`` of the combined array: with ``a = ceil(k/2)`` fills
    below and the rest above, valid rank ``r`` sits at combined rank
    ``a + r``, and ``a + (n-1)//2 == width//2`` identically (n = width−k).
    The per-element rank-indexed selection loop and the valid-count pass
    of :func:`_masked_median_rows` disappear; the network is pruned to
    the two middle outputs.  Exactness vs the general path is
    element-selection equality, so results are bit-identical
    (tests/rfi/test_pallas_flagger.py covers both paths against the host
    oracle).

    The alternating fill is assigned by parity: an absent member at
    signed offset ``d`` is −inf iff its out-of-range distance is odd,
    which reduces to the parity of ``col + d`` (left edge) or
    ``col + d − (channels−1)`` (right edge).  Since the fold width is a
    multiple of 128 (or covers all channels), ``parity(col) ==
    parity(lane)`` and only two static lane patterns exist; each member
    picks one at trace time.  Requires ``channels >= width`` (otherwise
    the two edges overlap and the ±inf counts interfere) and odd
    ``width`` — callers fall back to the general path.
    """
    half = width // 2
    lane = None if h == 1 else lax.broadcasted_iota(jnp.int32, amp.shape, 1)
    p0 = jnp.where((col & 1) == 1, -_INF, _INF)  # −inf iff col odd
    p1 = -p0  # −inf iff col even
    members = []
    for d in range(-half, half + 1):
        if d == 0:
            members.append(amp)
            continue
        shifted = _shift_channels(amp, d, interpret, lane, h)
        if d < 0:
            valid = col >= -d
            q = (-d) & 1
        else:
            valid = col < channels - d
            q = (d + channels - 1) & 1
        members.append(jnp.where(valid, shifted, p1 if q else p0))
    arrs = list(members)
    _rank_ops.apply_selection_network(
        arrs, _rank_ops.selection_network(width, (half, half + 1)))
    c_lo, c_hi = arrs[half], arrs[half + 1]
    # n odd ⟺ k = (# absent) even; the edges never overlap (channels ≥ width)
    k = jnp.maximum(half - col, 0) + jnp.maximum(col - (channels - 1 - half), 0)
    n_odd = (k & 1) == 0
    return jnp.where(n_odd, c_lo, (c_lo + c_hi) * jnp.float32(0.5))


def _madnz_band(absdev, g, h: int, channels: int, interpret: bool,
                rank_radix: int = 1, rank_pair=False, zeros_fold: bool = False):
    """MAD of non-zero |deviations| per band of (R, W); result per row (R, 1).

    NaN entries (fold padding) are absent: they count in neither the rank
    nor the zero count, matching the reference's NaN padding
    (madnz_t.mako:50, rank.mako:47-58).  Counts are exact in f32.

    ``rank_radix`` resolves that many bits per round (the in-kernel
    analogue of ``ops.rank.find_rank_float(radix_bits=...)``): each round
    computes the integer digit ``rel = (bits - cur) >> shift`` ONCE and
    counts against the ``2**radix - 1`` candidates from it — fewer rank
    rounds (loop iterations, band matmuls) at more compares per round.

    ``rank_pair`` resolves bits in SPECULATIVE PAIRS: one loop step counts
    all three candidates of two consecutive bits (cur|hi, cur|lo,
    cur|hi|lo) — the three compare/count chains are mutually independent,
    so the reduce→matmul→select dependency path is 16 stages instead of
    31 (a latency, not throughput, optimization; the two same-step row
    counts ride ONE i32 reduce, packed 16+16).  ``rank_pair="f32"`` packs
    the hi/both per-row counts as a scaled f32 sum instead (hi +
    4096·both — exact: per-row counts ≤ W < 4096 and the pack < 2²⁴),
    replacing the i32 reduce + field ops with one f32 fma + reduce.

    ``zeros_fold`` merges the zeros-count sweep into the first rank round
    (bit 30's candidate is independent of ``target``): one packed f32
    indicator pass instead of two separate count sweeps — a strict data-
    pass reduction (32 → 31 sweeps).
    """
    if rank_radix not in (1, 2, 3, 4):
        # 2**radix - 1 candidate counts per round: beyond 4 bits the
        # unrolled count chain explodes (radix 8 = 255 counts/round wedged
        # the remote AOT compiler for >30 min).
        raise ValueError("rank_radix must be 1..4")
    if rank_pair and rank_radix != 1:
        raise ValueError("rank_pair applies to the binary (radix 1) search")
    if rank_pair and absdev.shape[1] >= 1 << 15:
        # count_pair packs two per-row counts as c_hi + (c_both << 16) in
        # one SIGNED int32: c_both can equal the lane width W, so W >=
        # 32768 pushes the high field to 2^31 and wraps negative (wrong
        # counts, inexact medians) well before the low field saturates.
        raise ValueError(
            f"rank_pair requires lane width < 32768, got {absdev.shape[1]}"
        )
    # f32 packing scale: per-row counts ≤ W ≤ 1024 < 4096, and the packed
    # value < 4096·1024 + 1024 < 2²⁴, so both fields are exact in f32.
    _SCALE = jnp.float32(4096.0)
    if (rank_pair == "f32" or zeros_fold) and absdev.shape[1] >= 4096:
        raise ValueError(
            f"f32 count packing requires lane width < 4096, got {absdev.shape[1]}"
        )

    def _unpack_rows(prow):
        """(lo + 4096·hi) per-row pack → (lo, hi), both (R, 1) f32."""
        hi = jnp.floor(prow * (1.0 / 4096.0))
        return prow - _SCALE * hi, hi

    if zeros_fold:
        if rank_pair or rank_radix != 1:
            raise ValueError("zeros_fold applies to the plain binary search")
        # Bit 30's candidate does not depend on `target`, so its count
        # shares one packed indicator pass with the zeros count.  The
        # candidate is a compile-time constant; compute the bit pattern in
        # numpy (scalar tpu.bitcast is rejected by Mosaic).
        cand30 = jnp.float32(np.int32(1 << 30).view(np.float32))
        ind = ((absdev == 0).astype(jnp.float32)
               + _SCALE * (absdev < cand30).astype(jnp.float32))
        zer_rows, c30_rows = _unpack_rows(jnp.sum(ind, axis=1, keepdims=True))
        zeros = _band_sum(g, zer_rows)
        c30 = _band_sum(g, c30_rows)
    else:
        zeros = _band_sum(g, jnp.sum((absdev == 0).astype(jnp.float32), axis=1, keepdims=True))
    rank2 = jnp.float32(channels) + zeros
    target = jnp.floor(rank2 * 0.5)
    halfway = rank2 - 2.0 * target == 0

    def count_less(cand_rows):
        c = jnp.sum((absdev < cand_rows).astype(jnp.float32), axis=1, keepdims=True)
        return _band_sum(g, c)

    # The loops carry (cur, count_less(cur)) so the halfway correction's
    # final rank needs no extra full-block count sweep: count_less(0) = 0
    # (absdev >= 0; NaN compares false), and each accepted step's count was
    # just computed.
    if rank_pair:
        # 15 pairs (bits 30..1) + a final single round (bit 0).  Per pair,
        # the hi/combined indicator row-counts share one packed i32 lane
        # reduce (per-row counts <= W = 1024 < 2^16 per field; band totals
        # <= 32k < 2^16 after the f32 matmuls on the unpacked halves).
        if rank_pair == "f32":
            # Same shared-reduce idea in pure f32: one fma + one f32 lane
            # reduce instead of the i32 reduce + field masks/shifts/casts.
            def count_pair(t_hi, t_both):
                ind = ((absdev < lax.bitcast_convert_type(t_hi, jnp.float32))
                       .astype(jnp.float32)
                       + _SCALE * (absdev < lax.bitcast_convert_type(t_both, jnp.float32))
                       .astype(jnp.float32))
                hi_rows, both_rows = _unpack_rows(jnp.sum(ind, axis=1, keepdims=True))
                return _band_sum(g, hi_rows), _band_sum(g, both_rows)
        else:
            def count_pair(t_hi, t_both):
                ind = (absdev < lax.bitcast_convert_type(t_hi, jnp.float32)).astype(jnp.int32)
                ind = ind + ((absdev < lax.bitcast_convert_type(t_both, jnp.float32))
                             .astype(jnp.int32) << 16)
                packed = jnp.sum(ind, axis=1, keepdims=True)
                c_hi = _band_sum(g, (packed & 0xFFFF).astype(jnp.float32))
                c_both = _band_sum(g, (packed >> 16).astype(jnp.float32))
                return c_hi, c_both

        def pair_body(i, carry):
            cur, r_cur = carry
            hi_bit = jnp.int32(1) << (30 - 2 * i)
            lo_bit = jnp.int32(1) << (29 - 2 * i)
            t_hi = cur | hi_bit
            t_lo = cur | lo_bit
            t_both = cur | hi_bit | lo_bit
            c_hi, c_both = count_pair(t_hi, t_both)
            c_lo = count_less(lax.bitcast_convert_type(t_lo, jnp.float32))
            take_hi = c_hi <= target
            # lo decision tests against the hi-resolved prefix
            c_lo_eff = jnp.where(take_hi, c_both, c_lo)
            take_lo = c_lo_eff <= target
            cur = jnp.where(take_hi, t_hi, cur)
            cur = jnp.where(take_lo, cur | lo_bit, cur)
            r_cur = jnp.where(take_hi, c_hi, r_cur)
            r_cur = jnp.where(take_lo, c_lo_eff, r_cur)
            return cur, r_cur

        cur, r = lax.fori_loop(
            0, 15, pair_body,
            (jnp.zeros(target.shape, jnp.int32), jnp.zeros(target.shape, jnp.float32)),
        )
        # final bit 0
        c0 = count_less(lax.bitcast_convert_type(cur | 1, jnp.float32))
        take0 = c0 <= target
        cur = jnp.where(take0, cur | 1, cur)
        r = jnp.where(take0, c0, r)
    elif rank_radix == 1:
        def body(i, carry):
            cur, r_cur = carry
            test = cur | (jnp.int32(1) << (30 - i))
            cand = lax.bitcast_convert_type(test, jnp.float32)
            r = count_less(cand)
            take = r <= target
            return jnp.where(take, test, cur), jnp.where(take, r, r_cur)

        if zeros_fold:
            # round 0 (bit 30) was resolved in the packed zeros pass
            take30 = c30 <= target
            init = (
                jnp.where(take30, jnp.int32(1) << 30, 0),
                jnp.where(take30, c30, jnp.zeros(target.shape, jnp.float32)),
            )
            cur, r = lax.fori_loop(1, 31, body, init)
        else:
            cur, r = lax.fori_loop(
                0, 31, body,
                (jnp.zeros(target.shape, jnp.int32), jnp.zeros(target.shape, jnp.float32)),
            )
    else:
        # Positive floats (and NaN, whose pattern exceeds any finite
        # positive) order as int32 (cf. ops/rank.py round_ invariant).
        bits = lax.bitcast_convert_type(absdev, jnp.int32)
        targ_f = target  # float32 counts are exact (< 2^24 elements/band)

        def round_(cur, r_cur, shift: int, width: int):
            rel = (bits - cur) >> shift  # (R, W) — one read feeds all candidates
            digit = jnp.zeros(target.shape, jnp.float32)
            for j in range(1, (1 << width)):
                c = _band_sum(
                    g,
                    jnp.sum((rel < j).astype(jnp.float32), axis=1, keepdims=True),
                )
                take = c <= targ_f
                digit = digit + take.astype(jnp.float32)
                # digit >= j exactly when candidate j was admissible, and the
                # chosen digit's count is the last admissible candidate's.
                r_cur = jnp.where(take, c, r_cur)
            return cur | (digit.astype(jnp.int32) << shift), r_cur

        cur = jnp.zeros(target.shape, jnp.int32)
        r = jnp.zeros(target.shape, jnp.float32)
        pos = 31
        while pos > 0:
            width = pos % rank_radix or rank_radix
            pos -= width
            cur, r = round_(cur, r, pos, width)
    result = lax.bitcast_convert_type(cur, jnp.float32)
    below = jnp.max(jnp.where(absdev < result, absdev, 0.0), axis=1, keepdims=True)
    prev = _band_max(below, h, interpret, g)
    med = jnp.where(halfway & (r == target), (result + prev) * 0.5, result)
    return jnp.float32(MAD_NORMAL) * med  # (R, 1)


def _threshold_sum_band(dev, noise_rows, col, channels: int, n_sigma, n_windows: int,
                        falloff, interpret: bool = False, h: int = 0):
    """SumThreshold along folded channels of (R, W); float32 0/1 flags.

    `col` is the global-channel iota; `dev` must be 0 on fold padding;
    `noise_rows` is the per-row (band-broadcast) noise estimate.
    """
    flags = None  # materialized lazily: window 1 needs no clamp/dilation
    lane = None if h == 1 else lax.broadcasted_iota(jnp.int32, dev.shape, 1)
    base_threshold = (jnp.float32(n_sigma) * noise_rows).astype(jnp.float32)  # (R, 1)
    for w in range(n_windows):
        window = 1 << w
        if window > channels:
            break
        threshold = base_threshold * jnp.float32(falloff**-w)
        if flags is None:
            clamped = dev  # first window: flags are identically zero
        else:
            clamped = jnp.where(flags > 0.5, threshold, dev)
        # sums[c] = sum(clamped[c : c + window]); valid for c <= C - window.
        # Kogge-Stone doubling: log2(window) shifted adds.  Positions
        # c > C - window accumulate band-crossing garbage (finite) and are
        # masked out of sf; positions c <= C - window touch only in-band
        # values at every doubling step, so the result there is exact.
        sums = clamped
        done = 1
        while done < window:
            sums = sums + _shift_channels(sums, done, interpret, lane, h)
            done *= 2
        if window == 1:
            # col <= channels - 1 is tautological in-band, and fold-padding
            # columns compare 0 > threshold ≥ 0 = false on their own.
            sf = (sums > threshold).astype(jnp.float32)
            flags = sf
            continue
        sf = ((sums > threshold * window) & (col <= channels - window)).astype(jnp.float32)
        # Dilation acc[c] = max(sf[c-window+1 : c+1]): Kogge-Stone on max.
        # Cross-band pulls need no mask: after step s the pull at distance
        # 2^s reaches back at most 2^(s+1) - 1 ≤ window - 1 positions into
        # the previous band's tail, which sf zeroes via the
        # col <= channels - window mask above (window - 1 positions) —
        # every cross-band contribution is provably 0.
        acc = sf
        done = 1
        while done < window:
            acc = jnp.maximum(acc, _shift_channels(acc, -done, interpret, lane, h))
            done *= 2
        flags = jnp.maximum(flags, acc)
    return jnp.zeros(dev.shape, jnp.float32) if flags is None else flags


def _flagger_kernel(vis_ref, *refs, width: int, n_sigma: float,
                    n_windows: int, falloff: float, flag_value: int, channels: int,
                    h: int, flags_mode: str = "none", interpret: bool = False,
                    rank_radix: int = 1, ingest: str = "planar"):
    use_flags = flags_mode != "none"
    if use_flags:
        in_flags_ref, flags_ref = refs
    else:
        in_flags_ref = None
        (flags_ref,) = refs
    _flagger_body(vis_ref, in_flags_ref, flags_ref, width=width, n_sigma=n_sigma,
                  n_windows=n_windows, falloff=falloff, flag_value=flag_value,
                  channels=channels, h=h, flags_mode=flags_mode, interpret=interpret,
                  rank_radix=rank_radix, ingest=ingest)


def _flagger_kernel_multi(*refs, nref: int, width: int, n_sigma: float,
                          n_windows: int, falloff: float, flag_value: int, channels: int,
                          h: int, flags_mode: str = "none", interpret: bool = False,
                          rank_radix: int = 1, ingest: str = "planar"):
    """`nref` independent baseline blocks per grid step (static inner loop).

    Each sub-block arrives through its own input/output ref (separate
    BlockSpecs with stride-`nref` index maps): block *shapes* stay small
    enough for the Mosaic AOT service (which rejects ≥64-sublane-row
    blocks) while the grid shrinks by `nref` — amortizing this
    environment's per-grid-step dispatch overhead (BASELINE_RESULTS.md:
    ~59 µs/step through the tunnel).  CHANNEL-mode flags share one ref.
    """
    vis_refs = refs[:nref]
    pos = nref
    if flags_mode == "full":
        in_flag_refs = refs[pos : pos + nref]
        pos += nref
    elif flags_mode == "channel":
        in_flag_refs = [refs[pos]] * nref
        pos += 1
    else:
        in_flag_refs = [None] * nref
    out_refs = refs[pos:]
    for k in range(nref):
        _flagger_body(vis_refs[k], in_flag_refs[k], out_refs[k], width=width,
                      n_sigma=n_sigma, n_windows=n_windows, falloff=falloff,
                      flag_value=flag_value, channels=channels, h=h,
                      flags_mode=flags_mode, interpret=interpret,
                      rank_radix=rank_radix, ingest=ingest)


def _flagger_body(vis_ref, in_flags_ref, flags_ref, *, width: int, n_sigma: float,
                  n_windows: int, falloff: float, flag_value: int, channels: int,
                  h: int, flags_mode: str, interpret: bool, rank_radix: int = 1,
                  ingest: str = "planar"):
    use_flags = flags_mode != "none"
    if ingest == "amp":
        # Amplitude precomputed upstream (XLA): the kernel streams 4 B/vis
        # instead of the 8 B/vis planar pair, and the band fold of a
        # baseline-major (B, C) amplitude is a FREE reshape — no planar
        # corner turn exists at all.  Bit-identical: the XLA engine's
        # sqrt(re²+im²) already matches this kernel's on-chip (bench
        # cross-engine parity).
        amp = vis_ref[...]
    else:
        # Planar-LEADING block (2, R, W): re/im each load as a full (R, W)
        # lane-aligned tile.  (A trailing (R, W, 2) block would make the
        # size-2 re/im axis the LANE dimension — 2/128 lane occupancy and a
        # Mosaic-rejected lane slice on the DMA path.)
        re = vis_ref[0]
        im = vis_ref[1]
        amp = jnp.sqrt(re * re + im * im)  # (R, W)
    rows, ww = amp.shape
    if h == 1:  # one band per row: the channel index IS the lane index
        col = lax.broadcasted_iota(jnp.int32, amp.shape, 1)
    else:
        col = (
            (lax.broadcasted_iota(jnp.int32, amp.shape, 0) % h) * ww
            + lax.broadcasted_iota(jnp.int32, amp.shape, 1)
        )
    g = _band_matrix(rows, h)

    if flags_mode == "full":
        # Flagged samples become +inf: the shift machinery then carries
        # their absence into every window automatically (the reference's
        # -1 sentinel, background_median_filter.mako:160-162, inverted to
        # +inf so the sorting network pushes them past valid members).
        amp = jnp.where(in_flags_ref[...].astype(jnp.int32) > 0, _INF, amp)
    elif flags_mode == "channel":
        # Per-channel flags arrive as ONE folded (H, W) block (the
        # reference's CHANNEL mode, rfi/device.py:40-46) and are expanded
        # to every band in-kernel by a replication matmul (B[r, j] =
        # [r % H == j]) — no (baselines × channels) broadcast ever exists
        # in HBM.  Concat/reshape replication would hit Mosaic's aligned-
        # concat limits at small H; the MXU op is shape-safe and free.
        cf = (in_flags_ref[...].astype(jnp.int32) > 0).astype(jnp.float32)  # (H, W)
        ri = lax.broadcasted_iota(jnp.int32, (rows, h), 0) % h
        rj = lax.broadcasted_iota(jnp.int32, (rows, h), 1)
        rep = (ri == rj).astype(jnp.float32)
        flagged = jnp.dot(rep, cf, preferred_element_type=jnp.float32)  # (R, W)
        amp = jnp.where(flagged > 0.5, _INF, amp)

    half = width // 2
    if not use_flags and width % 2 == 1 and channels >= width:
        # Fast path: members absent only at channel edges → ±inf parity
        # fills pin the median at fixed sorted ranks (no valid-count pass,
        # no rank-indexed selection); bit-identical to the general path.
        med = _median_parity_fill(amp, col, width, channels, interpret, h)
        dev = amp - med  # amp is finite (no prior flags); NaN only on fold padding
    else:
        # Window members via folded-channel shifts, absent members +inf.
        members = []
        for d in range(-half, half + 1):
            shifted = _shift_channels(amp, d, interpret, h=h)
            valid = (col + d >= 0) & (col + d < channels)
            members.append(jnp.where(valid, shifted, _INF))
        if use_flags:
            n = jnp.zeros(amp.shape, jnp.int32)
            for m in members:
                n = n + (m != _INF).astype(jnp.int32)
        else:
            n = jnp.zeros(amp.shape, jnp.int32)
            for d in range(-half, half + 1):
                n = n + ((col + d >= 0) & (col + d < channels)).astype(jnp.int32)

        med = _masked_median_rows(members, n, width)
        # Flagged centres (amp == inf) map to deviation 0 (host semantics:
        # NaN deviations fill to 0, host.py BackgroundMedianFilterHost).
        dev = jnp.where(amp == _INF, 0.0, amp - med)  # garbage on fold padding; masked below

    if h * ww == channels:
        # Exact fold (the headline 32768 = 32×1024): no padding columns
        # exist, so the in-band masks are tautologies — skip them.
        absdev = jnp.abs(dev)
        dev0 = dev
    else:
        in_band = col < channels
        absdev = jnp.where(in_band, jnp.abs(dev), _NAN)
        dev0 = jnp.where(in_band, dev, 0.0)
    noise_rows = _madnz_band(absdev, g, h, channels, interpret, rank_radix)
    flags = _threshold_sum_band(dev0, noise_rows, col, channels, n_sigma, n_windows,
                                falloff, interpret, h)
    # flags are float32 0/1; scale and cast via int32 (Mosaic has no direct
    # f32→u8 cast, and i1 relayouts to 8-bit tiling are unsupported).
    if flag_value != 1:
        flags = flags * flag_value
    flags_ref[:, :] = flags.astype(jnp.int32).astype(jnp.uint8)


def _madnz_threshold_kernel(*refs, nref: int, n_sigma: float, n_windows: int,
                            falloff: float, flag_value: int, channels: int, h: int,
                            interpret: bool, rank_radix: int = 1):
    """MAD noise + SumThreshold on band-folded deviations (hybrid engine).

    The back half of :func:`_flagger_body`: deviations arrive from HBM
    (computed by the XLA background filter), are read ONCE into VMEM, and
    all 31 rank rounds plus the window ladders run VMEM-resident — versus
    the pure-XLA path where every rank round re-reads the deviations from
    HBM (31 x 4 B/vis of traffic, the measured dominant cost of the XLA
    engine at MeerKAT scale).
    """
    dev_refs = refs[:nref]
    out_refs = refs[nref:]
    for k in range(nref):
        _madnz_threshold_block(dev_refs[k], out_refs[k], n_sigma=n_sigma,
                               n_windows=n_windows, falloff=falloff,
                               flag_value=flag_value, channels=channels, h=h,
                               interpret=interpret, rank_radix=rank_radix)


def _madnz_threshold_block(dev_ref, out_ref, *, n_sigma, n_windows, falloff,
                           flag_value, channels, h, interpret, rank_radix: int = 1):
    dev = dev_ref[...]
    rows, ww = dev.shape
    if h == 1:  # one band per row: the channel index IS the lane index
        col = lax.broadcasted_iota(jnp.int32, dev.shape, 1)
    else:
        col = (
            (lax.broadcasted_iota(jnp.int32, dev.shape, 0) % h) * ww
            + lax.broadcasted_iota(jnp.int32, dev.shape, 1)
        )
    g = _band_matrix(rows, h)
    if h * ww == channels:  # exact fold: no padding columns exist
        absdev = jnp.abs(dev)
        dev0 = dev
    else:
        in_band = col < channels
        absdev = jnp.where(in_band, jnp.abs(dev), _NAN)
        dev0 = jnp.where(in_band, dev, 0.0)
    noise_rows = _madnz_band(absdev, g, h, channels, interpret, rank_radix)
    flags = _threshold_sum_band(dev0, noise_rows, col, channels, n_sigma, n_windows,
                                falloff, interpret, h)
    if flag_value != 1:
        flags = flags * flag_value
    out_ref[:, :] = flags.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("n_sigma", "n_windows", "falloff", "flag_value", "bb", "fold",
                     "interpret", "nref", "pipeline", "rank_radix"),
)
def madnz_threshold(dev_t, n_sigma: float = 11.0, n_windows: int = 4, falloff: float = 1.2,
                    flag_value: int = 1, bb: int = 4, fold: int = 1024,
                    interpret: bool = False, nref: int = 1, pipeline: str = "grid",
                    rank_radix: int = 1):
    """Fused MAD-noise + SumThreshold Pallas op on (baselines, channels)
    float32 deviations; returns (baselines, channels) uint8 flags.

    Semantics identical to ``device.madnz`` + ``device.threshold_sum``
    composed (reference madnz_t.mako:72-87 + threshold_sum.mako:49-132);
    fold/bb/nref as in :func:`flag_transposed`.  ``pipeline="dma"`` runs
    the block loop inside ONE kernel invocation with double-buffered
    manual DMA (see :func:`_dma_block_loop`) — one grid step total
    instead of one per ``bb * nref`` baselines.
    """
    baselines, channels = dev_t.shape[0], dev_t.shape[1]
    fold, hh, padded_c = _fold_setup(channels, bb, fold, baselines, nref)
    if padded_c != channels:
        dev_t = jnp.pad(dev_t, ((0, 0), (0, padded_c - channels)))
    folded = dev_t.reshape(baselines * hh, fold)
    block_rows = bb * hh

    if pipeline == "dma":
        if pltpu is None:
            raise RuntimeError("pipeline='dma' needs jax.experimental.pallas.tpu")
        per_block = functools.partial(
            _madnz_threshold_block, n_sigma=n_sigma, n_windows=n_windows,
            falloff=falloff, flag_value=flag_value, channels=channels, h=hh,
            interpret=interpret, rank_radix=rank_radix,
        )

        def kernel(dev_hbm, out_hbm):
            _dma_block_loop(
                [(lambda idx: dev_hbm.at[pl.ds(idx * block_rows, block_rows)],
                  (block_rows, fold), jnp.float32)],
                [(lambda idx: out_hbm.at[pl.ds(idx * block_rows, block_rows)],
                  (block_rows, fold), jnp.uint8)],
                per_block,
                n_blocks=baselines // bb,
            )

        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((baselines * hh, fold), jnp.uint8),
            interpret=interpret,
            **kwargs,
        )(folded)
        return out.reshape(baselines, padded_c)[:, :channels]

    grid_steps = baselines // (bb * nref)
    kernel = functools.partial(
        _madnz_threshold_kernel, nref=nref, n_sigma=n_sigma, n_windows=n_windows,
        falloff=falloff, flag_value=flag_value, channels=channels, h=hh,
        interpret=interpret, rank_radix=rank_radix,
    )
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel,
        grid=(grid_steps,),
        in_specs=[
            pl.BlockSpec((block_rows, fold), (lambda i, k=k: (i * nref + k, 0)),
                         memory_space=_VMEM)
            for k in range(nref)
        ],
        out_specs=[
            pl.BlockSpec((block_rows, fold), lambda i: (i, 0), memory_space=_VMEM)
            for _ in range(nref)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid_steps * block_rows, fold), jnp.uint8)
            for _ in range(nref)
        ],
        interpret=interpret,
        **kwargs,
    )(*([folded] * nref))
    if nref == 1:
        out = outs[0]
    else:
        stacked = jnp.stack(outs).reshape(nref, grid_steps, block_rows, fold)
        out = jnp.moveaxis(stacked, 0, 1).reshape(baselines * hh, fold)
    return out.reshape(baselines, padded_c)[:, :channels]


class FusedFlaggerTemplate:
    """Template wrapper for :func:`flag_transposed` with the Template/tuning
    convention (reference: rfi/device.py template classes).

    Tuning knob ``bb`` is the baselines-per-grid-step (VMEM budget /
    pipelining tradeoff) — the fused kernel's analogue of the reference's
    ``wgs``/``csplit`` searches.
    """

    autotune_version = 10  # v10: tuner shape 1024 rows (every sweep arm divides)

    def __init__(self, context, width: int = 13, n_windows: int = 4,
                 threshold_falloff: float = 1.2, flag_value: int = 1, tuning=None):
        self.context = context
        self.width = width
        self.n_windows = n_windows
        self.threshold_falloff = threshold_falloff
        self.flag_value = flag_value
        if tuning is None:
            tuning = self.autotune(context, width, n_windows)
        self.bb = tuning.get("bb", 4)
        self.nref = tuning.get("nref", 1)
        self.pipeline = tuning.get("pipeline", "grid")
        self.ingest = tuning.get("ingest", "planar")
        self.fold = tuning.get("fold", 1024)

    @classmethod
    @_tune.autotuner(test={"bb": 4, "nref": 1, "pipeline": "grid", "ingest": "planar",
                           "fold": 1024})
    def autotune(cls, context, width, n_windows):
        # 1024 baselines — dump-representative AND divisible by every
        # sweep arm (bb·nref up to 64; 1008 silently skipped bb=32 and
        # nref=2 via the _fold_setup divisibility check).  256 (the
        # round-4 shape) mis-ranked `ingest`: the amp preamble's relative
        # cost shrinks at small dumps, so the tuner picked amp while the
        # decisive dump-scale A/B (round 5: planar 29.80 vs amp 34.14 ms
        # at 8064 rows, 5 interleaved rounds) says planar by 13%.  At
        # ~1k rows the ranking matches the dump scale.
        channels, baselines = 32768, 1024
        rs = np.random.RandomState(seed=1)
        vis_t = jnp.asarray(rs.standard_normal((baselines, channels, 2)).astype(np.float32))

        def generate(bb, nref, pipeline, ingest, fold):
            if nref != 1 and (pipeline == "dma" or ingest == "amp"):
                raise ValueError("config skipped: nref>1 applies only to "
                                 "pipeline='grid' with planar ingest")
            if (bb * -(-channels // fold)) % 8:
                raise ValueError("config skipped: bb*hh not a sublane multiple")
            def call(v):
                if pipeline == "dma":
                    return flag_transposed_dma(
                        v, width=width, n_windows=n_windows, bb=bb, fold=fold,
                        ingest=ingest
                    )
                return flag_transposed(
                    v, width=width, n_windows=n_windows, bb=bb, nref=nref,
                    fold=fold, ingest=ingest
                )

            return _tune.make_measure(call, vis_t)

        # fold (the band-fold lane width) reshapes the block at constant
        # footprint: wider folds mean fewer bands and cheaper cross-band
        # shift corrections.  The old fixed 1024 dated to round-2
        # remote-AOT ceilings; the round-4 ladder measured 1024 -> 8192 as
        # 11.60 -> 9.66 ms/dump on v5e (16384 ties on the round-4 kernel).
        # 32768 (the full headline channel count) is the h=1 regime: one
        # band per row, so every channel shift is a single lane roll and
        # the per-rank-round band matmuls vanish (round-5 kernel
        # specialization) — it crashes the round-2 GRID compiler at
        # bb >= 16 but the DMA pipeline compiles it.
        return _tune.autotune(generate, bb=[1, 2, 4, 8, 16, 32], nref=[1, 2],
                              pipeline=["grid", "dma"], ingest=["planar", "amp"],
                              fold=[1024, 8192, 16384, 32768])

    def __call__(self, vis_t, input_flags=None, n_sigma: float = 11.0, interpret: bool = False,
                 channel_flags=None):
        if self.pipeline == "dma":
            return flag_transposed_dma(
                vis_t,
                input_flags,
                width=self.width,
                n_sigma=n_sigma,
                n_windows=self.n_windows,
                falloff=self.threshold_falloff,
                flag_value=self.flag_value,
                bb=self.bb,
                fold=self.fold,
                interpret=interpret,
                channel_flags=channel_flags,
                ingest=self.ingest,
            )
        return flag_transposed(
            vis_t,
            input_flags,
            width=self.width,
            n_sigma=n_sigma,
            n_windows=self.n_windows,
            falloff=self.threshold_falloff,
            flag_value=self.flag_value,
            bb=self.bb,
            fold=self.fold,
            interpret=interpret,
            channel_flags=channel_flags,
            nref=self.nref,
            ingest=self.ingest,
        )


@functools.partial(
    jax.jit,
    static_argnames=("slab", "width", "n_sigma", "n_windows", "falloff", "flag_value", "bb",
                     "fold", "interpret", "nref", "pipeline", "layout", "ingest"),
)
def flag_dump(vis_t, input_flags=None, slab: int = 256, width: int = 13,
              n_sigma: float = 11.0, n_windows: int = 4, falloff: float = 1.2,
              flag_value: int = 1, bb: int = 1, fold: int = 1024, interpret: bool = False,
              channel_flags=None, nref: int = 1, pipeline: str = "grid",
              layout: str = "trailing", ingest: str = "planar"):
    """Flag a large dump, as ONE program.

    ``pipeline="dma"`` (the shipped configuration): the whole dump runs
    as ONE kernel invocation — the in-kernel DMA block loop is the slab
    loop — and ``slab``/``nref`` are ignored.  See the inline comment
    below for why no scan wrapper exists on this path.

    ``pipeline="grid"``: the remote Mosaic AOT service fails on very
    large grid/buffer sizes (empirically: 252-baseline slabs at 32k
    channels compile, ≥1008 do not), and per-dispatch latency over the
    remote tunnel makes a Python loop of slab calls latency-bound.  So
    the slab loop is a ``lax.scan`` over one compiled slab kernel inside
    a single jit: one dispatch, one kernel compilation, sequential slab
    executions on-device.  Keyword arguments are those of
    :func:`flag_transposed` (``channel_flags`` is shared by every slab,
    not scanned over).
    """
    kwargs = dict(width=width, n_sigma=n_sigma, n_windows=n_windows, falloff=falloff,
                  flag_value=flag_value, bb=bb, fold=fold, interpret=interpret,
                  channel_flags=channel_flags, layout=layout)
    if pipeline == "dma":
        slab_fn = functools.partial(flag_transposed_dma, ingest=ingest)
        # The DMA engine's in-kernel fori_loop IS the slab loop (operands
        # stay in HBM; blocks stream through double-buffered VMEM), so the
        # whole dump runs as ONE kernel invocation and the lax.scan
        # wrapper below is never needed.  This is not just simpler — at
        # fold = 32768 the remote Mosaic AOT service rejects the
        # scan-wrapped module outright (round 5: every scan-path compile
        # at the 4-pol dump failed with helper exit 1, while the same
        # kernel one-shot over 8064 baselines compiled in seconds).
        return slab_fn(vis_t, input_flags, **kwargs)
    slab_fn = functools.partial(flag_transposed, nref=nref, ingest=ingest)
    baselines, channels = _vis_dims(vis_t, layout)
    if baselines <= slab:
        return slab_fn(vis_t, input_flags, **kwargs)
    n_full = baselines // slab
    if layout == "leading":
        # lax.scan slices xs on axis 0, so slabbing a leading-layout dump
        # re-permutes it once — the zero-copy benefit of this layout lives
        # in the one-shot path (baselines <= slab; whole-dump kernels
        # compile since round 3, so slab=baselines is the natural call).
        main = vis_t[:, : n_full * slab].reshape(2, n_full, slab, channels)
        main = jnp.moveaxis(main, 1, 0)  # scan axis first: (n_full, 2, slab, C)
        tail_vis = vis_t[:, n_full * slab :]
    else:
        main = vis_t[: n_full * slab].reshape(n_full, slab, channels, 2)
        tail_vis = vis_t[n_full * slab :]
    xs = (main,)
    if input_flags is not None:
        xs = (main, input_flags[: n_full * slab].reshape(n_full, slab, channels))

    def body(_, x):
        if input_flags is not None:
            return None, slab_fn(x[0], x[1], **kwargs)
        return None, slab_fn(x[0], **kwargs)

    _, out = lax.scan(body, None, xs)
    out = out.reshape(n_full * slab, channels)
    if n_full * slab < baselines:
        tail_flags = None if input_flags is None else input_flags[n_full * slab :]
        tail = slab_fn(tail_vis, tail_flags, **kwargs)
        out = jnp.concatenate([out, tail], axis=0)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("width", "n_sigma", "n_windows", "falloff", "flag_value", "bb", "fold",
                     "interpret", "nref", "rank_radix", "layout", "ingest"),
)
def flag_transposed(vis_t, input_flags=None, width: int = 13, n_sigma: float = 11.0,
                    n_windows: int = 4, falloff: float = 1.2, flag_value: int = 1,
                    bb: int = 4, fold: int = 1024, interpret: bool = False,
                    channel_flags=None, nref: int = 1, rank_radix: int = 1,
                    layout: str = "trailing", ingest: str = "planar"):
    """Fused flagger on baseline-major planar visibilities.

    Parameters
    ----------
    vis_t
        (baselines, channels, 2) float32 split-complex visibilities —
        or, with ``layout="leading"``, (2, baselines, channels): the
        kernel-native planar-leading layout whose band-folding is a free
        reshape (no corner-turn copy; see ``device.to_planar(...,
        leading=True)``).
    input_flags
        Optional (baselines, channels) uint8 prior flags (the reference's
        FULL mode).
    channel_flags
        Optional (channels,) uint8 prior flags shared by all baselines
        (the reference's CHANNEL mode, rfi/device.py:40-46).  Passed to
        the kernel as one folded (H, fold) block with a constant index
        map and expanded per band in-kernel — no (baselines × channels)
        broadcast is ever materialized.  Mutually exclusive with
        ``input_flags``.
    bb
        Baselines per block (VMEM budget knob; the tuning dimension).
    fold
        Lane width W of the folded channel axis (≤ 1024, multiple of 128
        unless it covers all channels).
    nref
        Independent `bb`-baseline blocks per grid step, each through its
        own ref (see :func:`_flagger_kernel_multi`): block shapes stay
        AOT-compilable while per-step overhead amortizes.  IR size grows
        ~`nref`-fold.

    Returns
    -------
    (baselines, channels) uint8 flags.
    """
    if input_flags is not None and channel_flags is not None:
        raise ValueError("pass either input_flags (FULL) or channel_flags (CHANNEL), not both")
    if ingest not in ("planar", "amp"):
        raise ValueError(f"unknown ingest {ingest!r}")
    if ingest == "amp" and nref != 1:
        raise ValueError("ingest='amp' supports nref=1 only")
    baselines, channels = _vis_dims(vis_t, layout)
    fold, hh, padded_c = _fold_setup(channels, bb, fold, baselines, nref)
    if ingest == "amp":
        folded = _fold_amp(vis_t, layout, baselines, hh, fold, padded_c, channels)
    else:
        # Band-folded rows: row b*hh + h holds channels [h*fold, (h+1)*fold),
        # with re/im on a LEADING planar axis (lane dim stays `fold`).
        folded = _fold_vis(vis_t, layout, baselines, hh, fold, padded_c, channels)
    if padded_c != channels:
        if input_flags is not None:
            input_flags = jnp.pad(input_flags, ((0, 0), (0, padded_c - channels)))
        if channel_flags is not None:
            channel_flags = jnp.pad(channel_flags, ((0, padded_c - channels),))
    block_rows = bb * hh

    flags_mode = "none"
    if input_flags is not None:
        flags_mode = "full"
    elif channel_flags is not None:
        flags_mode = "channel"
    algo_kw = dict(
        width=width,
        n_sigma=n_sigma,
        n_windows=n_windows,
        falloff=falloff,
        flag_value=flag_value,
        channels=channels,
        h=hh,
        flags_mode=flags_mode,
        interpret=interpret,
        rank_radix=rank_radix,
        ingest=ingest,
    )
    kwargs = {}
    if not interpret and pltpu is not None:
        # The default scoped-VMEM limit is 16 MiB; v5e has 128 MiB physical.
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if nref == 1:
        kernel = functools.partial(_flagger_kernel, **algo_kw)
        if ingest == "amp":
            in_specs = [pl.BlockSpec((block_rows, fold), lambda i: (i, 0), memory_space=_VMEM)]
        else:
            in_specs = [pl.BlockSpec((2, block_rows, fold), lambda i: (0, i, 0), memory_space=_VMEM)]
        operands = [folded]
        if input_flags is not None:
            in_specs.append(pl.BlockSpec((block_rows, fold), lambda i: (i, 0), memory_space=_VMEM))
            operands.append(input_flags.reshape(baselines * hh, fold))
        elif channel_flags is not None:
            # One (H, fold) block, revisited by every grid step.
            in_specs.append(pl.BlockSpec((hh, fold), lambda i: (0, 0), memory_space=_VMEM))
            operands.append(channel_flags.reshape(hh, fold))
        out = pl.pallas_call(
            kernel,
            grid=(baselines // bb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows, fold), lambda i: (i, 0), memory_space=_VMEM),
            out_shape=jax.ShapeDtypeStruct((baselines * hh, fold), jnp.uint8),
            interpret=interpret,
            **kwargs,
        )(*operands)
        return out.reshape(baselines, padded_c)[:, :channels]

    # Multi-ref grid step: sub-block k of step i covers block index
    # i*nref + k; each output array holds that sub-block's stripes and the
    # stripes are re-interleaved afterwards (cheap XLA shuffle).
    grid_steps = baselines // (bb * nref)
    kernel = functools.partial(_flagger_kernel_multi, nref=nref, **algo_kw)
    in_specs = [
        pl.BlockSpec((2, block_rows, fold), (lambda i, k=k: (0, i * nref + k, 0)),
                     memory_space=_VMEM)
        for k in range(nref)
    ]
    operands = [folded] * nref
    if input_flags is not None:
        iff = input_flags.reshape(baselines * hh, fold)
        in_specs += [
            pl.BlockSpec((block_rows, fold), (lambda i, k=k: (i * nref + k, 0)),
                         memory_space=_VMEM)
            for k in range(nref)
        ]
        operands += [iff] * nref
    elif channel_flags is not None:
        in_specs.append(pl.BlockSpec((hh, fold), lambda i: (0, 0), memory_space=_VMEM))
        operands.append(channel_flags.reshape(hh, fold))
    outs = pl.pallas_call(
        kernel,
        grid=(grid_steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_rows, fold), lambda i: (i, 0), memory_space=_VMEM)
            for _ in range(nref)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid_steps * block_rows, fold), jnp.uint8)
            for _ in range(nref)
        ],
        interpret=interpret,
        **kwargs,
    )(*operands)
    stacked = jnp.stack(outs).reshape(nref, grid_steps, block_rows, fold)
    out = jnp.moveaxis(stacked, 0, 1).reshape(baselines * hh, fold)
    return out.reshape(baselines, padded_c)[:, :channels]


def _flagger_kernel_dma(*refs, n_blocks: int, block_rows: int, fold: int,
                        algo_kw: dict):
    """One-grid-step flagger: an in-kernel block loop with manual DMA.

    The grid engine pays this environment's per-grid-step dispatch
    overhead (~59 µs through the remote tunnel) once per ``bb``-baseline
    block — 252 times per slab at bb=1.  Here the whole slab is ONE grid
    step: visibilities stay in HBM (``memory_space=ANY``), a
    ``fori_loop`` walks the blocks, and a two-slot VMEM scratch double-
    buffers the HBM→VMEM block DMA against compute (the guide's
    double-buffering pattern).  Output flags DMA back per block; slot
    reuse waits on the write two iterations behind.
    """
    flags_mode = algo_kw["flags_mode"]
    if flags_mode == "channel":
        vis_hbm, cf_ref, flags_hbm = refs
        if_hbm = None
    elif flags_mode == "full":
        vis_hbm, if_hbm, flags_hbm = refs
        cf_ref = None
    else:
        vis_hbm, flags_hbm = refs
        cf_ref = None
        if_hbm = None

    if algo_kw.get("ingest", "planar") == "amp":
        # amplitude stream: (R, W) f32, half the planar traffic
        ins = [(
            lambda idx: vis_hbm.at[pl.ds(idx * block_rows, block_rows)],
            (block_rows, fold), jnp.float32,
        )]
    else:
        # vis stream: planar-leading (2, R, W) HBM layout, blocks cut on the
        # row (sublane) axis — the lane axis W is never sliced.
        ins = [(
            lambda idx: vis_hbm.at[:, pl.ds(idx * block_rows, block_rows)],
            (2, block_rows, fold), jnp.float32,
        )]
    if if_hbm is not None:
        ins.append((
            lambda idx: if_hbm.at[pl.ds(idx * block_rows, block_rows)],
            (block_rows, fold), jnp.uint8,
        ))
    outs = [(
        lambda idx: flags_hbm.at[pl.ds(idx * block_rows, block_rows)],
        (block_rows, fold), jnp.uint8,
    )]

    if if_hbm is None:
        def per_block(in_view, out_view):
            _flagger_body(in_view, cf_ref, out_view, **algo_kw)
    else:
        def per_block(in_view, if_view, out_view):
            _flagger_body(in_view, if_view, out_view, **algo_kw)

    _dma_block_loop(ins, outs, per_block, n_blocks=n_blocks)


def _dma_block_loop(ins, outs, per_block, *, n_blocks: int):
    """Run ``per_block(*in_views, *out_views)`` over HBM blocks.

    Double-buffered: two VMEM slots per stream; block ``i+1``'s read DMAs
    are issued before block ``i`` computes, and a slot's output buffer is
    reused only after its write DMA from two blocks back has landed.

    ``ins``/``outs`` are lists of ``(slice_fn, shape, dtype)`` streams:
    ``slice_fn(idx)`` returns the HBM ref view for block ``idx`` (shape
    ``shape``).  Lane-dim (last-axis) slicing is forbidden by Mosaic —
    slicers must cut leading/sublane axes only, sublane cuts in multiples
    of 8.
    """

    def body(*scoped):
        n_in, n_out = len(ins), len(outs)
        scratch_ins = scoped[:n_in]
        scratch_outs = scoped[n_in : n_in + n_out]
        in_sems = scoped[n_in + n_out : 2 * n_in + n_out]
        out_sems = scoped[2 * n_in + n_out :]

        def in_dma(k, slot, idx):
            return pltpu.make_async_copy(
                ins[k][0](idx), scratch_ins[k].at[slot], in_sems[k].at[slot])

        def out_dma(k, slot, idx):
            return pltpu.make_async_copy(
                scratch_outs[k].at[slot], outs[k][0](idx), out_sems[k].at[slot])

        for k in range(n_in):
            in_dma(k, 0, 0).start()

        def loop(i, carry):
            cur = lax.rem(i, 2)
            nxt = lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                for k in range(n_in):
                    in_dma(k, nxt, i + 1).start()

            for k in range(n_in):
                in_dma(k, cur, i).wait()

            # The output written from this slot two blocks ago must have
            # landed before the slot's buffer is overwritten.
            @pl.when(i >= 2)
            def _():
                for k in range(n_out):
                    out_dma(k, cur, i - 2).wait()

            per_block(*[s.at[cur] for s in scratch_ins],
                      *[s.at[cur] for s in scratch_outs])
            for k in range(n_out):
                out_dma(k, cur, i).start()
            return carry

        lax.fori_loop(0, n_blocks, loop, jnp.int32(0))

        # n_blocks is static: drain the last one or two in-flight writes.
        for k in range(n_out):
            if n_blocks >= 2:
                out_dma(k, (n_blocks - 2) % 2, n_blocks - 2).wait()
            out_dma(k, (n_blocks - 1) % 2, n_blocks - 1).wait()

    scoped = (
        [pltpu.VMEM((2,) + tuple(shape), dtype) for _, shape, dtype in ins]
        + [pltpu.VMEM((2,) + tuple(shape), dtype) for _, shape, dtype in outs]
        + [pltpu.SemaphoreType.DMA((2,)) for _ in ins]
        + [pltpu.SemaphoreType.DMA((2,)) for _ in outs]
    )
    pl.run_scoped(body, *scoped)


@functools.partial(
    jax.jit,
    static_argnames=("width", "n_sigma", "n_windows", "falloff", "flag_value", "bb",
                     "fold", "interpret", "rank_radix", "layout", "ingest"),
)
def flag_transposed_dma(vis_t, input_flags=None, width: int = 13, n_sigma: float = 11.0,
                        n_windows: int = 4, falloff: float = 1.2, flag_value: int = 1,
                        bb: int = 1, fold: int = 1024, interpret: bool = False,
                        channel_flags=None, rank_radix: int = 1,
                        layout: str = "trailing", ingest: str = "planar"):
    """:func:`flag_transposed` with the in-kernel DMA pipeline.

    Same semantics and band-folded layout; the block loop runs INSIDE one
    kernel invocation (see :func:`_flagger_kernel_dma`), so per-grid-step
    dispatch overhead is paid once per slab instead of once per block.
    FULL-mode input flags ride a second double-buffered DMA stream;
    CHANNEL-mode flags ride a small VMEM input shared by every block.

    ``ingest="amp"`` computes the amplitude in XLA (fused into the
    producing pass) and streams (R, W) float32 amplitudes instead of the
    (2, R, W) planar pair: half the kernel read traffic, and the band
    fold becomes a free reshape (no corner-turn copy) since the
    amplitude has no plane axis.  Bit-identical flags.
    """
    if input_flags is not None and channel_flags is not None:
        raise ValueError("pass either input_flags (FULL) or channel_flags (CHANNEL), not both")
    if ingest not in ("planar", "amp"):
        raise ValueError(f"unknown ingest {ingest!r}")
    baselines, channels = _vis_dims(vis_t, layout)
    if pltpu is None:
        raise RuntimeError("flag_transposed_dma needs jax.experimental.pallas.tpu")
    fold, hh, padded_c = _fold_setup(channels, bb, fold, baselines)
    if ingest == "amp":
        folded = _fold_amp(vis_t, layout, baselines, hh, fold, padded_c, channels)
    else:
        folded = _fold_vis(vis_t, layout, baselines, hh, fold, padded_c, channels)
    if padded_c != channels:
        if channel_flags is not None:
            channel_flags = jnp.pad(channel_flags, ((0, padded_c - channels),))
        if input_flags is not None:
            input_flags = jnp.pad(input_flags, ((0, 0), (0, padded_c - channels)))
    block_rows = bb * hh
    n_blocks = baselines // bb

    flags_mode = "none"
    if input_flags is not None:
        flags_mode = "full"
    elif channel_flags is not None:
        flags_mode = "channel"
    algo_kw = dict(
        width=width, n_sigma=n_sigma, n_windows=n_windows, falloff=falloff,
        flag_value=flag_value, channels=channels, h=hh,
        flags_mode=flags_mode,
        interpret=interpret,
        rank_radix=rank_radix,
        ingest=ingest,
    )
    kernel = functools.partial(
        _flagger_kernel_dma, n_blocks=n_blocks, block_rows=block_rows, fold=fold,
        algo_kw=algo_kw,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    operands = [folded]
    if input_flags is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        operands.append(input_flags.reshape(baselines * hh, fold))
    elif channel_flags is not None:
        in_specs.append(pl.BlockSpec(memory_space=_VMEM))
        operands.append(channel_flags.reshape(hh, fold))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((baselines * hh, fold), jnp.uint8),
        interpret=interpret,
        **kwargs,
    )(*operands)
    return out.reshape(baselines, padded_c)[:, :channels]
