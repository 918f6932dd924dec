"""Independent pure-numpy oracle for the 2-D SumThreshold flagger.

This is a tests-only, from-scratch re-derivation of the reference
algorithm (``/root/reference/src/katsdpsigproc/rfi/twodflag.py`` — numba
kernels ``_average_freq`` :67, ``_time_median`` :119, ``_get_background2d``
:403, ``_sum_threshold`` :563, ``_get_baseline_flags`` :767,
``SumThresholdFlagger._get_flags`` :986), written directly against that
source with NO code shared with ``katsdpsigproc_tpu.models.rfi.twodflag``.
Its purpose is an end-to-end, mask-for-mask check of the production JAX
implementation: the two were written from the same specification but
share no decomposition (loops here; vmapped vectorized ops there), so
agreement is meaningful.

Floating-point conventions
--------------------------
Exact (bit-for-bit) mask parity across independently-written float code
requires fixing the handful of spots where IEEE-754 association matters.
This oracle adopts the *production implementation's documented f32
conventions* at those spots (each is a sub-ulp delta from the reference's
float64 accumulators, and is exercised deliberately by the tie cases in
the test suite):

1. Box-filter window sums: float32 ordered shifted adds (ascending
   offset), one divide by ``float32((2r+1)**passes)`` per axis — the
   reference keeps a float64 rolling accumulator (twodflag.py:283-306).
   [CPU XLA's ``lax.reduce_window`` is bitwise-identical to ordered
   shifted adds — verified empirically in the test module.]
2. SumThreshold window sums: float32 ordered shifted adds of the clamped
   values; the mean test is ``sums * float32(1/w) > threshold`` — the
   reference differences a float64 cumulative sum (twodflag.py:529-544).
3. Thresholds are formed as ``float32(median) * float32(scale)`` — the
   reference multiplies in float64 and rounds on store.
4. NaN interpolation: ``v0 + float32(k) * (v1 - v0) / span`` (multiply
   then divide, all f32) — the reference precomputes a float64 gradient
   (twodflag.py:230-233).

All medians are exact-rank statistics (``np.median`` here; bitwise rank
search in production) and all flag dilations are integer/boolean — no
convention needed.
"""

import math

import numpy as np

MAD_NORMAL = 1.4826


# ---------------------------------------------------------------------------
# Preconditioning (reference twodflag.py:67-116)

def average_freq(in_data, in_flags, factor):
    """abs → NaN-flag → zero flagged → frequency-average → baseline-major."""
    n_time, n_freq, n_bl = in_data.shape
    a_freq = (n_freq + factor - 1) // factor
    avg = np.zeros((n_bl, n_time, a_freq), np.float32)
    cnt = np.zeros((n_bl, n_time, a_freq), np.int64)
    amp = np.abs(in_data).astype(np.float32)
    good = (in_flags == 0) & ~np.isnan(amp)
    for jout in range(a_freq):
        for j in range(jout * factor, min((jout + 1) * factor, n_freq)):
            sel = good[:, j, :]  # (time, bl)
            contrib = np.where(sel, amp[:, j, :], np.float32(0.0))
            avg[:, :, jout] = (avg[:, :, jout] + contrib.T).astype(np.float32)
            cnt[:, :, jout] += sel.T
    flags = cnt == 0
    with np.errstate(invalid="ignore"):
        avg = np.where(flags, np.float32(0.0),
                       (avg / cnt.astype(np.float32)).astype(np.float32))
    return avg.astype(np.float32), flags


# ---------------------------------------------------------------------------
# Masked medians (reference twodflag.py:119-196)

def _masked_median_1d(values, empty):
    return np.float32(np.median(values)) if values.size else np.float32(empty)


def time_median(data, flags):
    """Per-channel median over unflagged times; empty → (0, flagged)."""
    n_time, n_freq = data.shape
    out = np.zeros((1, n_freq), np.float32)
    out_flags = np.zeros((1, n_freq), bool)
    for f in range(n_freq):
        vals = data[~flags[:, f], f]
        if vals.size == 0:
            out_flags[0, f] = True
        else:
            out[0, f] = np.median(vals)
    return out, out_flags


def median_abs(data, flags):
    return _masked_median_1d(np.abs(data[~flags]), np.nan)


def median_abs_axis0(data, flags):
    """Median of |data| along axis 0 over unflagged entries; NaN if none."""
    out = np.empty((1,) + data.shape[1:], np.float32)
    for j in np.ndindex(data.shape[1:]):
        col = data[(slice(None),) + j]
        sel = ~flags[(slice(None),) + j]
        out[(0,) + j] = _masked_median_1d(np.abs(col[sel]), np.nan)
    return out


# ---------------------------------------------------------------------------
# Gaussian-by-boxcar background (reference twodflag.py:254-463)

def _box_sum_ordered(padded, r, axis, n_out):
    """out[i] = sum_{j=0..2r} padded[i+j], f32 ordered ascending adds."""
    d = 2 * r + 1
    take = [slice(None)] * padded.ndim
    take[axis] = slice(0, n_out)
    acc = padded[tuple(take)].astype(np.float32).copy()
    for j in range(1, d):
        take[axis] = slice(j, j + n_out)
        acc = (acc + padded[tuple(take)]).astype(np.float32)
    return acc


def box_gaussian_filter(data, sigma, passes=4):
    """Repeated-boxcar approximate Gaussian, zero boundary (Getreuer 2013)."""
    sigma = np.asarray(sigma, np.float64)
    r_all = (0.5 * np.sqrt(12.0 * sigma**2 / passes + 1)).astype(np.int64)
    out = data.astype(np.float32)
    for axis in range(data.ndim):
        r = int(r_all[axis])
        if r <= 0:
            continue
        ext = r * passes
        pad_ext = [(0, 0)] * out.ndim
        pad_ext[axis] = (ext, ext)
        work = np.pad(out, pad_ext)
        n = work.shape[axis]
        for _ in range(passes):
            pad_r = [(0, 0)] * work.ndim
            pad_r[axis] = (r, r)
            work = _box_sum_ordered(np.pad(work, pad_r), r, axis, n)
        crop = [slice(None)] * work.ndim
        crop[axis] = slice(ext, n - ext)
        out = (work[tuple(crop)] / np.float32(float(2 * r + 1) ** passes)).astype(np.float32)
    return out


def masked_gaussian_filter(data, flags, sigma, passes=4):
    weight = (~flags).astype(np.float32)
    filled = np.where(flags, np.float32(0.0), data).astype(np.float32)
    fw = box_gaussian_filter(weight, sigma, passes)
    fd = box_gaussian_filter(filled, sigma, passes)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(fw == 0, np.float32(np.nan), (fd / fw).astype(np.float32))


def linearly_interpolate_nans(data):
    """Row-wise linear NaN interpolation; edge extrapolation repeats; all-NaN → 0.

    f32 convention 4: ``v0 + float32(k) * (v1 - v0) / span``.
    """
    out = data.astype(np.float32).copy()
    n = out.shape[-1]
    for row in out.reshape(-1, n):
        nans = np.isnan(row)
        if not nans.any():
            continue
        valid = np.flatnonzero(~nans)
        if valid.size == 0:
            row[:] = 0.0
            continue
        for i in np.flatnonzero(nans):
            before = valid[valid < i]
            after = valid[valid > i]
            if before.size and after.size:
                p, q = before[-1], after[0]
                span = np.float32(max(q - p, 1))
                row[i] = (row[p]
                          + np.float32(i - p) * (row[q] - row[p]) / span)
            elif before.size:
                row[i] = row[before[-1]]
            else:
                row[i] = row[after[0]]
    return out


def get_background2d(data, flags, iterations, spike_width, reject_threshold,
                     freq_chunk_ends):
    """Iteratively masked smooth background (reference twodflag.py:403-463)."""
    flags = flags.copy()
    for extend_factor in range(iterations, 0, -1):
        sigma = extend_factor * np.asarray(spike_width, np.float64)
        background = masked_gaussian_filter(data, flags, sigma)
        for c in range(len(freq_chunk_ends) - 1):
            sub = (slice(None), slice(int(freq_chunk_ends[c]), int(freq_chunk_ends[c + 1])))
            residual = np.abs(data[sub] - background[sub]).astype(np.float32)
            threshold = median_abs(residual, flags[sub])
            threshold = np.float32(threshold * np.float32(MAD_NORMAL * reject_threshold))
            with np.errstate(invalid="ignore"):
                flags[sub] |= residual > threshold
    background = masked_gaussian_filter(data, flags, np.asarray(spike_width, np.float64))
    return linearly_interpolate_nans(background)


# ---------------------------------------------------------------------------
# SumThreshold (reference twodflag.py:466-631)

def _dilate_windows(window_flags, window, out_len):
    """out[i] = OR of window_flags[k] over windows k containing sample i
    (the reference's cumulative-sum flag convolution, twodflag.py:466-489)."""
    out = np.zeros((out_len,) + window_flags.shape[1:], bool)
    for k in range(window_flags.shape[0]):
        hit = window_flags[k]
        out[k : k + window] |= hit
    return out


def _sum_threshold_1d(data, flags, windows, outlier_nsigma, rho, chunks):
    """SumThreshold along axis 0 of (N, M) with per-chunk noise estimates."""
    n = data.shape[0]
    wmax = max(windows)
    out = np.zeros(data.shape, bool)
    for ci in range(len(chunks) - 1):
        lo, hi = int(chunks[ci]), int(chunks[ci + 1])
        if hi == lo:
            continue
        med = median_abs_axis0(data[lo:hi], flags[lo:hi])[0]  # (M,)
        scale = np.float32(outlier_nsigma * MAD_NORMAL)
        threshold0 = np.where(np.isnan(med), np.float32(np.inf),
                              (med * scale).astype(np.float32))
        plo = max(lo - wmax + 1, 0)
        phi = min(hi + wmax - 1, n)
        pdata = data[plo:phi].astype(np.float32)
        p = phi - plo
        fpos = np.zeros(pdata.shape, bool)
        fneg = np.zeros(pdata.shape, bool)
        for window in windows:
            if window > p:
                continue
            tf = np.float32(rho ** math.log2(window)) if window > 1 else np.float32(1.0)
            th = (threshold0 / tf).astype(np.float32)[None]  # (1, M)
            clamped = np.where(fpos & (pdata > th), th, pdata).astype(np.float32)
            clamped = np.where(fneg & (clamped < -th), -th, clamped).astype(np.float32)
            # f32 convention 2: ordered shifted adds, then * f32(1/w).
            n_win = p - window + 1
            sums = clamped[:n_win].copy()
            for j in range(1, window):
                sums = (sums + clamped[j : n_win + j]).astype(np.float32)
            inv_w = np.float32(1.0 / window)
            fpos |= _dilate_windows((sums * inv_w).astype(np.float32) > th, window, p)
            fneg |= _dilate_windows((sums * (-inv_w)).astype(np.float32) > th, window, p)
        out[lo:hi] = (fpos | fneg)[lo - plo : hi - plo]
    return out


def sum_threshold(data, flags, axis, windows, outlier_nsigma, rho, chunks=None):
    if chunks is None:
        chunks = np.array([0, data.shape[axis]])
    windows = [int(w) for w in np.asarray(windows).ravel()]
    if not windows:
        return np.zeros(data.shape, bool)
    if axis == 0:
        return _sum_threshold_1d(data, flags, windows, outlier_nsigma, rho, chunks)
    return _sum_threshold_1d(data.T, flags.T, windows, outlier_nsigma, rho, chunks).T


# ---------------------------------------------------------------------------
# Flag combination / extension (reference twodflag.py:690-764)

def _smear(flags, extend, axis):
    """Centred boolean dilation of width `extend`, clipped at the edges."""
    if extend <= 1:
        return flags.copy()
    lo = -(extend // 2)
    n = flags.shape[axis]
    out = np.zeros(flags.shape, bool)
    idx = [slice(None)] * flags.ndim
    for t in range(n):
        t0, t1 = max(t + lo, 0), min(t + lo + extend, n)
        idx[axis] = slice(t0, t1)
        src = flags[tuple(idx)]
        idx[axis] = t
        out[tuple(idx)] = src.any(axis=axis)
    return out


def combine_flags(spec_flags, time_flags, freq_flags, time_extend):
    return _smear(spec_flags | time_flags | freq_flags, int(time_extend), axis=0)


def unaverage_freq(flags, freq_extend, average_freq_, flag_all_time_frac,
                   flag_all_freq_frac, orig_freq):
    n_time = flags.shape[0]
    rep = np.repeat(flags, average_freq_, axis=1)[:, :orig_freq]
    out = _smear(rep, int(freq_extend), axis=1)
    # Row/column totals are counted BEFORE any full-row/column flagging.
    row_tot = out.sum(axis=1)
    col_tot = out.sum(axis=0)
    out = out | (row_tot > flag_all_freq_frac * orig_freq)[:, None]
    out = out | (col_tot > n_time * flag_all_time_frac)[None, :]
    return out


# ---------------------------------------------------------------------------
# Per-baseline driver + public entry (reference twodflag.py:767-881, 986-1027)

def get_baseline_flags(data, flags, params, freq_chunk_ends, orig_freq):
    p = params
    data = data.astype(np.float32).copy()
    flags = flags.copy()
    spec_data, spec_flags = time_median(data, flags)
    spec_background = get_background2d(
        spec_data, spec_flags, p["background_iterations"],
        (0.0, p["spike_width_freq"]), p["background_reject"], freq_chunk_ends)
    spec_data = (spec_data - spec_background).astype(np.float32)
    spec_flags = sum_threshold(spec_data, spec_flags, 1, p["windows_freq"],
                               p["outlier_nsigma"], p["rho"], freq_chunk_ends)
    flags |= spec_flags

    background = get_background2d(
        data, flags, p["background_iterations"],
        (p["spike_width_time"], p["spike_width_freq"]),
        p["background_reject"], freq_chunk_ends)
    data = (data - background).astype(np.float32)
    time_flags = sum_threshold(data, flags, 0, p["windows_time"],
                               p["outlier_nsigma"], p["rho"])
    flags = flags | time_flags
    freq_flags = sum_threshold(data, flags, 1, p["windows_freq"],
                               p["outlier_nsigma"], p["rho"], freq_chunk_ends)

    combined = combine_flags(spec_flags, time_flags, freq_flags, p["time_extend"])
    return unaverage_freq(combined, p["freq_extend"], p["average_freq"],
                          p["flag_all_time_frac"], p["flag_all_freq_frac"], orig_freq)


def get_flags(data, flags, *, outlier_nsigma=4.5, windows_time=[1, 2, 4, 8],
              windows_freq=[1, 2, 4, 8], background_reject=2.0,
              background_iterations=1, spike_width_time=12.5,
              spike_width_freq=10.0, time_extend=3, freq_extend=3,
              freq_chunks=10, average_freq=1, flag_all_time_frac=0.6,
              flag_all_freq_frac=0.8, rho=1.3):
    """Full-cube oracle mirroring ``SumThresholdFlagger.get_flags``.

    Parameter conditioning follows the reference constructor + _get_flags
    (twodflag.py:951-1027): frequency windows scaled by ``average_freq``
    and uniquified, spike_width_freq scaled, windows clipped to the data
    extents (including the reference's use of the FREQUENCY extent to
    clip ``windows_time``), linspace frequency chunk ends.
    """
    n_time, n_freq, n_bl = data.shape
    wf = np.ceil(np.array(windows_freq, dtype=np.float32) / average_freq)
    wf = np.unique(wf.astype(np.int_))
    spike_width_freq = spike_width_freq / average_freq
    averaged_channels = (n_freq + average_freq - 1) // average_freq
    freq_chunk_ends = np.linspace(0, averaged_channels, freq_chunks + 1).astype(np.int_)
    params = dict(
        outlier_nsigma=outlier_nsigma,
        windows_time=np.array([w for w in windows_time if w <= n_freq], np.int_),
        windows_freq=np.array([w for w in wf if w <= averaged_channels], np.int_),
        background_reject=background_reject,
        background_iterations=background_iterations,
        spike_width_time=spike_width_time,
        spike_width_freq=spike_width_freq,
        time_extend=time_extend,
        freq_extend=freq_extend,
        average_freq=average_freq,
        flag_all_time_frac=flag_all_time_frac,
        flag_all_freq_frac=flag_all_freq_frac,
        rho=rho,
    )
    avg_data, avg_flags = average_freq_entry(data, flags, average_freq)
    out = np.empty((n_time, n_freq, n_bl), bool)
    for bl in range(n_bl):
        out[:, :, bl] = get_baseline_flags(
            avg_data[bl], avg_flags[bl], params, freq_chunk_ends, n_freq)
    if np.iscomplexobj(data):
        out |= np.isnan(data.real) | np.isnan(data.imag)
    else:
        out |= np.isnan(data)
    return out


def average_freq_entry(data, flags, factor):
    return average_freq(data, flags, factor)
