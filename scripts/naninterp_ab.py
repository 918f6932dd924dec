#!/usr/bin/env python
"""In-process A/B of NaN-interpolation engines for twodflag.

The associative-scan fills were 6.6 ms of the 12.9 ms 2-D pipeline on a
(8, 120, 1024) block (scripts/twodflag_profile.py): the scan's odd/even
interleave means strided lane slicing on TPU.  This A/B led to shipping
the sublane variant; the old engine is INLINED here (``scan``) so the
result stays reproducible:

* ``scan``      — the pre-change engine: 2x lax.cummax + 2x pair-carrying
                  associative_scan along lanes.
* ``hillis``    — hand-rolled Hillis-Steele log-shift forward/backward fill
                  carrying (value, index) under one isnan predicate; shifts
                  are pad+slice along the last (lane) axis.
* ``hillis_T``  — same, but freq moved to the sublane axis (transpose
                  in/out) so the log shifts run on sublanes.  SHIPPED as
                  ``twodflag._linearly_interpolate_nans`` (also timed, as
                  ``shipped``).

Parity of every variant vs the shipped implementation is asserted
exactly (bitwise, NaN-free outputs) before timing.
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from katsdpsigproc_tpu.models.rfi import twodflag  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def _fill_hillis(data, idx0, *, reverse: bool):
    """Nearest-valid fill along the last axis by log-shift propagation.

    Returns (values, indices): per position, the value and index of the
    nearest non-NaN element at-or-before (at-or-after when `reverse`);
    NaN / -1 where none exists.
    """
    n = data.shape[-1]
    v = data
    iv = jnp.where(jnp.isnan(data), jnp.int32(-1), idx0)
    d = 1
    while d < n:
        if reverse:
            sv = jnp.concatenate([v[..., d:], jnp.full(v.shape[:-1] + (d,), jnp.nan, v.dtype)], -1)
            si = jnp.concatenate([iv[..., d:], jnp.full(iv.shape[:-1] + (d,), -1, iv.dtype)], -1)
        else:
            sv = jnp.concatenate([jnp.full(v.shape[:-1] + (d,), jnp.nan, v.dtype), v[..., :-d]], -1)
            si = jnp.concatenate([jnp.full(iv.shape[:-1] + (d,), -1, iv.dtype), iv[..., :-d]], -1)
        take = jnp.isnan(v)
        v = jnp.where(take, sv, v)
        iv = jnp.where(take, si, iv)
        d *= 2
    return v, iv


def _fill_scan(data, valid, *, reverse):
    """The pre-change fill: keep-the-latest-valid associative scan."""
    from jax import lax

    vals = jnp.where(valid, data, 0.0)
    flags = valid.astype(data.dtype)

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf > 0, bv, av), jnp.maximum(af, bf)

    v, _ = lax.associative_scan(comb, (vals, flags), axis=data.ndim - 1, reverse=reverse)
    return v


def interp_scan(data):
    """The engine shipped before this A/B (2x cummax + 2x associative scan)."""
    from jax import lax

    n = data.shape[-1]
    idx = jnp.arange(n)
    valid = ~jnp.isnan(data)
    fwd = lax.cummax(jnp.where(valid, idx, -1), axis=data.ndim - 1)
    bwd = n - 1 - jnp.flip(
        lax.cummax(jnp.flip(jnp.where(valid, n - 1 - idx, -1), -1), axis=data.ndim - 1), -1
    )
    has_fwd = fwd >= 0
    has_bwd = bwd <= n - 1
    v_fwd = _fill_scan(data, valid, reverse=False)
    v_bwd = _fill_scan(data, valid, reverse=True)
    span = jnp.maximum(bwd - fwd, 1)
    interp = v_fwd + (idx - fwd) * (v_bwd - v_fwd) / span
    out = jnp.where(valid, data, jnp.where(
        has_fwd & has_bwd, interp, jnp.where(has_fwd, v_fwd, jnp.where(has_bwd, v_bwd, 0.0))
    ))
    return out.astype(data.dtype)


def interp_hillis(data):
    n = data.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), data.shape)
    vf, ivf = _fill_hillis(data, idx, reverse=False)
    vb, ivb = _fill_hillis(data, idx, reverse=True)
    has_f = ivf >= 0
    has_b = ivb >= 0
    span = jnp.maximum(ivb - ivf, 1).astype(data.dtype)
    interp = vf + (idx - ivf).astype(data.dtype) * (vb - vf) / span
    out = jnp.where(
        ~jnp.isnan(data), data,
        jnp.where(has_f & has_b, interp,
                  jnp.where(has_f, vf, jnp.where(has_b, vb, 0.0))))
    return out.astype(data.dtype)


def interp_hillis_T(data):
    moved = jnp.moveaxis(data, -1, -2)  # freq onto sublanes
    out = jnp.moveaxis(interp_hillis_lastsub(moved), -2, -1)
    return out


def interp_hillis_lastsub(data):
    """interp_hillis along axis -2 (data already transposed)."""
    n = data.shape[-2]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], data.shape)
    v = data
    iv = jnp.where(jnp.isnan(data), jnp.int32(-1), idx)

    def fill(v, iv, reverse):
        d = 1
        while d < n:
            padv = jnp.full(v.shape[:-2] + (d,) + v.shape[-1:], jnp.nan, v.dtype)
            padi = jnp.full(iv.shape[:-2] + (d,) + iv.shape[-1:], -1, iv.dtype)
            if reverse:
                sv = jnp.concatenate([v[..., d:, :], padv], -2)
                si = jnp.concatenate([iv[..., d:, :], padi], -2)
            else:
                sv = jnp.concatenate([padv, v[..., :-d, :]], -2)
                si = jnp.concatenate([padi, iv[..., :-d, :]], -2)
            take = jnp.isnan(v)
            v = jnp.where(take, sv, v)
            iv = jnp.where(take, si, iv)
            d *= 2
        return v, iv

    vf, ivf = fill(v, iv, False)
    vb, ivb = fill(v, iv, True)
    has_f = ivf >= 0
    has_b = ivb >= 0
    span = jnp.maximum(ivb - ivf, 1).astype(data.dtype)
    interp = vf + (idx - ivf).astype(data.dtype) * (vb - vf) / span
    out = jnp.where(
        ~jnp.isnan(data), data,
        jnp.where(has_f & has_b, interp,
                  jnp.where(has_f, vf, jnp.where(has_b, vb, 0.0))))
    return out.astype(data.dtype)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--time", type=int, default=120)
    parser.add_argument("--channels", type=int, default=1024)
    parser.add_argument("--baselines", type=int, default=8)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    shape = (args.baselines, args.time, args.channels)
    data = rs.standard_normal(shape).astype(np.float32)
    # NaN pattern like real backgrounds: contiguous fully-masked bands plus
    # scattered holes; one all-NaN row.
    data[:, :, 100:180] = np.nan
    data[:, 40:50, :] = np.nan
    data[data < -2.2] = np.nan
    data[0, 3, :] = np.nan
    data = jnp.asarray(data)

    variants = {
        "shipped": twodflag._linearly_interpolate_nans,
        "scan": interp_scan,
        "hillis": interp_hillis,
        "hillis_T": interp_hillis_T,
    }

    ref = np.asarray(jax.jit(variants["shipped"])(data))
    assert not np.isnan(ref).any()
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(data))
        mism = int((got != ref).sum())
        print(f"{name:10s} parity: {mism} mismatches", file=sys.stderr, flush=True)
        if mism:
            bad = np.argwhere(got != ref)[:5]
            print(f"  e.g. {bad} ref={ref[tuple(bad[0])]} got={got[tuple(bad[0])]}",
                  file=sys.stderr)
            raise SystemExit("parity FAILED")

    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t = time_scan(fn, (data,), iters=args.iters) * 1e3
            times[name].append(t)
            print(f"rep{rep} {name:10s} {t:8.3f} ms", file=sys.stderr, flush=True)
    print("\n=== min of reps ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:10s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
