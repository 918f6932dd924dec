#!/usr/bin/env python
"""Head-to-head timing of masked-median-along-time implementations.

Shapes mirror twodflag's `_time_median`: (bl, T, F) data, median over T per
(bl, F).  Variants: axis sort + gather, bitwise rank search (unrolled), and
bitwise rank search (fori_loop).
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

from katsdpsigproc_tpu.ops import rank as rank_ops  # noqa: E402


def sort_median(data, valid, empty_value=0.0):
    n_rows = data.shape[-2]
    vals = jnp.where(valid, data, jnp.inf)
    s = jnp.sort(vals, axis=-2)
    n = jnp.sum(valid, axis=-2, dtype=jnp.int32)
    lo = jnp.clip((n - 1) // 2, 0, n_rows - 1)
    hi = jnp.clip(n // 2, 0, n_rows - 1)
    v_lo = jnp.take_along_axis(s, lo[..., None, :], axis=-2)[..., 0, :]
    v_hi = jnp.take_along_axis(s, hi[..., None, :], axis=-2)[..., 0, :]
    med = (v_lo + v_hi) * 0.5
    return jnp.where(n > 0, med, jnp.asarray(empty_value, data.dtype))


def rank_median(data, valid, *, unroll, radix_bits=1, empty_value=0.0):
    vals = jnp.where(valid, data, jnp.nan)
    vals_t = jnp.swapaxes(vals, -1, -2)
    n = jnp.sum(valid, axis=-2, dtype=jnp.int32)
    med = rank_ops.find_rank_float(vals_t, n // 2, (n & 1) == 0, unroll=unroll,
                                   radix_bits=radix_bits)
    return jnp.where(n > 0, med, jnp.asarray(empty_value, data.dtype))


def rank_median_axis(data, valid, *, unroll, empty_value=0.0):
    """Rank search along axis -2 directly (no transpose): counts reduce
    over the T axis while F stays minor-most (lane-aligned)."""
    vals = jnp.where(valid, data, jnp.nan)
    n = jnp.sum(valid, axis=-2, dtype=jnp.int32)

    def count_fn(mask):
        # mask: (..., K, T, F) or (..., T, F) with reduction over T
        return jnp.sum(mask, axis=-2, dtype=jnp.int32)

    # find_rank_float works on the last axis; emulate by moving the data
    # axis last *logically* via a custom count_fn is not possible with the
    # shared implementation (it indexes [..., None, :]), so inline the
    # search here along axis -2.
    target = n // 2
    halfway = (n & 1) == 0
    cur = jnp.zeros(n.shape, jnp.int32)

    def round_(i, cur):
        shift = 30 - i
        cand_bits = cur | (1 << shift)
        cand = jax.lax.bitcast_convert_type(cand_bits, jnp.float32)
        counts = count_fn(vals < cand[..., None, :])
        take = counts <= target
        return jnp.where(take, cand_bits, cur)

    if unroll:
        for i in range(31):
            cur = round_(i, cur)
    else:
        cur = jax.lax.fori_loop(0, 31, round_, cur)
    result = jax.lax.bitcast_convert_type(cur, jnp.float32)
    r = count_fn(vals < result[..., None, :])
    prev = jnp.max(jnp.where(vals < result[..., None, :], vals, 0.0), axis=-2)
    need_avg = halfway & (r == target)
    med = jnp.where(need_avg, (result + prev) * 0.5, result)
    return jnp.where(n > 0, med, jnp.asarray(empty_value, data.dtype))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--bl", type=int, default=8)
    parser.add_argument("--time", type=int, default=120)
    parser.add_argument("--channels", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    data = np.abs(rs.standard_normal((args.bl, args.time, args.channels))).astype(np.float32)
    valid = rs.random_sample(data.shape) > 0.1

    x = jnp.asarray(data)
    v = jnp.asarray(valid)

    from katsdpsigproc_tpu.utils.profiling import time_scan

    expected = None
    for name, fn in [
        ("sort", sort_median),
        ("rank unroll", lambda d, m: rank_median(d, m, unroll=True)),
        ("rank fori", lambda d, m: rank_median(d, m, unroll=False)),
        ("rank radix4 fori", lambda d, m: rank_median(d, m, unroll=False, radix_bits=4)),
        ("rank axis unroll", lambda d, m: rank_median_axis(d, m, unroll=True)),
        ("rank axis fori", lambda d, m: rank_median_axis(d, m, unroll=False)),
    ]:
        jfn = jax.jit(lambda d, m, f=fn: jnp.sum(f(d, m)))
        got = np.asarray(jfn(x, v))
        if expected is None:
            expected = got
        else:
            assert np.allclose(got, expected, rtol=1e-6), (name, got, expected)
        dt = time_scan(fn, (x, v), iters=args.iters)
        print(f"{name:18s} {dt * 1e3:9.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
