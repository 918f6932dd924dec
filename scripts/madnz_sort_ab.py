#!/usr/bin/env python
"""A/B: madnz exact median via radix rank-search vs XLA sort.

The rank search (ops.rank.find_rank_float, radix_bits=4) re-reads the
(C, B) deviations 8 times from HBM; a single ``lax.sort`` along channels
is one (tiled) pass plus O(log^2) in-VMEM merge work.  If sort wins, the
median of non-zeros is the sorted element at per-row rank
``(n + z) // 2`` (+ halfway averaging), fetched with a tiny gather.

Parity is asserted exactly vs the shipped madnz before timing.
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

from katsdpsigproc_tpu.models.rfi import MAD_NORMAL, device as rfi_device  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def madnz_sort(deviations, axis):
    """madnz via one sort along `axis` (exact, including halfway average)."""
    values = jnp.abs(deviations).astype(jnp.float32)
    n = jnp.int32(values.shape[axis])
    z = jnp.sum(values == 0, axis=axis, dtype=jnp.int32)
    rank2 = n + z  # strict-rank*2 target as in ops.rank.median_non_zero
    r = rank2 // 2
    halfway = (rank2 & 1) == 0
    s = jnp.sort(values, axis=axis)
    moved = jnp.moveaxis(s, axis, -1)
    lo = jnp.take_along_axis(moved, jnp.maximum(r - 1, 0)[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(moved, jnp.minimum(r, n - 1)[..., None], axis=-1)[..., 0]
    med = jnp.where(halfway & (r > 0), 0.5 * (lo + hi), hi)
    med = jnp.where(z >= n, 0.0, med)  # all zero -> reference returns 0 noise
    return (MAD_NORMAL * med).astype(jnp.float32)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--slab", type=int, default=252)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    dev = rs.standard_normal((args.channels, args.slab)).astype(np.float32)
    dev[rs.rand(*dev.shape) < 0.02] = 0.0  # zeros like flagged samples
    dev_cb = jnp.asarray(dev)           # straight (channels, baselines)
    dev_bc = jnp.asarray(dev.T.copy())  # transposed (baselines, channels)

    ref0 = np.asarray(jax.jit(lambda d: rfi_device.madnz(d, axis=0))(dev_cb))
    for name, fn, d in [
        ("sort axis0", lambda d: madnz_sort(d, 0), dev_cb),
        ("sort axis-1", lambda d: madnz_sort(d, -1), dev_bc),
    ]:
        got = np.asarray(jax.jit(fn)(d))
        mism = int((got != ref0).sum())
        print(f"{name:14s} parity: {mism} mismatches", file=sys.stderr, flush=True)
        if mism:
            bad = np.argwhere(got != ref0)[:3].ravel()
            print(f"  e.g. rows {bad} ref={ref0[bad]} got={got[bad]}", file=sys.stderr)
            raise SystemExit("parity FAILED")

    variants = [
        ("rank radix4 axis0", lambda d: rfi_device.madnz(d, axis=0), dev_cb),
        ("rank radix4 axis-1", lambda d: rfi_device.madnz(d, axis=-1), dev_bc),
        ("sort axis0", lambda d: madnz_sort(d, 0), dev_cb),
        ("sort axis-1", lambda d: madnz_sort(d, -1), dev_bc),
    ]
    times = {name: [] for name, _, _ in variants}
    for rep in range(args.reps):
        for name, fn, d in variants:
            t = time_scan(fn, (d,), iters=args.iters) * 1e3
            times[name].append(t)
            print(f"rep{rep} {name:20s} {t:8.3f} ms", file=sys.stderr, flush=True)
    print("\n=== min of reps ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:20s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
