#!/usr/bin/env python
"""A/B of SumThreshold engine formulations on the chip.

threshold_sum is ~0.44 ms of the ~1.5 ms per-slab flagger block but its
flop floor is ~0.1 ms; candidates attack the suspected overheads (bool
carrier relayout, pad materialization):

* shipped — bool flags, shifted slice adds for window sums, pad+OR
  dilation (models.rfi.device.threshold_sum).
* rw      — window sums and dilation via ``lax.reduce_window``
            (near-free for the twodflag box sums, scripts/boxsum_ab.py).
* f32     — flag state carried as float32 0/1 (select/max instead of
            bool ops); uint8 conversion at the end.

All variants must match the shipped engine bit-for-bit (it is
oracle-verified by the test suite and bench.py).
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
from jax import lax  # noqa: E402

from katsdpsigproc_tpu.models.rfi import device as rfi_device  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def threshold_sum_rw(deviations, noise, n_sigma, n_windows=4, threshold_falloff=1.2):
    """Straight layout (channels, baselines); reduce_window sums/dilation."""
    channels = deviations.shape[0]
    flags = jnp.zeros(deviations.shape, bool)
    base = (n_sigma * noise).astype(jnp.float32)[None, :]
    for w in range(n_windows):
        window = 1 << w
        if window > channels:
            break
        threshold = (base * np.float32(threshold_falloff ** -w)).astype(jnp.float32)
        clamped = jnp.where(flags, threshold, deviations)
        if window == 1:
            sums = clamped
        else:
            sums = lax.reduce_window(
                clamped, 0.0, lax.add, (window, 1), (1, 1), "valid")
        sum_flags = sums > threshold * window
        if window == 1:
            new_flags = sum_flags
        else:
            new_flags = lax.reduce_window(
                sum_flags, False, lax.bitwise_or, (window, 1), (1, 1),
                [(window - 1, window - 1), (0, 0)])
        flags = flags | new_flags
    return jnp.where(flags, jnp.uint8(1), jnp.uint8(0))


def threshold_sum_f32(deviations, noise, n_sigma, n_windows=4, threshold_falloff=1.2):
    """Straight layout; flag state carried as float32 0/1."""
    channels = deviations.shape[0]
    flags = jnp.zeros(deviations.shape, jnp.float32)
    base = (n_sigma * noise).astype(jnp.float32)[None, :]
    for w in range(n_windows):
        window = 1 << w
        if window > channels:
            break
        threshold = (base * np.float32(threshold_falloff ** -w)).astype(jnp.float32)
        clamped = jnp.where(flags > 0, threshold, deviations)
        sums = lax.slice_in_dim(clamped, 0, channels - window + 1, axis=0)
        for j in range(1, window):
            sums = sums + lax.slice_in_dim(clamped, j, channels - window + 1 + j, axis=0)
        sum_flags = (sums > threshold * window).astype(jnp.float32)
        pad = [(window - 1, window - 1), (0, 0)]
        dil = jnp.pad(sum_flags, pad)
        new = lax.slice_in_dim(dil, 0, channels, axis=0)
        for j in range(1, window):
            new = jnp.maximum(new, lax.slice_in_dim(dil, j, channels + j, axis=0))
        flags = jnp.maximum(flags, new)
    return (flags > 0).astype(jnp.uint8)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--slab", type=int, default=256)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    dev = rs.standard_normal((args.channels, args.slab)).astype(np.float32)
    dev[5000:5040] += 8.0  # planted outliers so flags actually spread
    noise = np.abs(rs.standard_normal(args.slab)).astype(np.float32) + 0.5
    dev_j, noise_j = jnp.asarray(dev), jnp.asarray(noise)

    shipped = lambda d, n: rfi_device.threshold_sum(d, n, 3.0, transposed=False)
    variants = {
        "shipped": shipped,
        "rw": lambda d, n: threshold_sum_rw(d, n, 3.0),
        "f32": lambda d, n: threshold_sum_f32(d, n, 3.0),
    }

    ref = np.asarray(jax.jit(shipped)(dev_j, noise_j))
    assert ref.any(), "no flags planted?"
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(dev_j, noise_j))
        mism = int((got != ref).sum())
        print(f"{name:8s} parity: {mism} mismatches "
              f"({int(got.sum())} flags)", file=sys.stderr, flush=True)
        if mism:
            raise SystemExit("parity FAILED")

    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t = time_scan(fn, (dev_j, noise_j), iters=args.iters) * 1e3
            times[name].append(t)
            print(f"rep{rep} {name:8s} {t:8.3f} ms", file=sys.stderr, flush=True)
    print("\n=== min of reps ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:8s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
