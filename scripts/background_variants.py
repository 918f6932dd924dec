#!/usr/bin/env python
"""Timing of masked windowed-median background formulations (honest harness).

compare-count — the shipped engine (O(W²) compares, wide and shallow)
batcher       — Batcher odd-even sort network on +inf-masked members
                (48 min/max exchanges for W=13, long dependency chain)
Both produce identical medians (reference even-count averaging).
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

from katsdpsigproc_tpu.models.rfi import device as rfi_device  # noqa: E402
from katsdpsigproc_tpu.models.rfi.pallas_flagger import _batcher_pairs  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def batcher_median_filter(amp, width: int):
    """masked_median_filter semantics via a sorting network (+inf absent)."""
    h = width // 2
    c = amp.shape[0]
    inf = jnp.float32(np.inf)
    padded = jnp.pad(amp, ((h, h),) + ((0, 0),) * (amp.ndim - 1), constant_values=jnp.nan)
    win = [padded[k : k + c] for k in range(width)]
    nan = [jnp.isnan(w) for w in win]
    n = sum((~m).astype(jnp.int32) for m in nan)
    arrs = [jnp.where(m, inf, w) for w, m in zip(win, nan)]
    for i, j in _batcher_pairs(width):
        a, b = arrs[i], arrs[j]
        arrs[i] = jnp.minimum(a, b)
        arrs[j] = jnp.maximum(a, b)
    lo = (n - 1) // 2
    hi = n // 2
    v_lo = jnp.zeros(amp.shape, amp.dtype)
    v_hi = jnp.zeros(amp.shape, amp.dtype)
    for k in range(width):
        vk = jnp.where(arrs[k] == inf, 0.0, arrs[k])
        v_lo = v_lo + jnp.where(lo == k, vk, 0.0)
        v_hi = v_hi + jnp.where(hi == k, vk, 0.0)
    med = (v_lo + v_hi) * 0.5
    return jnp.where(n > 0, med, jnp.nan), n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--baselines", type=int, default=252)
    parser.add_argument("--width", type=int, default=13)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    amp_np = np.abs(rs.standard_normal((args.channels, args.baselines))).astype(np.float32)
    amp_np[rs.random_sample(amp_np.shape) < 0.02] = np.nan
    amp = jnp.asarray(amp_np)

    variants = [
        ("compare-count", lambda a: rfi_device.masked_median_filter(a, args.width)),
        ("batcher", lambda a: batcher_median_filter(a, args.width)),
    ]
    expected = None
    for name, fn in variants:
        med, n = jax.jit(fn)(amp)
        got = np.asarray(med)
        if expected is None:
            expected = got
        else:
            same = np.array_equal(got, expected, equal_nan=True)
            if not same:
                bad = np.nansum(got != expected)
                print(f"{name}: MISMATCH ({bad})", file=sys.stderr)
                sys.exit(1)
        dt = time_scan(lambda a, f=fn: f(a)[0], (amp,), iters=args.iters)
        print(f"{name:14s} {dt * 1e3:9.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
