#!/usr/bin/env python
"""A/B of box-window-sum engines for twodflag's Gaussian background.

``_box_sum_axis`` (centred width-(2r+1) window sum, zero padding) is the
inner loop of ``_box_gaussian_filter``: 4 passes × 2 axes × (data, weight)
per masked filter call, and the 2-D background is ~2/3 of the twodflag
pipeline.  Engines:

* reduce_window — shipped: ``lax.reduce_window`` with the full window.
* shifts        — pad once, then 2r+1 shifted slice adds (one fusion).
* cumsum32      — inclusive cumsum + clamped slice difference, float32.

(A float64-accumulator cumsum — the reference's precision,
twodflag.py:284-307 — is NOT timed: without ``jax_enable_x64`` JAX
silently truncates float64 to float32, and enabling x64 globally would
change every other variant's dtypes.  cumsum32 already loses by 40x, so
the f64 variant could only lose by more.)

Engines are timed on the twodflag profile shapes and checked against
reduce_window (exact for shifts; tolerance for cumsum, whose
association differs).
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

from katsdpsigproc_tpu.models.rfi import twodflag  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def box_shifts(x, r, axis):
    d = 2 * r + 1
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad)
    out = lax.slice_in_dim(xp, 0, x.shape[axis], axis=axis)
    for j in range(1, d):
        out = out + lax.slice_in_dim(xp, j, x.shape[axis] + j, axis=axis)
    return out


def box_cumsum(x, r, axis, dtype):
    """out[i] = C[min(i+r, n-1)] - C[i-r-1], C = inclusive cumsum (C[<0]=0)."""
    d = 2 * r + 1
    n = x.shape[axis]
    c = jnp.cumsum(x.astype(dtype), axis=axis)
    zlead = jnp.zeros_like(lax.slice_in_dim(c, 0, 1, axis=axis))
    zlead = jnp.concatenate([zlead] * (r + 1), axis=axis)
    tail = lax.slice_in_dim(c, n - 1, n, axis=axis)
    tail = jnp.concatenate([tail] * r, axis=axis)  # clamp: prefix past end = total
    cp = jnp.concatenate([zlead, c, tail], axis=axis)
    hi = lax.slice_in_dim(cp, d, d + n, axis=axis)
    lo = lax.slice_in_dim(cp, 0, n, axis=axis)
    return (hi - lo).astype(x.dtype)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--time", type=int, default=120)
    parser.add_argument("--channels", type=int, default=1024)
    parser.add_argument("--baselines", type=int, default=8)
    parser.add_argument("--radius", type=int, default=10)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.standard_normal(
        (args.baselines, args.time, args.channels)).astype(np.float32))
    r = args.radius

    def both_axes(box):
        def fn(x):
            y = box(x, r, 1)
            return box(y, r, 2)
        return fn

    variants = {
        "reduce_window": both_axes(lambda x, r, ax: twodflag._box_sum_axis(x, r, ax)),
        "shifts": both_axes(box_shifts),
        "cumsum32": both_axes(lambda x, r, ax: box_cumsum(x, r, ax, jnp.float32)),
    }

    ref = np.asarray(jax.jit(variants["reduce_window"])(x))
    scale = np.abs(ref).max()
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(x))
        if name in ("reduce_window", "shifts"):
            ok = np.array_equal(got, ref)
        else:
            ok = np.allclose(got, ref, rtol=1e-4, atol=1e-3 * scale)
        print(f"{name:14s} parity: {'OK' if ok else 'FAIL'}"
              f" (max |diff| {np.abs(got - ref).max():.3e})", file=sys.stderr, flush=True)
        if not ok:
            raise SystemExit("parity FAILED")

    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t = time_scan(fn, (x,), iters=args.iters) * 1e3
            times[name].append(t)
            print(f"rep{rep} {name:14s} {t:8.3f} ms", file=sys.stderr, flush=True)
    print("\n=== min of reps ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:14s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
