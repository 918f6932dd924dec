#!/usr/bin/env python
"""Cost model for the background windowed-median stage (honest harness).

Decomposes the stage's time into data movement vs. network compute by
timing variants with known op counts on one slab:

* ``loads13``    — the 13 shifted window reads + masks + an add tree only
                   (no sorting): the data-choreography floor of the
                   current formulation.
* ``net78``      — shipped engine (pruned Batcher, 78 min/max).
* ``net96``      — unpruned Batcher (96 min/max): with loads13 this gives
                   the marginal cost per vector op (slope).
* ``count``      — compare-count engine (~156 compare+add).
* ``gw_floor``   — the Gil-Werman data choreography only: segment reshape,
                   per-offset strided slices of both neighbouring
                   segments, add tree, interleave back.  If this floor is
                   well below ``net78``, a full GW implementation (which
                   replaces the 78-op network with ~50 equivalent ops at
                   2 loads/output) is worth building; if the choreography
                   alone costs as much as the network, it is not.

Interpretation: time(variant) = choreography + slope * ops.
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
from katsdpsigproc_tpu.ops import rank as rank_ops  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def _windows(amp, width):
    h = width // 2
    c = amp.shape[0]
    padded = jnp.pad(amp, ((h, h), (0, 0)), constant_values=jnp.nan)
    return [padded[k : k + c] for k in range(width)]


def loads13(amp, width=13):
    win = _windows(amp, width)
    nan = [jnp.isnan(w) for w in win]
    n = sum((~m).astype(jnp.int32) for m in nan)
    s = sum(jnp.where(m, 0.0, w) for w, m in zip(win, nan))
    return s, n


def net_full(amp, width=13):
    """Unpruned Batcher (96 ops at width 13) with the shipped selection."""
    win = _windows(amp, width)
    nan = [jnp.isnan(w) for w in win]
    n = sum((~m).astype(jnp.int32) for m in nan)
    inf = jnp.float32(np.inf)
    arrs = [jnp.where(m, inf, w) for w, m in zip(win, nan)]
    for i, j in rank_ops.batcher_pairs(width):
        a, b = arrs[i], arrs[j]
        arrs[i] = jnp.minimum(a, b)
        arrs[j] = jnp.maximum(a, b)
    lo, hi = (n - 1) // 2, n // 2
    v_lo = v_hi = jnp.zeros(amp.shape, amp.dtype)
    for k in range(width // 2 + 1):
        vk = jnp.where(arrs[k] == inf, 0.0, arrs[k])
        v_lo = v_lo + jnp.where(lo == k, vk, 0.0)
        v_hi = v_hi + jnp.where(hi == k, vk, 0.0)
    med = (v_lo + v_hi) * 0.5
    return jnp.where(n > 0, med, jnp.nan), n


def gw_floor(amp, width=13):
    """Gil-Werman data choreography only (no sorting): segment the channel
    axis, and for each in-segment offset r combine the suffix of segment k
    with the prefix of segment k+1 by plain adds, then interleave back."""
    h = width // 2
    c, b = amp.shape
    # Window q covers padded[q : q+width]; segment grid over the padded axis.
    nseg = -(-(c + 2 * h) // width) + 1
    padded = jnp.pad(
        amp, ((h, nseg * width - c - h), (0, 0)), constant_values=jnp.nan
    )
    seg = padded.reshape(nseg, width, b)
    nxt = jnp.concatenate([seg[1:], jnp.full((1, width, b), jnp.nan, amp.dtype)], 0)
    outs = []
    counts = []
    for r in range(width):
        suf = [seg[:, k] for k in range(r, width)]
        pre = [nxt[:, k] for k in range(r)]
        members = suf + pre
        masks = [jnp.isnan(m) for m in members]
        nr = sum((~m).astype(jnp.int32) for m in masks)
        sr = sum(jnp.where(m, 0.0, v) for v, m in zip(members, masks))
        outs.append(sr)
        counts.append(nr)
    out = jnp.stack(outs, axis=1).reshape(nseg * width, b)[:c]
    n = jnp.stack(counts, axis=1).reshape(nseg * width, b)[:c]
    return out, n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--baselines", type=int, default=256)
    parser.add_argument("--width", type=int, default=13)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    rs = np.random.RandomState(1)
    amp_np = np.abs(rs.standard_normal((args.channels, args.baselines))).astype(np.float32)
    amp_np[rs.random_sample(amp_np.shape) < 0.02] = np.nan
    amp = jnp.asarray(amp_np)
    w = args.width

    # sanity: gw_floor's sum/count must equal loads13's (same windows).
    s0, n0 = jax.jit(lambda a: loads13(a, w))(amp)
    s1, n1 = jax.jit(lambda a: gw_floor(a, w))(amp)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    print("gw_floor choreography parity OK", file=sys.stderr)

    variants = {
        "loads13": lambda a: loads13(a, w),
        "net78": lambda a: rfi_device.masked_median_filter(a, w, engine="network"),
        "net96": lambda a: net_full(a, w),
        "count": lambda a: rfi_device.masked_median_filter(a, w, engine="count"),
        "gw_floor": lambda a: gw_floor(a, w),
    }
    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t = time_scan(fn, (amp,), iters=args.iters) * 1e3
            times[name].append(t)
            print(f"rep{rep} {name:10s} {t:8.3f} ms", file=sys.stderr, flush=True)
    print("\n=== min of reps ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:10s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
