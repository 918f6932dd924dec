#!/usr/bin/env python
"""Interleaved A/B: parity-fill median fast path vs the general path.

The fused Pallas kernel's no-input-flags fast path
(:func:`katsdpsigproc_tpu.models.rfi.pallas_flagger._median_parity_fill`)
pins the windowed median at fixed sorted ranks via ±inf edge fills,
eliminating the valid-count pass and the rank-indexed selection loop.
Passing all-zero ``channel_flags`` forces the general (rank-selected)
path with identical output masks, so the two variants A/B in ONE process
under the honest scan timer (cross-process drift is ±20%; only
interleaved in-process comparisons are decisive — BASELINE_RESULTS.md).

Also times the XLA engine both ways (``edges_only`` static fast path vs
a zero channel-flags run through the NaN-masked path).

Usage:  python scripts/fastpath_ab.py [--baselines 2016] [--channels 32768]
"""

import argparse
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baselines", type=int, default=2016)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--bb", type=int, default=16)
    ap.add_argument("--slab", type=int, default=288)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from katsdpsigproc_tpu.models.rfi import device as rfi_device, pallas_flagger
    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(seed=1)
    shape = (args.channels, args.baselines)
    vis_np = (rs.standard_normal(shape) + 1j * rs.standard_normal(shape)).astype(np.complex64)
    spikes = rs.random_sample(shape) < 1.0 / 64.0
    vis_np += spikes * (rs.random_sample(shape) * 20.0 + 50.0)
    planar = rfi_device.to_planar(vis_np)
    vis = jnp.asarray(planar)
    zflags = jnp.zeros((args.channels,), jnp.uint8)

    def pallas_fast(v):
        return pallas_flagger.flag_dump(
            jnp.swapaxes(v, 0, 1), slab=args.slab, n_sigma=11.0, bb=args.bb)

    def pallas_general(v):
        return pallas_flagger.flag_dump(
            jnp.swapaxes(v, 0, 1), slab=args.slab, n_sigma=11.0, bb=args.bb,
            channel_flags=zflags)

    # PURE fast-path toggle: same NONE-flags pipeline, only the edge-fill
    # fast path switched (background_fast).  The earlier CHANNEL-flags
    # "general" leg conflated the toggle with extra mask arithmetic.
    xla_fast = rfi_device.make_flagger_fn(
        13, 11.0, threshold="sum", baseline_block=min(args.slab, args.baselines),
        background_fast=True)
    xla_general = rfi_device.make_flagger_fn(
        13, 11.0, threshold="sum", baseline_block=min(args.slab, args.baselines),
        background_fast=False)

    # parity first (zero flags must not change the masks)
    a = np.asarray(pallas_fast(vis))
    b = np.asarray(pallas_general(vis))
    print(f"pallas parity fast-vs-general: {(a != b).sum()} mismatches", file=sys.stderr)
    assert (a == b).all()
    c = np.asarray(xla_fast(vis))
    d = np.asarray(xla_general(vis))
    print(f"xla parity fast-vs-general: {(c != d).sum()} mismatches", file=sys.stderr)
    assert (c == d).all()
    assert (a.T == c).all(), "pallas vs xla engine mismatch"

    for name, fn, fargs in [
        ("pallas fast", pallas_fast, (vis,)),
        ("pallas general", pallas_general, (vis,)),
        ("xla fast", xla_fast, (vis,)),
        ("xla general", xla_general, (vis,)),
        ("pallas fast (rep)", pallas_fast, (vis,)),
    ]:
        dt = time_scan(fn, fargs, iters=args.iters)
        nvis = args.channels * args.baselines
        print(f"{name:20s}: {dt * 1e3:8.3f} ms/dump  ({nvis / dt / 1e9:.2f} Gvis/s)")


if __name__ == "__main__":
    main()
