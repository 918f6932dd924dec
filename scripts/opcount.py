#!/usr/bin/env python
"""Per-stage full-block vector-op census of the fused flagger kernel.

The fused Pallas kernel is pure-VPU-compute-bound (BASELINE_RESULTS.md:
bb>=8 saturates at ~8.5 ns per (32, 1024) f32 op -- VPU peak), so the
number of full-block-sized jaxpr equations is the cost model.  This
script traces each pipeline stage at the headline block shape and counts
equations by output size, attributing them to stages:

  amp / layout : planar load, amplitude, iotas
  median       : parity-fill fast path (or the general masked median)
  madnz        : 31-round bitwise rank search + halfway correction
  threshold    : SumThreshold ladders
  cast         : f32 0/1 flags -> uint8 output

An op is "full-block" if its output has R*W elements (rank-loop bodies
are counted once per round).  Sub-block ops (e.g. (R, 1) band columns)
are tallied separately -- they cost ~W times less.

Usage: python scripts/opcount.py [--bb 8] [--fold 1024] [--channels 32768]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax import lax

from katsdpsigproc_tpu.models.rfi import pallas_flagger as pf


def census(fn, *args, rows, ww, label, rank_rounds=0):
    """Count full-block / sub-block eqns of `fn` traced at *args."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    full = rows * ww
    n_full = 0
    n_sub = 0

    def walk(jx, mult):
        nonlocal n_full, n_sub
        for eqn in jx.eqns:
            inner = [v for v in eqn.params.values() if hasattr(v, "jaxpr")]
            if eqn.primitive.name in ("scan", "while"):
                # fori_loop bodies execute once per round
                for v in inner:
                    walk(v.jaxpr, mult * max(rank_rounds, 1))
                continue
            if inner:
                for v in inner:
                    walk(v.jaxpr if hasattr(v, "jaxpr") else v, mult)
                continue
            for out in eqn.outvars:
                sz = int(np.prod(out.aval.shape)) if out.aval.shape else 1
                if sz >= full:
                    n_full += mult
                elif sz >= rows:  # band/row columns
                    n_sub += mult
        return

    walk(jaxpr.jaxpr, 1)
    print(f"{label:12s} full-block ops: {n_full:4d}   sub-block: {n_sub:4d}")
    return n_full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--fold", type=int, default=1024)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--width", type=int, default=13)
    args = ap.parse_args()

    channels, fold = args.channels, args.fold
    hh = -(-channels // fold)
    rows = args.bb * hh
    ww = fold
    print(f"block: ({rows}, {ww})  bb={args.bb} h={hh} channels={channels}")

    amp = jnp.zeros((rows, ww), jnp.float32)
    col = (
        (lax.broadcasted_iota(jnp.int32, amp.shape, 0) % hh) * ww
        + lax.broadcasted_iota(jnp.int32, amp.shape, 1)
    )
    g = pf._band_matrix(rows, hh)

    total = 0

    # --- amplitude + iotas (approximated by tracing the prologue) ---
    def prologue(re, im):
        a = jnp.sqrt(re * re + im * im)
        c = (
            (lax.broadcasted_iota(jnp.int32, a.shape, 0) % hh) * ww
            + lax.broadcasted_iota(jnp.int32, a.shape, 1)
        )
        return a, c

    total += census(prologue, amp, amp, rows=rows, ww=ww, label="amp+iota")

    # --- median: parity-fill fast path ---
    fast = functools.partial(pf._median_parity_fill, width=args.width,
                             channels=channels, interpret=True, h=hh)
    total += census(lambda a, c: fast(a, c), amp, col, rows=rows, ww=ww,
                    label="median-fast")

    # --- median: general path (for reference) ---
    def general(a, c):
        half = args.width // 2
        members = []
        for d in range(-half, half + 1):
            shifted = pf._shift_channels(a, d, True, h=hh)
            valid = (c + d >= 0) & (c + d < channels)
            members.append(jnp.where(valid, shifted, pf._INF))
        n = jnp.zeros(a.shape, jnp.int32)
        for d in range(-half, half + 1):
            n = n + ((c + d >= 0) & (c + d < channels)).astype(jnp.int32)
        return pf._masked_median_rows(members, n, args.width)

    census(general, amp, col, rows=rows, ww=ww, label="median-gen")

    # --- deviations + madnz ---
    def madnz(a, med):
        dev = a - med
        absdev = jnp.abs(dev)
        return pf._madnz_band(absdev, g, hh, channels, True)

    total += census(madnz, amp, amp, rows=rows, ww=ww, label="madnz",
                    rank_rounds=31)

    # --- threshold ---
    def thr(dev, noise):
        return pf._threshold_sum_band(dev, noise, col, channels, 11.0, 4, 1.2, True, hh)

    total += census(thr, amp, jnp.zeros((rows, 1), jnp.float32), rows=rows,
                    ww=ww, label="threshold")

    # --- output cast ---
    def cast(f):
        return (f * 1).astype(jnp.int32).astype(jnp.uint8)

    total += census(cast, amp, rows=rows, ww=ww, label="cast")

    print(f"{'TOTAL':12s} full-block ops: {total:4d} (fast-path pipeline)")
    # VPU cost model: 8.5 ns per (32, 1024) op => scale by rows/32
    ns_per_op = 8.5 * rows / 32.0
    per_block_us = total * ns_per_op / 1e3
    per_bl_us = per_block_us / args.bb
    print(f"model: {per_block_us:.1f} us/block, {per_bl_us:.2f} us/baseline, "
          f"{per_bl_us * 2016 / 1e3:.2f} ms/dump @2016 baselines")


if __name__ == "__main__":
    main()
