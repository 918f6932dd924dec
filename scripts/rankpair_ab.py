#!/usr/bin/env python
"""Speculative paired rank rounds vs binary, interleaved on-chip.

The fused kernel's 31-round bitwise rank search is a sequential
reduce→matmul→select dependency chain.  ``rank_pair`` resolves two bits
per step from three mutually-independent counts (hi, lo, hi|lo) — 16
dependency stages instead of 31 — at ~4 extra cheap vector ops per pair.
Wins iff the chain is latency-bound rather than throughput-bound.

Parity: identical cur/count invariants, so masks must match bit-for-bit
(asserted here before timing, plus interpret-mode tests in
tests/rfi/test_pallas_flagger.py).
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
from jax.experimental import pallas as pl  # noqa: E402

from katsdpsigproc_tpu.models.rfi import pallas_flagger as pf  # noqa: E402

try:
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except ImportError:  # pragma: nocover
    pltpu = None
    _VMEM = None


def make(variant_kw: dict, *, B, C, fold, bb, interpret):
    hh = -(-C // fold)
    block_rows = bb * hh

    def kernel(vis_ref, flags_ref):
        re, im = vis_ref[0], vis_ref[1]
        amp = jnp.sqrt(re * re + im * im)
        rows, ww = amp.shape
        col = ((lax.broadcasted_iota(jnp.int32, amp.shape, 0) % hh) * ww
               + lax.broadcasted_iota(jnp.int32, amp.shape, 1))
        g = pf._band_matrix(rows, hh)
        med = pf._median_parity_fill(amp, col, 13, C, interpret)
        dev = amp - med
        noise = pf._madnz_band(jnp.abs(dev), g, hh, C, interpret, **variant_kw)
        flags = pf._threshold_sum_band(dev, noise, col, C, 11.0, 4, 1.2, interpret)
        flags_ref[:, :] = flags.astype(jnp.int32).astype(jnp.uint8)

    @jax.jit
    def run(vis_t):
        folded = jnp.moveaxis(vis_t.reshape(B * hh, fold, 2), -1, 0)
        kwargs = {}
        if not interpret and pltpu is not None:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kernel, grid=(B // bb,),
            in_specs=[pl.BlockSpec((2, block_rows, fold), lambda i: (0, i, 0),
                                   memory_space=_VMEM)],
            out_specs=pl.BlockSpec((block_rows, fold), lambda i: (i, 0),
                                   memory_space=_VMEM),
            out_shape=jax.ShapeDtypeStruct((B * hh, fold), jnp.uint8),
            interpret=interpret,
            **kwargs,
        )(folded)

    return run


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--baselines", type=int, default=2016)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--fold", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(1)
    vis = jnp.asarray(
        rs.standard_normal((args.baselines, args.channels, 2)).astype(np.float32))

    kw = dict(B=args.baselines, C=args.channels, fold=args.fold, bb=args.bb,
              interpret=args.interpret)
    runs = {
        "binary": make({}, **kw),
        "pair_i32": make({"rank_pair": True}, **kw),
        "pair_f32": make({"rank_pair": "f32"}, **kw),
        "zeros_fold": make({"zeros_fold": True}, **kw),
    }
    outs = {n: np.asarray(f(vis)) for n, f in runs.items()}
    for n in runs:
        if not np.array_equal(outs["binary"], outs[n]):
            print(f"PARITY MISMATCH: {n}", file=sys.stderr)
            sys.exit(1)
    print("parity: all variants == binary (bit-exact)", file=sys.stderr)

    times = {n: [] for n in runs}
    for _ in range(args.reps):
        for n, f in runs.items():
            times[n].append(time_scan(f, (vis,), iters=args.iters))
    for n in runs:
        ts = sorted(times[n])
        print(f"{n:8s} min {ts[0] * 1e3:8.3f} ms  med {ts[len(ts) // 2] * 1e3:8.3f} ms  "
              f"all={['%.2f' % (t * 1e3) for t in times[n]]}", file=sys.stderr)


if __name__ == "__main__":
    main()
