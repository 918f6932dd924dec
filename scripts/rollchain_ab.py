#!/usr/bin/env python
"""Incremental (roll-by-1 chains) vs direct member shifts, interleaved.

The median stage (stage_ablate: 1.29 us/baseline) is ~75% member-shift
cost: 12 independent lane rolls by d = ±1..6 plus 12 sublane rolls.  If
Mosaic lowers a lane roll by ±1 cheaper than by d, building the shifted
copies incrementally (rl_{d+1} = roll(rl_d, 1)) wins; if rolls cost the
same regardless of distance, the 6-deep dependency chains only hurt.
Bit-exact either way (same values, same selects).
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
except ImportError:  # pragma: nocover
    pltpu = None


def _median_incremental(amp, col, width, channels, interpret):
    """_median_parity_fill with incremental lane-roll chains."""
    half = width // 2
    lane = lax.broadcasted_iota(jnp.int32, amp.shape, 1)
    w = amp.shape[-1]
    p0 = jnp.where((col & 1) == 1, -pf._INF, pf._INF)
    p1 = -p0
    # forward (d>0) and backward (d<0) roll chains, one step at a time
    rl = {0: amp}
    for d in range(1, half + 1):
        rl[d] = pf._roll(rl[d - 1], -1, 1, interpret)
        rl[-d] = pf._roll(rl[-(d - 1)], 1, 1, interpret)
    members = []
    for d in range(-half, half + 1):
        if d == 0:
            members.append(amp)
            continue
        x = rl[d]
        if d > 0:
            rs = pf._roll(x, -1, 0, interpret)
            shifted = jnp.where(lane < w - d, x, rs)
            valid = col < channels - d
            q = (d + channels - 1) & 1
        else:
            rs = pf._roll(x, 1, 0, interpret)
            shifted = jnp.where(lane >= -d, x, rs)
            valid = col >= -d
            q = (-d) & 1
        members.append(jnp.where(valid, shifted, p1 if q else p0))
    arrs = list(members)
    from katsdpsigproc_tpu.ops import rank as _rank_ops
    _rank_ops.apply_selection_network(
        arrs, _rank_ops.selection_network(width, (half, half + 1)))
    c_lo, c_hi = arrs[half], arrs[half + 1]
    k = jnp.maximum(half - col, 0) + jnp.maximum(col - (channels - 1 - half), 0)
    n_odd = (k & 1) == 0
    return jnp.where(n_odd, c_lo, (c_lo + c_hi) * jnp.float32(0.5))


def make(median_fn, *, B, C, fold, bb, interpret):
    hh = -(-C // fold)
    block_rows = bb * hh

    def kernel(vis_ref, flags_ref):
        re, im = vis_ref[0], vis_ref[1]
        amp = jnp.sqrt(re * re + im * im)
        rows, ww = amp.shape
        col = ((lax.broadcasted_iota(jnp.int32, amp.shape, 0) % hh) * ww
               + lax.broadcasted_iota(jnp.int32, amp.shape, 1))
        g = pf._band_matrix(rows, hh)
        med = median_fn(amp, col, 13, C, interpret)
        dev = amp - med
        noise = pf._madnz_band(jnp.abs(dev), g, hh, C, interpret)
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
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, fold), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(1)
    vis = jnp.asarray(
        rs.standard_normal((args.baselines, args.channels, 2)).astype(np.float32))
    kw = dict(B=args.baselines, C=args.channels, fold=args.fold, bb=args.bb,
              interpret=args.interpret)
    runs = {"direct": make(pf._median_parity_fill, **kw),
            "chained": make(_median_incremental, **kw)}
    outs = {n: np.asarray(f(vis)) for n, f in runs.items()}
    if not np.array_equal(outs["direct"], outs["chained"]):
        print("PARITY MISMATCH", file=sys.stderr)
        sys.exit(1)
    print("parity: chained == direct (bit-exact)", file=sys.stderr)
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
