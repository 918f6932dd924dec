#!/usr/bin/env python
"""Per-stage timing of the 1-D XLA flagger engine (honest scan harness).

Stages on one (channels, slab-baselines) block: background median filter,
madnz (radix 1 vs 4), SumThreshold, and the composed block function.
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
from katsdpsigproc_tpu.ops import rank as rank_ops  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--baselines", type=int, default=252)
    parser.add_argument("--width", type=int, default=13)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--full-baselines", type=int, default=0,
                        help="Also time full-dump variants at this many baselines")
    args = parser.parse_args()

    c, b = args.channels, args.baselines
    rs = np.random.RandomState(1)
    planar = rs.standard_normal((c, b, 2)).astype(np.float32)
    vis = jnp.asarray(planar)
    dev_np = rs.standard_normal((b, c)).astype(np.float32)
    dev_t = jnp.asarray(dev_np)

    def timeit(name, fn, *xs):
        t = time_scan(fn, xs, iters=args.iters)
        print(f"{name:28s} {t * 1e3:9.3f} ms", file=sys.stderr)

    nbf = rfi_device.BackgroundFlags.NONE

    timeit("background_median_filter",
           lambda v: rfi_device.background_median_filter(v, None, args.width, False, nbf), vis)
    timeit("background + transpose",
           lambda v: jnp.swapaxes(
               rfi_device.background_median_filter(v, None, args.width, False, nbf), 0, 1), vis)
    for bits in (1, 2, 4):
        timeit(f"madnz radix{2**bits}",
               lambda d, bits=bits: MAD_NORMAL * rank_ops.median_non_zero(
                   jnp.abs(d), radix_bits=bits), dev_t)
    noise = jnp.asarray(np.abs(rs.standard_normal(b)).astype(np.float32))
    timeit("threshold_sum",
           lambda d: rfi_device.threshold_sum(d, noise, 11.0), dev_t)
    timeit("madnz straight (axis=0)",
           lambda d: MAD_NORMAL * rank_ops.median_non_zero(jnp.abs(d), axis=0),
           jnp.asarray(dev_np.T.copy()))
    fn = rfi_device.make_flagger_fn(args.width, 11.0, threshold="sum")
    timeit("full block_fn", fn, vis)
    fn_s = rfi_device.make_flagger_fn(args.width, 11.0, threshold="sum", layout="straight")
    timeit("full block_fn straight", fn_s, vis)

    if args.full_baselines:
        fb = args.full_baselines
        planar_full = rs.standard_normal((c, fb, 2)).astype(np.float32)
        vis_full = jnp.asarray(planar_full)
        timeit(f"unblocked full ({fb} bl)",
               rfi_device.make_flagger_fn(args.width, 11.0, threshold="sum"), vis_full)
        for blk in (252, 504):
            if fb % blk == 0 or fb > blk:
                timeit(
                    f"blocked {blk} full ({fb} bl)",
                    rfi_device.make_flagger_fn(
                        args.width, 11.0, threshold="sum", baseline_block=blk
                    ),
                    vis_full,
                )
        for blk in (126, 252):
            timeit(
                f"blocked {blk} straight ({fb} bl)",
                rfi_device.make_flagger_fn(
                    args.width, 11.0, threshold="sum", baseline_block=blk,
                    layout="straight",
                ),
                vis_full,
            )


if __name__ == "__main__":
    main()
