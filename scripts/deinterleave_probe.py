#!/usr/bin/env python
"""Can Mosaic deinterleave trailing-planar pairs in-kernel, and at what cost?

The headline input is channel-major trailing-planar (C, B, 2) float32 (the
planar image of the reference's complex64 ingest).  The fused kernel wants
planar-LEADING folded (2, R, W) blocks, so XLA materializes a 528 MB corner
turn before the pallas_call.  If the kernel could consume (R, 2*W) blocks
(a FREE reshape of the same HBM bytes) and split re/im in VMEM, that copy
disappears.  This probes the candidate in-kernel splits for Mosaic
support + cost, with parity against the reference amp:

  slice     re = blk[:, 0::2]               (strided lane slice)
  reshape   re = blk.reshape(r, W, 2)[..., 0]
  rollsum   s = blk^2 + roll(blk^2, 1); amp2 = s[:, 1::2]
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
from jax.experimental import pallas as pl  # noqa: E402

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: nocover
    pltpu = None


def make(variant: str, rows: int, ww: int, grid: int):
    def kernel(x_ref, o_ref):
        blk = x_ref[...]  # (rows, 2*ww) interleaved re/im pairs
        if variant == "slice":
            re = blk[:, 0::2]
            im = blk[:, 1::2]
            o_ref[...] = jnp.sqrt(re * re + im * im)
        elif variant == "reshape":
            b3 = blk.reshape(blk.shape[0], ww, 2)
            re = b3[..., 0]
            im = b3[..., 1]
            o_ref[...] = jnp.sqrt(re * re + im * im)
        elif variant == "rollsum":
            sq = blk * blk
            s = sq + pltpu.roll(sq, 1, 1)
            o_ref[...] = jnp.sqrt(s[:, 1::2])
        else:
            raise ValueError(variant)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, 2 * ww), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, ww), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * rows, ww), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return run


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--grid", type=int, default=252)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(1)
    host = rs.standard_normal(
        (args.grid * args.rows, 2 * args.width)).astype(np.float32)
    x = jnp.asarray(host)
    pairs = host.reshape(args.grid * args.rows, args.width, 2)
    expected = np.sqrt(pairs[..., 0] ** 2 + pairs[..., 1] ** 2)

    good = {}
    for v in ("slice", "reshape", "rollsum"):
        run = make(v, args.rows, args.width, args.grid)
        try:
            got = np.asarray(run(x))
        except Exception as exc:  # noqa: BLE001 — Mosaic rejections expected
            msg = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
            print(f"{v:8s} FAILED: {msg}", file=sys.stderr)
            continue
        ok = np.allclose(got, expected, rtol=1e-6, atol=0)
        print(f"{v:8s} compiles; parity {'OK' if ok else 'MISMATCH'}", file=sys.stderr)
        if ok:
            good[v] = run

    times = {v: [] for v in good}
    for _ in range(args.reps):
        for v, run in good.items():
            times[v].append(time_scan(run, (x,), iters=args.iters))
    for v in good:
        dt = min(times[v])
        print(f"{v:8s} {dt * 1e3:8.3f} ms per {args.grid}-block pass", file=sys.stderr)


if __name__ == "__main__":
    main()
