#!/usr/bin/env python
"""Stage-ablation profile of the fused flagger kernel (on-chip).

Times the real block pipeline with one stage at a time replaced by a
near-free stand-in, all variants interleaved in one process; the delta
to the full kernel is that stage's true in-situ cost (traced-op counts
mispredict — the parity-fill fast path cut median ops 2.5x but moved the
headline only ~8%, scripts/fastpath_ab.py).

Variants (semantics of the ablated ones are nonsense; timing-only):
  full         amp -> parity-fill median -> madnz -> SumThreshold -> store
  no_median    med := amp * 0.5
  no_rank      noise := 1.0
  no_thresh    flags := dev > noise (single compare)
  skeleton     flags := amp > 1.0 (amp + iota + store + grid overhead)
"""

import argparse
import functools
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


def make_fn(variant: str, *, bb: int, fold: int, channels: int, width: int,
            interpret: bool):
    hh = -(-channels // fold)
    block_rows = bb * hh

    def kernel(vis_ref, flags_ref):
        re = vis_ref[0]
        im = vis_ref[1]
        amp = jnp.sqrt(re * re + im * im)
        rows, ww = amp.shape
        col = (
            (lax.broadcasted_iota(jnp.int32, amp.shape, 0) % hh) * ww
            + lax.broadcasted_iota(jnp.int32, amp.shape, 1)
        )
        if variant == "skeleton":
            flags_ref[:, :] = (amp > 1.0).astype(jnp.int32).astype(jnp.uint8)
            return
        g = pf._band_matrix(rows, hh)
        if variant == "no_median":
            med = amp * 0.5
        else:
            med = pf._median_parity_fill(amp, col, width, channels, interpret)
        dev = amp - med
        absdev = jnp.abs(dev)
        if variant == "no_rank":
            noise_rows = jnp.ones((rows, 1), jnp.float32)
        else:
            noise_rows = pf._madnz_band(absdev, g, hh, channels, interpret)
        if variant == "no_thresh":
            flags = (dev > noise_rows).astype(jnp.float32)
        else:
            flags = pf._threshold_sum_band(dev, noise_rows, col, channels,
                                           11.0, 4, 1.2, interpret)
        flags_ref[:, :] = flags.astype(jnp.int32).astype(jnp.uint8)

    @jax.jit
    def run(vis_t):
        baselines = vis_t.shape[0]
        folded = jnp.moveaxis(vis_t.reshape(baselines * hh, fold, 2), -1, 0)
        kwargs = {}
        if not interpret and pltpu is not None:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        out = pl.pallas_call(
            kernel,
            grid=(baselines // bb,),
            in_specs=[pl.BlockSpec((2, block_rows, fold), lambda i: (0, i, 0),
                                   memory_space=_VMEM)],
            out_specs=pl.BlockSpec((block_rows, fold), lambda i: (i, 0),
                                   memory_space=_VMEM),
            out_shape=jax.ShapeDtypeStruct((baselines * hh, fold), jnp.uint8),
            interpret=interpret,
            **kwargs,
        )(folded)
        return out

    return run


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--baselines", type=int, default=504)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--fold", type=int, default=1024)
    ap.add_argument("--width", type=int, default=13)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(1)
    vis = jnp.asarray(
        rs.standard_normal((args.baselines, args.channels, 2)).astype(np.float32))

    variants = ["full", "no_median", "no_rank", "no_thresh", "skeleton"]
    fns = {
        v: make_fn(v, bb=args.bb, fold=args.fold, channels=args.channels,
                   width=args.width, interpret=args.interpret)
        for v in variants
    }
    for v in variants:  # compile everything before any timing
        np.asarray(fns[v](vis))

    times = {v: [] for v in variants}
    for _ in range(args.reps):
        for v in variants:
            times[v].append(time_scan(fns[v], (vis,), iters=args.iters))
    t = {v: min(ts) for v, ts in times.items()}
    us_bl = {v: t[v] / args.baselines * 1e6 for v in variants}
    for v in variants:
        print(f"{v:10s} {t[v] * 1e3:8.3f} ms  ({us_bl[v]:5.2f} us/baseline)",
              file=sys.stderr)
    full = us_bl["full"]
    for v, label in (("no_median", "median"), ("no_rank", "rank"),
                     ("no_thresh", "threshold")):
        print(f"stage {label:10s} ~ {full - us_bl[v]:5.2f} us/baseline",
              file=sys.stderr)
    print(f"stage skeleton   ~ {us_bl['skeleton']:5.2f} us/baseline "
          f"(amp+store+grid)", file=sys.stderr)


if __name__ == "__main__":
    main()
