#!/usr/bin/env python
"""Slab-size / one-shot sweep of the headline flagger (on-chip, interleaved).

scripts/stage_ablate.py measured a plain 504-baseline grid call at
~3.3 us/baseline while the headline flag_dump (slab-scan at 288) pays
~6 us/baseline — i.e. the lax.scan slab machinery, not kernel compute,
may now dominate.  Round 2's remote AOT service rejected >=1008-baseline
slabs and ~>=256 MB HBM buffers; this re-tests those ceilings and times
every compiling variant interleaved:

  grid-<slab>   flag_dump(pipeline="grid", slab)   [slab=2016 -> one call]
  dma-<slab>    flag_dump(pipeline="dma", slab)
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

from katsdpsigproc_tpu.models.rfi import pallas_flagger as pf  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--baselines", type=int, default=2016)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--slabs", type=int, nargs="*", default=[288, 504, 1008, 2016])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils.profiling import time_scan

    rs = np.random.RandomState(1)
    vis = jnp.asarray(
        rs.standard_normal((args.baselines, args.channels, 2)).astype(np.float32))

    variants = {}
    for slab in args.slabs:
        variants[f"grid-{slab}"] = (lambda v, s=slab: pf.flag_dump(
            v, slab=s, n_sigma=11.0, bb=args.bb))
    # flag_dump(pipeline="dma") ignores `slab` since round 5 (the
    # in-kernel DMA loop runs the whole dump as one kernel), so a
    # per-slab dma sweep would time the identical program N times.
    variants["dma-oneshot"] = (lambda v: pf.flag_dump(
        v, n_sigma=11.0, bb=args.bb, pipeline="dma"))

    good = {}
    ref = None
    for name, fn in variants.items():
        try:
            got = np.asarray(jax.jit(fn)(vis))
        except Exception as exc:  # noqa: BLE001 — AOT rejections expected
            msg = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
            print(f"{name:10s} FAILED: {msg}", file=sys.stderr)
            continue
        if ref is None:
            ref = got
        elif not np.array_equal(got, ref):
            print(f"{name:10s} RESULT MISMATCH", file=sys.stderr)
            sys.exit(1)
        good[name] = fn

    times = {name: [] for name in good}
    for _ in range(args.reps):
        for name, fn in good.items():
            times[name].append(time_scan(fn, (vis,), iters=args.iters))
    for name in good:
        dt = min(times[name])
        print(f"{name:10s} {dt * 1e3:8.3f} ms/dump  "
              f"({args.baselines * args.channels / dt / 1e9:5.2f} Gvis/s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
