#!/usr/bin/env python
"""Hardware parity + timing for the multi-ref (nref) fused flagger.

Checks nref>1 produces identical flags to nref=1 on the chip, then times
a slab at each nref to measure per-grid-step overhead amortization.
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

from katsdpsigproc_tpu.models.rfi import pallas_flagger  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--baselines", type=int, default=252)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--bb", type=int, default=1)
    parser.add_argument("--nrefs", type=str, default="1,2,4")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--interpret", action="store_true")
    args = parser.parse_args()

    rs = np.random.RandomState(3)
    b, c = args.baselines, args.channels
    data = rs.standard_normal((b, c, 2)).astype(np.float32)
    # Plant spikes so the parity comparison is non-vacuous.
    spikes = rs.random_sample((b, c)) < 1.0 / 64.0
    data[..., 0] += (spikes * (rs.random_sample((b, c)) * 20.0 + 50.0)).astype(np.float32)
    vis_t = jnp.asarray(data)
    nrefs = [int(x) for x in args.nrefs.split(",")]

    from katsdpsigproc_tpu.utils.profiling import time_scan

    base = None
    for nref in nrefs:
        if b % (args.bb * nref):
            print(f"nref={nref}: skipped (divisibility)", file=sys.stderr)
            continue
        fn = lambda v, nref=nref: pallas_flagger.flag_transposed(  # noqa: E731
            v, bb=args.bb, nref=nref, interpret=args.interpret
        )
        out = np.asarray(jax.jit(fn)(vis_t))
        if base is None:
            base = out
            print(f"nref={nref}: flag fraction {out.mean():.4f}", file=sys.stderr)
            if out.mean() == 0:
                print("WARNING: zero flags set — parity will be vacuous", file=sys.stderr)
        else:
            mism = int((out != base).sum())
            print(f"nref={nref}: {mism} mismatches vs nref={nrefs[0]}", file=sys.stderr)
            if mism:
                sys.exit(1)
        dt = time_scan(fn, (vis_t,), iters=args.iters)
        print(f"nref={nref}: {dt * 1e3:9.3f} ms/slab", file=sys.stderr)


if __name__ == "__main__":
    main()
