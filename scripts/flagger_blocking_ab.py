#!/usr/bin/env python
"""In-process A/B of blocked-flagger configurations (honest scan harness).

Cross-process timings on the tunneled TPU drift by multiple ms run to run,
so config choices (slab size, blocking impl, stage layout) must be decided
by interleaved measurements inside ONE process: each variant is timed
`--reps` times in round-robin order and the per-variant minimum is
reported (the minimum is drift-robust; the spread shows the noise).
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from katsdpsigproc_tpu.models.rfi import device as rfi_device  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--baselines", type=int, default=2016)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--slabs", type=int, nargs="*", default=[168, 252])
    args = parser.parse_args()

    c, b = args.channels, args.baselines
    rs = np.random.RandomState(1)
    vis = jnp.asarray(rs.standard_normal((c, b, 2)).astype(np.float32))

    variants = {}
    for slab in args.slabs:
        for layout in ("transposed", "straight"):
            variants[f"slab{slab}/{layout}/slice"] = rfi_device.make_flagger_fn(
                13, 11.0, threshold="sum", baseline_block=slab, layout=layout,
                block_impl="slice",
            )
        variants[f"slab{slab}/transposed/scan"] = rfi_device.make_flagger_fn(
            13, 11.0, threshold="sum", baseline_block=slab, block_impl="scan",
        )
        variants[f"slab{slab}/straight/unroll"] = rfi_device.make_flagger_fn(
            13, 11.0, threshold="sum", baseline_block=slab, layout="straight",
            block_impl="unroll",
        )
        variants[f"slab{slab}/straight/pad"] = rfi_device.make_flagger_fn(
            13, 11.0, threshold="sum", baseline_block=slab, layout="straight",
            block_impl="pad",
        )

    times = {name: [] for name in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t = time_scan(fn, (vis,), iters=args.iters)
            times[name].append(t * 1e3)
            print(f"rep{rep} {name:30s} {t * 1e3:8.3f} ms", file=sys.stderr, flush=True)

    print("\n=== per-variant min (spread) ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:30s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
