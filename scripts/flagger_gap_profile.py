#!/usr/bin/env python
"""Where does the blocked full-dump flagger lose time vs. 8 x one slab?

The per-slab pipeline profile (scripts/flagger1d_profile.py) sums to
~10 ms/dump at slab 252, but the headline blocked run measures ~15.5 ms.
This script decomposes the gap with interleaved in-process measurements:

* ``trivial``          — jnp.sum over the dump (scan-harness floor)
* ``skeleton``         — the fori_loop + dynamic_slice + dynamic_update
                         machinery with a near-free body (slice traffic only)
* ``slab_standalone``  — the unblocked pipeline on ONE (C, slab) input
                         (multiply by nb for the "ideal" dump time)
* ``blocked_slice``    — the shipped headline config
* ``noblock``          — the whole dump in one unblocked fusion
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

from katsdpsigproc_tpu.models.rfi import device as rfi_device  # noqa: E402
from katsdpsigproc_tpu.utils.profiling import time_scan  # noqa: E402


def make_skeleton(slab: int):
    """The blocked_slice control structure with a near-free body."""

    def cheap(v):
        return (v[..., 0] > 0.0).astype(jnp.uint8)

    @jax.jit
    def fn(vis):
        c, b = vis.shape[:2]
        nb = b // slab

        def body(i, out):
            start = i * slab
            v = jax.lax.dynamic_slice_in_dim(vis, start, slab, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(out, cheap(v), start, axis=1)

        return jax.lax.fori_loop(0, nb, body, jnp.zeros((c, b), jnp.uint8))

    return fn


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--baselines", type=int, default=2016)
    parser.add_argument("--slab", type=int, default=252)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--skip-noblock", action="store_true")
    args = parser.parse_args()

    c, b, slab = args.channels, args.baselines, args.slab
    nb = b // slab
    rs = np.random.RandomState(1)
    vis = jnp.asarray(rs.standard_normal((c, b, 2)).astype(np.float32))
    vis_slab = jnp.asarray(np.asarray(vis[:, :slab]))

    flag_kw = dict(width=13, n_sigma=11.0, threshold="sum", layout="straight")
    variants = {
        "trivial": (jax.jit(lambda v: jnp.sum(v)), (vis,), 1),
        "skeleton": (make_skeleton(slab), (vis,), 1),
        "slab_standalone": (rfi_device.make_flagger_fn(**flag_kw), (vis_slab,), nb),
        "blocked_slice": (
            rfi_device.make_flagger_fn(**flag_kw, baseline_block=slab, block_impl="slice"),
            (vis,),
            1,
        ),
    }
    if not args.skip_noblock:
        variants["noblock"] = (rfi_device.make_flagger_fn(**flag_kw), (vis,), 1)

    times = {name: [] for name in variants}
    dead = set()
    for rep in range(args.reps):
        for name, (fn, fa, mult) in variants.items():
            if name in dead:
                continue
            try:
                t = time_scan(fn, fa, iters=args.iters) * 1e3
            except Exception as exc:  # e.g. remote-compile HBM ceiling
                print(f"rep{rep} {name:18s} FAILED: {exc}", file=sys.stderr, flush=True)
                dead.add(name)
                times.pop(name, None)
                continue
            times[name].append(t * mult)
            note = f" (x{mult} slabs)" if mult != 1 else ""
            print(f"rep{rep} {name:18s} {t:8.3f} ms{note}", file=sys.stderr, flush=True)

    print("\n=== per-variant min of reps (dump-equivalent ms) ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:18s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
