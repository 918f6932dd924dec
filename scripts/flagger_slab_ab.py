#!/usr/bin/env python
"""In-process A/B: padded-slab size, and amplitude-before-blocking.

``ampfirst`` computes |vis| once over the full dump (one fused 528→264 MB
pass) and lets the slab loop slice the float32 amplitude array instead of
the planar (re, im) pairs — halving the per-slab slice traffic.  Flags
parity vs the shipped pipeline is asserted on-chip before timing.
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


def make_amp_first(slab: int, width=13, n_sigma=11.0):
    slab_a = -(-slab // 128) * 128

    def pipeline(amp_slab):
        med, _ = rfi_device.masked_median_filter(amp_slab, width)
        deviations = amp_slab - med
        deviations = jnp.where(jnp.isnan(deviations), 0.0, deviations).astype(jnp.float32)
        noise = rfi_device.madnz(deviations, axis=0)
        return rfi_device.threshold_sum(deviations, noise, n_sigma, transposed=False)

    @jax.jit
    def fn(vis):
        c, b = vis.shape[:2]
        amp = rfi_device.amplitude(vis)
        nb = -(-b // slab_a)
        b_pad = nb * slab_a
        amp = jnp.pad(amp, ((0, 0), (0, b_pad - b)))

        def body(i, out):
            start = i * slab_a
            a = jax.lax.dynamic_slice_in_dim(amp, start, slab_a, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(out, pipeline(a), start, axis=1)

        out = jax.lax.fori_loop(0, nb, body, jnp.zeros((c, b_pad), jnp.uint8))
        return out[:, :b]

    return fn


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--channels", type=int, default=32768)
    parser.add_argument("--baselines", type=int, default=2016)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    c, b = args.channels, args.baselines
    rs = np.random.RandomState(1)
    vis = jnp.asarray(rs.standard_normal((c, b, 2)).astype(np.float32))

    variants = {
        "pad256": rfi_device.make_flagger_fn(13, 11.0, threshold="sum", baseline_block=256),
        "pad384": rfi_device.make_flagger_fn(13, 11.0, threshold="sum", baseline_block=384),
        "pad128": rfi_device.make_flagger_fn(13, 11.0, threshold="sum", baseline_block=128),
        "ampfirst256": make_amp_first(256),
    }

    # On-chip parity of ampfirst vs the shipped path (fetch one scalar).
    ref = variants["pad256"](vis)
    got = variants["ampfirst256"](vis)
    mism = int(jnp.sum(ref != got))
    print(f"ampfirst parity: {mism} mismatches", file=sys.stderr, flush=True)
    if mism:
        raise SystemExit("parity FAILED")

    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t = time_scan(fn, (vis,), iters=args.iters) * 1e3
            times[name].append(t)
            print(f"rep{rep} {name:12s} {t:8.3f} ms", file=sys.stderr, flush=True)
    print("\n=== min of reps ===", file=sys.stderr)
    for name, ts in sorted(times.items(), key=lambda kv: min(kv[1])):
        print(f"{name:12s} {min(ts):8.3f} ms  (max {max(ts):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
