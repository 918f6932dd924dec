#!/usr/bin/env python
"""Interleaved A/B: headline dump (2016 rows) vs the true config-5 dump
(2016 baselines x 4 pols = 8064 rows), in ONE process.

The round-4 revalidation queue timed ``bench.py --pols 4`` at ~1.1 s/dump
(0.24 Gvis/s) — 23x worse per visibility than the 1-pol headline run an
hour earlier — but that process's own streaming probe read 52 GB/s vs
384 GB/s, so the number is contaminated by box state (the environment
drifts; only same-process interleaved comparisons are decisive,
BASELINE_RESULTS.md).  This script settles per-vis scale invariance at
the real BASELINE.json config-5 shape: small/large legs alternate
S L S L S, each bracketed by a 128 MB copy probe so every timing carries
its own ceiling.

Usage:  python scripts/polscale_ab.py [--iters 10] [--slab 288] [--bb 16]
"""

import argparse
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baselines", type=int, default=2016)
    ap.add_argument("--pols", type=int, default=4)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--bb", type=int, default=16)
    ap.add_argument("--fold", type=int, default=8192)
    ap.add_argument("--slab", type=int, default=288)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--engine", choices=["dma", "dma_amp"], default="dma")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke)")
    args = ap.parse_args()

    from katsdpsigproc_tpu.utils import backend as _backend

    _backend.apply_platform_env()

    import jax.numpy as jnp

    from katsdpsigproc_tpu.models.rfi import pallas_flagger
    from katsdpsigproc_tpu.utils.profiling import time_scan

    rows_small = args.baselines
    rows_large = args.baselines * args.pols

    rs = np.random.RandomState(seed=1)
    # Planar-transposed layout (rows, channels, 2), the kernel's ingest
    # contract; build the large dump once, the small dump is its prefix.
    big = rs.uniform(-1.0, 1.0, (rows_large, args.channels, 2)).astype(np.float32)
    spikes = rs.random_sample(big.shape[:2]) < 1.0 / 64.0
    big[..., 0] += spikes * (rs.random_sample(big.shape[:2]) * 20.0 + 50.0)

    vis_large = jnp.asarray(big)
    vis_small = jnp.asarray(big[:rows_small])
    del big

    kw = dict(slab=args.slab, n_sigma=11.0, bb=args.bb, fold=args.fold,
              pipeline="dma", interpret=args.interpret)
    if args.engine == "dma_amp":
        kw["ingest"] = "amp"

    def flag(v):
        # Mirrors bench.py's pallas_dma leg (row-major (rows, C, 2) ingest,
        # slab scan inside the jit); input is pre-transposed here, which is
        # identical between the S and L legs.
        return pallas_flagger.flag_dump(v, **kw)

    probe = jnp.zeros((32, 1024, 1024), jnp.float32)  # 128 MB

    def copy_gbps():
        # 64 iterations: the single ~0.3 ms probe op needs ~20 ms of chip
        # time for the marginal to clear tunnel jitter (see bench.py).
        dt = time_scan(lambda x: x + 1.0, (probe,), iters=max(args.iters, 64))
        return 2 * probe.size * 4 / dt / 1e9

    # compile both legs before any timing
    np.asarray(flag(vis_small))
    np.asarray(flag(vis_large))

    legs = [("S", vis_small, rows_small), ("L", vis_large, rows_large),
            ("S", vis_small, rows_small), ("L", vis_large, rows_large),
            ("S", vis_small, rows_small)]
    per_vis = {"S": [], "L": []}
    for tag, v, rows in legs:
        g = copy_gbps()
        dt = time_scan(flag, (v,), iters=args.iters)
        nvis = rows * args.channels
        per_vis[tag].append(dt / nvis * 1e9)
        print(f"{tag} ({rows:5d} rows): {dt * 1e3:9.3f} ms/dump  "
              f"{dt / nvis * 1e9:7.4f} ns/vis  ({nvis / dt / 1e9:5.2f} Gvis/s)"
              f"   [copy probe {g:.0f} GB/s]")
    print(f"final copy probe {copy_gbps():.0f} GB/s")

    s = min(per_vis["S"])
    l = min(per_vis["L"])
    print(f"per-vis min S {s:.4f} ns, L {l:.4f} ns -> large/small = {l / s:.3f}"
          f"  ({'scale-invariant' if abs(l / s - 1) < 0.1 else 'NOT scale-invariant'})")


if __name__ == "__main__":
    main()
